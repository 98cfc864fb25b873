package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.{aggregate, call_function, col, element_at, lit, zip_with}

/** ANN correctness: brute force against a driver-side exact
  * computation; LSH recall against brute force. */
class SimilaritySpec extends SparkSpec {

  private def exactTopK(d: String, nQueries: Int, k: Int): Map[Long, Seq[Long]] = {
    val vecs = Tables.embeddings(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray.map(_.toDouble))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    vecs.filter(_._1 < nQueries).map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(k).map(_._1).toSeq
    }.toMap
  }

  test("brute-force ANN matches exact driver-side top-k") {
    val k = 5
    val expected = exactTopK(sf0001, nQueries = 8, k = k)
    val got = Similarity.annBruteforce(spark, sf0001, nQueries = 8, k = k).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got === expected)
  }

  test("IVF ANN probes a bounded list subset with usable recall") {
    val k = 5
    val bf = Similarity.annBruteforce(spark, sf0001, nQueries = 8, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.annIvf(spark, sf0001, nQueries = 8, k = k).collect()
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= k)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length))
    }
    val got = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    // nProbe/nLists = 1/4 of the corpus scanned; isotropic Gaussians
    // are the ANN worst case — only require beating random probing
    assert(recall >= 0.15, s"IVF recall $recall below floor")
  }

  test("k-means improves quantization over first-N seeding and stays deterministic") {
    // the objective Lloyd optimizes: mean cosine between each corpus
    // vector and its assigned (nearest) centroid. Top-k recall on an
    // isotropic corpus is sampling noise at n=40; this is the signal.
    val corpus = Similarity.corpus(spark, sf0001).collect()
      .map(r => r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def quantization(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(
        Similarity.corpus(spark, sf0001), nLists = 16, iters = iters)
      corpus.map(v => cents.map(c => cos(v, c.v)).max).sum / corpus.length
    }
    val seeded = quantization(0) // the old behavior: centroids = first 16 vectors
    val lloyd = quantization(3)
    assert(lloyd > seeded,
      s"k-means quantization $lloyd did not improve on first-N seeding $seeded")
    // recall must not materially regress while quantization improves
    val k = 5
    val bf = Similarity.annBruteforce(spark, sf0001, nQueries = 8, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(iters: Int): Double = {
      val got = Similarity.annIvf(spark, sf0001, nQueries = 8, k = k, kmeansIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      bf.intersect(got).size.toDouble / bf.size
    }
    assert(recallOf(3) >= recallOf(0) - 0.05)
    // decimal-summed means ⇒ bit-identical plan across runs
    val a = Similarity.annIvf(spark, sf0001, nQueries = 8, k = k).collect().toSeq
    val b = Similarity.annIvf(spark, sf0001, nQueries = 8, k = k).collect().toSeq
    assert(a === b)
  }

  test("centroid training works on sparse, non-zero-based vec_ids") {
    import org.apache.spark.sql.functions._
    // shift+stride the ids: nothing below nLists or trainCap survives,
    // so any id-value-based sampling would return an empty seed set
    val sparse = Similarity.corpus(spark, sf0001)
      .withColumn("vec_id", col("vec_id") * 1000L + 5000000L)
    val cents = Similarity.kmeansCentroids(sparse, nLists = 8, iters = 2)
    assert(cents.length === 8)
    assert(cents.forall(c => c.norm > 0 && c.v.exists(_ != 0.0)))
    // the hash-ordered draw is deterministic: same corpus ⇒ same centroids
    val again = Similarity.kmeansCentroids(sparse, nLists = 8, iters = 2)
    assert(cents.map(_.v.toSeq).toSeq === again.map(_.v.toSeq).toSeq)
  }

  test("IVF-PQ ANN: codes compress, ADC shortlist recalls, rerank returns exact cosines") {
    val k = 5
    val bfRows = Similarity.annBruteforce(spark, sf0001, nQueries = 8, k = k).collect()
    val bf = bfRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val bfCos = bfRows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pqRows = Similarity.annIvfPq(spark, sf0001, nQueries = 8, k = k).collect()
    val pq = pqRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pqRows.length === 8 * k)
    // IVF-PQ probes the same coarse lists as plain IVF, then shortlists
    // by 8-byte ADC; with exact re-rank its recall cannot collapse
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.15, s"IVF-PQ recall $recall below floor")
    // survivors carry EXACT cosines (re-ranked on raw vectors): any
    // pair also in brute force must agree bit-for-bit
    bf.intersect(pq).foreach { key =>
      val got = pqRows.find(r => (r.getLong(0), r.getLong(2)) == key).get.getDouble(3)
      assert(got === bfCos(key), s"rerank cosine drifted for $key")
    }
    // deterministic across runs (codebooks cached + decimal means)
    val again = Similarity.annIvfPq(spark, sf0001, nQueries = 8, k = k).collect().toSeq
    assert(again.map(_.toString) === pqRows.toSeq.map(_.toString))
  }

  test("PQ codebooks: codes are within range and reconstruction beats the zero vector") {
    import org.apache.spark.sql.functions._
    val c = Similarity.corpus(spark, sf0001)
    val books = Similarity.pqCodebooks(c, m = 8, dsub = 8, ksub = 16, iters = 2)
    assert(books.length === 8)
    books.foreach { b =>
      assert(b.length === 16)
      b.foreach(cent => assert(cent.v.length === 8))
    }
    // encode a sample driver-side and check quantization error: the
    // reconstructed vector must be closer to the original than the
    // origin is (i.e. PQ explains some variance) for nearly all rows
    val sample = c.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(64)
      .collect().map(_.getSeq[Double](1).toArray)
    val better = sample.count { v =>
      val err = (0 until 8).map { m =>
        val x = v.slice(m * 8, (m + 1) * 8)
        val cent = books(m).minBy(c =>
          c.v.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum)
        cent.v.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      err < v.map(x => x * x).sum
    }
    assert(better >= 60, s"only $better/64 rows reconstruct better than zero")
  }

  test("LSH ANN returns valid neighbors with usable recall") {
    val k = 5
    val bf = Similarity.annBruteforce(spark, sf0001, nQueries = 8, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.annLsh(spark, sf0001, nQueries = 8, k = k).collect()
    // each query returns at most k, ranked 1..n
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= k)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length))
    }
    val got = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    // isotropic-Gaussian corpus = worst case for LSH; just require the
    // probing to beat random-bucket luck
    assert(recall >= 0.15, s"LSH recall $recall below floor")
  }

  test("embedding centroids recompute by hand and are partitioning-independent") {
    val rows = Similarity.embCentroids(spark, sf001).collect()
    assert(rows.length === 10 * 64) // 10 labels x 64 dims, long form
    // recompute one (label, dim) cell by hand from the raw vectors
    val want = Tables.embeddings(spark, sf001)
      .filter(col("label") === 3)
      .select(element_at(col("embedding"), 5).cast("double"))
      .collect().map(_.getDouble(0))
    val cell = rows.find(r => r.getInt(0) == 3 && r.getLong(1) == 5L).get
    assert(cell.getLong(3) === want.length.toLong)
    assert(math.abs(cell.getDouble(2) - want.sum / want.length) < 1e-6)
    val again = Similarity.embCentroids(spark, sf001).collect().toSeq
    assert(rows.toSeq === again)
  }

  test("graft_vec_sum: exact element-wise sums, merge across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col}
    graft.Graft.registerFunctions(spark)
    // integer-valued doubles sum exactly in any partition/merge order
    val vecs = (1 to 100).map(i => Array(i.toDouble, 2.0 * i, -i.toDouble))
    val expect = Seq(5050.0, 10100.0, -5050.0)
    Seq(1, 7, 32).foreach { parts =>
      val got = vecs.toDF("v").repartition(parts)
        .agg(call_function("graft_vec_sum", col("v")))
        .head().getSeq[Double](0)
      assert(got === expect, s"parts=$parts")
    }
    // null elements and empty vectors fail loudly, never sum as 0.0
    intercept[Exception] {
      Seq(Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0))
        .toDF("v").agg(call_function("graft_vec_sum", col("v"))).head()
    }
    intercept[Exception] {
      Seq(Seq.empty[Double], Seq(1.0, 2.0))
        .toDF("v").agg(call_function("graft_vec_sum", col("v"))).head()
    }
  }

  test("emb_pca recovers planted principal directions (components 1 AND 2)") {
    import spark.implicits._
    // per component: (loading by 1-based dim, var_share)
    def pca(vecs: Seq[Array[Float]]): Map[Long, (Map[Long, Double], Double)] = {
      val d = java.nio.file.Files.createTempDirectory("graft-pca")
        .toFile.getAbsolutePath
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      Similarity.embPca(spark, d).collect()
        .groupBy(_.getLong(0)).map { case (c, rs) =>
          c -> ((rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap,
            rs.head.getDouble(3)))
        }
    }
    val dim = 8
    def axis(k: Int, t: Float): Array[Float] =
      Array.tabulate(dim)(i => if (i == k) t else 0f)
    // variance entirely along dim 3 (1-based: 4): loading e4, share 1;
    // component 2 of a rank-1 covariance carries ZERO variance share
    val c1 = pca((1 to 10).map(t => axis(3, t.toFloat)))
    val (l1, s1) = c1(1L)
    assert(math.abs(l1(4L) - 1.0) < 1e-6 && s1 === 1.0)
    assert((1 to dim).filter(_ != 4).forall(i => math.abs(l1(i.toLong)) < 1e-6))
    assert(c1(2L)._2 === 0.0, "rank-1 data: component 2 share must be 0")
    // variance along the (3,4)/5 line in dims 1-2: loadings 0.6 / 0.8,
    // sign normalized to the largest-|loading| component
    val (l2, s2) = pca((1 to 10).map(t => Array.tabulate(dim)(i =>
      if (i == 0) 3f * t else if (i == 1) 4f * t else 0f)))(1L)
    assert(math.abs(l2(1L) - 0.6) < 1e-6 && math.abs(l2(2L) - 0.8) < 1e-6)
    assert(s2 === 1.0)
    // anti-correlated dims: the PC's components sum to zero, which a
    // UNIFORM power-iteration start is exactly orthogonal to — the LCG
    // start must still converge to (1,-1)/sqrt(2)
    val (l3, s3) = pca((1 to 10).map(t => Array.tabulate(dim)(i =>
      if (i == 0) t.toFloat else if (i == 1) -t.toFloat else 0f)))(1L)
    val r2 = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(l3(1L)) - r2) < 1e-6 && math.abs(math.abs(l3(2L)) - r2) < 1e-6)
    assert(l3(1L) * l3(2L) < 0, "components must oppose")
    assert(s3 === 1.0)
    // TWO planted axes (independent factor grid): the dominant factor
    // runs along (0.6, 0.8) in dims 1-2, the second along dim 3 with
    // far smaller spread — the deflated iteration must recover e3 with
    // the exact residual variance share
    val twoAxis = for (t <- 1 to 10; u <- -2 to 2) yield
      Array.tabulate(dim)(i =>
        if (i == 0) 3f * t else if (i == 1) 4f * t else if (i == 2) u.toFloat else 0f)
    val both = pca(twoAxis)
    val (p1, ps1) = both(1L)
    val (p2, ps2) = both(2L)
    assert(math.abs(p1(1L) - 0.6) < 1e-5 && math.abs(p1(2L) - 0.8) < 1e-5)
    assert(math.abs(p1(3L)) < 1e-5, "PC1 must not leak into the minor axis")
    assert(math.abs(p2(3L) - 1.0) < 1e-5, "PC2 must be the planted minor axis")
    assert((1 to dim).filter(_ != 3).forall(i => math.abs(p2(i.toLong)) < 1e-5))
    // var(5t) = 25·8.25 = 206.25, var(u) = 2 → shares over 208.25
    assert(math.abs(ps1 - 206.25 / 208.25) < 1e-5)
    assert(math.abs(ps2 - 2.0 / 208.25) < 1e-5)
    // determinism across runs (the driver-side iteration is a fixed
    // IEEE sequence on exact aggregate inputs)
    assert(pca(twoAxis) === both)
  }

  test("emb_whiten removes the top-2 directions, keeps the minor axis, and is deterministic") {
    import spark.implicits._
    val dim = 8
    val d = java.nio.file.Files.createTempDirectory("graft-whiten")
      .toFile.getAbsolutePath
    // three orthogonal planted factors with strictly ordered spreads:
    // major along (0.6, 0.8) in dims 1-2, middle along dim 3, minor
    // along dim 4 — whitening must delete the first two and keep the
    // minor axis (centered) intact
    val rows = for (t <- 1 to 10; u <- -2 to 2; w <- 0 to 1) yield
      Array.tabulate(dim)(i =>
        if (i == 0) 3f * t else if (i == 1) 4f * t
        else if (i == 2) 2f * u else if (i == 3) 0.5f * w else 0f)
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // (vec_id, pos, val) exploded rows → arrays, pos is 1-based
    def collectWhiten(): Map[Long, Array[Double]] =
      Similarity.embWhiten(spark, d).collect()
        .groupBy(_.getLong(0)).map { case (id, rs) =>
          id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
        }
    val got = collectWhiten()
    assert(got.size === rows.length)
    rows.zipWithIndex.foreach { case (v, i) =>
      val wv = got(i.toLong)
      // components along the removed directions are gone
      val alongMajor = 0.6 * wv(0) + 0.8 * wv(1)
      assert(math.abs(alongMajor) < 1e-4, s"major residue $alongMajor")
      assert(math.abs(wv(2)) < 1e-4, s"middle residue ${wv(2)}")
      // the minor axis survives, centered: w ∈ {0, 1} with mean 0.5
      val expectMinor = 0.5 * (v(3) / 0.5f - 0.5)
      assert(math.abs(wv(3) - expectMinor) < 1e-4,
        s"minor axis must survive centered: ${wv(3)} vs $expectMinor")
      // untouched dims stay (centered) zero
      (4 until dim).foreach(j => assert(math.abs(wv(j)) < 1e-4))
    }
    // determinism: the basis is a fixed IEEE sequence on exact inputs
    val again = collectWhiten()
    assert(got.keySet === again.keySet)
    got.keySet.foreach(k => assert(got(k).toSeq === again(k).toSeq))
  }

  test("graft_dot: native codegen bit-matches the declarative fold and handles edges") {
    graft.Graft.registerFunctions(spark)
    // bit-exact vs aggregate(zip_with) on the real corpus — same fold
    // order is the invariant every oracle compare rests on
    val c = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = c.crossJoin(c.select(col("vec_id").as("id2"), col("v").as("v2"))
        .filter(col("id2") < 5))
      .select(
        call_function("graft_dot", col("v"), col("v2")).as("native"),
        aggregate(zip_with(col("v"), col("v2"), _ * _), lit(0.0), _ + _).as("decl"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // edges: null array → null; a length mismatch RAISES (a corrupt
    // row must fail loudly, not fold to a wrong-but-finite score —
    // matching DuckDB's list_dot_product)
    val edge = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS b")
      .collect()(0)
    assert(edge.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(10.0d, 20.0d)) AS a")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => String.valueOf(c.getMessage).contains("length mismatch")),
      s"expected a length-mismatch failure, got: $err")
  }

  test("emb outliers: a planted far vector flags, the tight cluster does not") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-outlier")
      .toFile.getAbsolutePath
    // label 0: 20 vectors near the origin + one far outlier;
    // label 1: n=3 with distinct dists (healthy variance);
    // label 2: DEGENERATE — a symmetric pair whose two distances to
    // the centroid are equal, so n·ss − s² = 0 and the explicit
    // when(variance > 0) guard must emit NULL z (unguarded, Spark
    // gives NULL but recent DuckDB gives NaN/inf — version-dependent);
    // label 3: DEGENERATE — a single vector (n=1, dist 0)
    val cluster = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 0.1f else 0f), 0)
    }
    val far = Seq((20L, Array.fill(4)(10f), 0))
    val other = Seq(
      (30L, Array(1f, 0f, 0f, 0f), 1),
      (31L, Array(0f, 1f, 0f, 0f), 1),
      (32L, Array(3f, 3f, 0f, 0f), 1))
    val degenerate = Seq(
      (40L, Array(2f, 0f, 0f, 0f), 2),
      (41L, Array(0f, 2f, 0f, 0f), 2),
      (50L, Array(5f, 5f, 5f, 5f), 3))
    (cluster ++ far ++ other ++ degenerate)
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Similarity.embOutliers(spark, d).collect()
    val out = rows.filterNot(_.isNullAt(3))
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getInt(4)))).toMap
    assert(out(20L)._2 === 1, s"far vector must flag, z=${out(20L)._1}")
    assert((0 until 20).forall(i => out(i.toLong)._2 === 0),
      "cluster members must not flag")
    assert(out(20L)._1 > 2.0)
    // z-scores within a label sum to ~0 (standardization sanity)
    val zsum = (0 to 20).map(i => out(i.toLong)._1).sum
    assert(math.abs(zsum) < 1e-3)
    // degenerate labels: z and is_outlier are NULL by rule, dist survives
    val degRows = rows.filter(r => Set(40L, 41L, 50L).contains(r.getLong(0)))
    assert(degRows.length === 3)
    degRows.foreach { r =>
      assert(r.isNullAt(3), s"z must be NULL for degenerate vec ${r.getLong(0)}")
      assert(r.isNullAt(4), s"is_outlier must be NULL for degenerate vec ${r.getLong(0)}")
    }
  }

  test("exact kNN graph: every vector's neighbor list matches driver-side truth") {
    val k = 3
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray.map(_.toDouble))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(k).map(_._1).toSeq
    }.toMap
    val got = Similarity.knnGraph(spark, sf0001, k = k).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got === expected)
  }

  test("kNN graph guard: refuses loudly past the declared all-pairs corpus bound") {
    // the registered baseline must FAIL, not silently attempt n², when
    // pointed at a corpus above its bound; the bound check is in-plan
    // (a 1-row broadcast count), so it fires wherever the query runs
    val err = intercept[Exception] {
      Similarity.knnGraph(spark, sf0001, k = 3, maxRows = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("all-pairs exactness baseline") && m.contains("emb_knn_graph_lsh")),
      s"guard did not raise its message; got: ${messages(err).mkString(" | ")}")
    // and at the shipped bound the output is unchanged (guard inert)
    assert(Similarity.knnGraph(spark, sf0001, k = 3).count() > 0)
  }

  test("LSH kNN graph: bounded rows, exact cosines, recall above the probe floor") {
    val k = 3
    val exact = Similarity.knnGraph(spark, sf0001, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.knnGraphLsh(spark, sf0001, k = k).collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(lsh.length <= n * k)
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length)) }
    // every emitted cosine is the true cosine for that pair (the
    // sketch only prunes candidates, it never perturbs scores)
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    lsh.foreach { r =>
      assert(math.abs(r.getDouble(3) - cos(vecs(r.getLong(0)), vecs(r.getLong(2)))) < 1e-9)
    }
    val got = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // Hamming ≤ 1 probing scans ~9/256 of an isotropic corpus (the
    // worst case — see the annLsh note); require clear signal over
    // that random-scan floor
    assert(recall >= 0.15, s"LSH kNN-graph recall $recall below floor")
  }

  test("LSH kNN graph: a fully-clustered corpus (one hot bucket) stays correct") {
    // every vector points the same way → ALL land in one bucket; the
    // equi-join degenerates to within-bucket all-pairs, which must
    // then equal the exact graph (perf skew is AQE's job, correctness
    // is ours)
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-hotbucket")
      .toFile.getAbsolutePath
    // exactly co-directional (different magnitudes): one bucket by
    // construction, every pairwise cosine exactly 1.0, ranks resolve
    // purely by the nbr_id tie-break in BOTH formulations
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.fill(64)((i + 1).toFloat), 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val exact = Similarity.knnGraph(spark, d, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val lsh = Similarity.knnGraphLsh(spark, d, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(lsh === exact, "hot-bucket LSH graph must equal the exact graph")
  }

  test("LSH kNN graph: a hot bucket takes AQE's skew-join split AND stays exact") {
    // substantiates the op's scale note (Similarity.scala: "a hot
    // bucket is a skew-join salting/AQE case, not a plan change"):
    // with every vector in ONE bucket the corpus side of the bucket
    // equi-join collapses into a single shuffle partition; under
    // sort-merge (no broadcast — the 100 TB condition) AQE must split
    // that partition (skew=true) and the output must still equal the
    // exact graph row-for-row
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-skewbucket")
      .toFile.getAbsolutePath
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.fill(64)((i + 1).toFloat), 0)
    }
    // 8 parquet files: a skewed partition can only be SPLIT at
    // map-output granularity, so the scan must run as several map
    // tasks (with one mapper AQE cannot split anything); the tiny
    // maxPartitionBytes below keeps the 8 files from packing back
    // into one scan task
    vecs.toDF("vec_id", "embedding", "label")
      .repartition(8).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // thresholds sized to the planted corpus: the co-directional
    // vectors compress very well in shuffle blocks, so the hot
    // partition is small in BYTES even though it holds every row
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lshDf = Similarity.knnGraphLsh(spark, d, k = 3)
      val lsh = lshDf.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val plan = lshDf.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew split on the hot bucket:\n${plan.take(2000)}")
      val exact = Similarity.knnGraph(spark, d, k = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(lsh.toSeq === exact.toSeq,
        "skew-split LSH graph must equal the exact graph")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("semantic dedup: planted near-dup dropped with min-id survivor") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-semdedup")
      .toFile.getAbsolutePath
    def axis(i: Int, scale: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(i) = scale; v
    }
    Seq(
      (0L, axis(0, 1.0f), 0),
      (1L, Array(0.95f, 0.05f, 0f, 0f, 0f, 0f, 0f, 0f), 0), // cos~0.998 to v0
      (2L, axis(2, 2.0f), 1),                                // orthogonal
      (3L, axis(2, 3.0f), 1))                                // same DIRECTION as v2
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.semanticDedup(spark, d, nClusters = 2, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // v1 duplicates v0; v3 is colinear with v2 (cos exactly 1)
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 0L), (3L, 2L)))
    out.foreach(t => assert(t._3 >= 0.9))
  }

  test("semantic dedup: clustered pass is a sound pruning of the exact pass") {
    Similarity.clearCentroidCache()
    val exact = Similarity.semanticDedup(spark, sf0001, nClusters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val pruned = Similarity.semanticDedup(spark, sf0001, nClusters = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(exact.nonEmpty, "corpus should contain semantic near-dups at tau=0.4")
    // no false drops: every pruned verdict exists in the exact run, with
    // an equal-or-later survivor and equal-or-weaker best evidence
    // (a cluster only removes candidate partners, never adds them)
    pruned.foreach { case (v, (dupOf, maxCos)) =>
      val (exDup, exCos) = exact(v)
      assert(exDup <= dupOf)
      assert(maxCos <= exCos + 1e-9)
    }
    // recall floor vs the exact pass: same-direction dups co-cluster
    // tau=0.4 is far BELOW SemDeDup's ~0.95 operating point (this
    // corpus has no pairs above cos 0.6): loosely-similar pairs are the
    // worst case for co-clustering, and 2-probe still recalls most
    val recall = pruned.size.toDouble / exact.size
    assert(recall >= 0.6, s"semantic recall $recall vs exact ${exact.size}")
    // determinism (cached centroids + deterministic plan)
    val again = Similarity.semanticDedup(spark, sf0001, nClusters = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(again === pruned)
  }
}
