package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.CentAssign
import graft.operators.{Hyperplanes, Similarity}

/** The native [[graft.functions.CentAssign]] ANN-assisted centroid
  * assign (dedup_semantic's 100 TB path, r13): codegen, interpreted
  * and a plain-driver reference agree row-for-row; its output is
  * EXACTLY the `topCents` (cosine desc, cent_id desc) ranking
  * restricted to the probed candidate set; the guard keeps every
  * gate-SF plan on the exact path; and the forced-ANN end-to-end
  * dedup recall vs the exact assign is pinned. */
class CentAssignSpec extends SparkSpec {

  private def corpus = Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Plain-driver reference: independent bucket construction + probe +
    * exact cosine ranking (no shared code beyond Hyperplanes.make). */
  private def driverRef(v: Array[Double], cents: Array[Array[Double]],
      nProbe: Int, w: Int, nTables: Int, seed: Long): Seq[Int] = {
    val planes = Hyperplanes.make(w * nTables, v.length, seed)
    def sig(x: Array[Double]): Long = {
      var s = 0L
      planes.indices.foreach { i =>
        val d = x.indices.foldLeft(0.0)((a, j) => a + x(j) * planes(i)(j))
        if (d >= 0.0) s |= 1L << i
      }
      s
    }
    val mask = (1L << w) - 1
    val centKeys = cents.map(sig)
    val vSig = sig(v)
    val cand = (0 until nTables).flatMap { t =>
      val key = (vSig >>> (t * w)) & mask
      cents.indices.filter(id => ((centKeys(id) >>> (t * w)) & mask) == key)
    }.distinct
    val nv = math.sqrt(v.map(x => x * x).sum)
    cand.map { id =>
      val c = cents(id)
      val cos = v.indices.foldLeft(0.0)((a, j) => a + v(j) * c(j)) /
        (nv * math.sqrt(c.map(x => x * x).sum))
      (cos, id)
    }.sortBy { case (cos, id) => (-cos, -id) }.take(nProbe).map(_._2)
  }

  private val W = 5
  private val NT = Similarity.derivedAssignTables(5) // 12 tables, 60 bits
  private val Seed = Similarity.AssignSeed

  test("codegen == interpreted == driver reference on the corpus") {
    val rows = corpus.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // 96 data-drawn centroids — a between-gate-and-cap k with w=5
    val cents = rows.take(96).map(_._2)
    val expr = CentAssign(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cents.map(_.toIndexedSeq).toIndexedSeq, 2, W, NT, Seed)
    val interpreted = rows.map { case (_, v) =>
      expr.eval(InternalRow(ArrayData.toArrayData(v)))
        .asInstanceOf[ArrayData].toIntArray.toSeq
    }
    val expected = rows.map { case (_, v) => driverRef(v, cents, 2, W, NT, Seed) }
    assert(interpreted.toSeq == expected.toSeq, "interpreted != driver reference")
    // whole-stage-codegen'd path over the same snapshot
    val colExpr = org.apache.spark.sql.GraftColumnBridge.column(
      CentAssign(org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
        cents.map(_.toIndexedSeq).toIndexedSeq, 2, W, NT, Seed))
    val fromCodegen = corpus.orderBy("vec_id")
      .select(colExpr.as("ids")).collect().map(_.getSeq[Int](0).toSeq)
    assert(fromCodegen.toSeq == expected.toSeq, "codegen != driver reference")
    // NULL vector -> NULL (unary null semantics)
    assert(expr.eval(InternalRow(null)) == null)
    // length mismatch RAISES (graft_dot corrupt-row discipline)
    assertThrows[IllegalArgumentException] {
      expr.eval(InternalRow(ArrayData.toArrayData(Array(1.0, 2.0))))
    }
  }

  test("empty candidate set returns an EMPTY array, never raises") {
    // dim-2 handcrafted geometry: search deterministically for a probe
    // vector whose every band key misses both centroids' buckets
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val expr = CentAssign(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cents.map(_.toIndexedSeq).toIndexedSeq, 1, 8, 4, Seed)
    val probes = for (a <- -8 to 8; b <- -8 to 8 if a != 0 || b != 0)
      yield Array(a / 4.0, b / 4.0)
    val results = probes.map { v =>
      expr.eval(InternalRow(ArrayData.toArrayData(v)))
        .asInstanceOf[ArrayData].toIntArray.toSeq
    }
    val emptyCount = results.count(_.isEmpty)
    assert(results.forall(ids => ids.size <= 1 && ids.forall(i => i == 0 || i == 1)))
    // with 32 sig bits and 2 centroids most directions miss — the
    // point is the MISS path returns cleanly, the hit path stays sane
    assert(emptyCount > 0, "expected at least one empty-candidate probe")
  }

  test("derived formulas: assign width and train cap beyond the gate floor") {
    // independent references (straight math, no shared helpers).
    // ceil(log2 k) via iterative doubling, NOT floating-point log
    // division — log(4096)/log(2) can land an ulp above 12.0 and
    // ceil to 13 (the r14 cap raise extends this loop to 4096, where
    // that artifact bites)
    def ceilLog2(k: Int): Int = {
      var c = 0; var p = 1L
      while (p < k) { p <<= 1; c += 1 }
      c
    }
    // r14: upper clamp 8 → 12 with the k-cap raise (binds only past
    // k = 1024 — every previously measured config unchanged)
    def refW(k: Int): Int = math.min(12, math.max(4, ceilLog2(k) - 2))
    (2 to 4096).foreach { k =>
      val w = Similarity.derivedAssignWidth(k)
      assert(w == refW(k), s"width drift at k=$k")
      assert(w * Similarity.derivedAssignTables(w) <= 64, s"sig overflow at k=$k")
      assert(Similarity.derivedTrainCap(k) == math.max(2048, 128 * k))
      // the cap-raise's point: expected bucket occupancy k/2^w stays
      // ≤ 4 at every derived k up to the new MaxClusters
      assert(k.toDouble / (1L << w) <= 4.0, s"occupancy blowout at k=$k (w=$w)")
    }
    assert(Similarity.MaxClusters == 4096)
    // the gate floor: k=16 keeps the historical 2048-row draw
    assert(Similarity.derivedTrainCap(16) == 2048)
    // activation sizes: 10x-independent (k=78), 30x (k=234), the old
    // cap (k=512), the 100x corpus under the raised cap (k=781), the
    // 300x vector corpus (k=2343), and the new cap itself
    assert(Similarity.derivedAssignWidth(78) == 5)
    assert(Similarity.derivedAssignWidth(234) == 6)
    assert(Similarity.derivedAssignWidth(512) == 7)
    assert(Similarity.derivedAssignWidth(781) == 8)
    assert(Similarity.derivedAssignWidth(2343) == 10)
    assert(Similarity.derivedAssignWidth(4096) == 10)
    assert(Similarity.derivedAssignTables(10) == 6)
  }

  test("annAssign training (the r14 cap-raise lever): deterministic and quality-preserving") {
    // past AnnAssignMinK the Lloyd assign runs through the bucketed
    // probe (O(trainCap·~const) instead of O(128·k²) exact dots); this
    // pins the mode DIRECTLY: bit-determinism across runs, the full
    // centroid shape, and cluster quality within a whisker of the
    // exact-trained run's (the probe prunes candidates, so a broken
    // bucket table would show up as collapsed quality here)
    // kmeansCentroids' dot arithmetic rides graft_dot — registered by
    // every operator entry point, but this spec calls the trainer raw
    graft.Graft.registerFunctions(spark)
    val c = corpus
    val k = 32
    val exact = Similarity.kmeansCentroids(c, k, iters = 3, trainCap = 2048)
    val ann1 = Similarity.kmeansCentroids(c, k, iters = 3, trainCap = 2048,
      annAssign = true)
    val ann2 = Similarity.kmeansCentroids(c, k, iters = 3, trainCap = 2048,
      annAssign = true)
    assert(ann1.length == k && exact.length == k)
    assert(ann1.forall(ct => ct.v.length == 64 && ct.norm > 0.0))
    assert(ann1.map(ct => (ct.id, ct.v.toSeq)).toSeq ==
      ann2.map(ct => (ct.id, ct.v.toSeq)).toSeq,
      "annAssign training must be bit-deterministic across runs")
    // mean best-centroid cosine over the corpus — the Lloyd objective
    def quality(cents: Array[Similarity.Centroid]): Double = {
      val rows = c.collect().map(_.getSeq[Double](1).toArray)
      rows.map { v =>
        val nv = math.sqrt(v.map(x => x * x).sum)
        cents.map { ct =>
          v.indices.foldLeft(0.0)((a, j) => a + v(j) * ct.v(j)) / (nv * ct.norm)
        }.max
      }.sum / rows.length
    }
    val (qe, qa) = (quality(exact), quality(ann1))
    assert(qa >= 0.95 * qe,
      f"annAssign-trained cluster quality $qa%.4f < 0.95 x exact $qe%.4f")
  }

  test("guard: gate plans stay exact; forced ANN swaps the assign only") {
    Similarity.clearCentroidCache()
    val exact = Similarity.semanticDedup(spark, sf001)
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert(!exactPlan.contains("graft_cent_assign"),
      "gate-SF plan must stay on the exact topCents assign")
    val forced = Similarity.semanticDedup(spark, sf001, annMinK = 1)
    val forcedPlan = forced.queryExecution.executedPlan.toString
    assert(forcedPlan.contains("graft_cent_assign"),
      "forced-ANN plan must carry the native assign")

    // end-to-end recall pin (precision is structurally exact: every
    // emitted pair passed the exact cosine >= tau verify in BOTH
    // runs). The gate corpus's organic pairs are ALL weak (max_cos
    // 0.4-0.55 at the deliberately loose tau=0.4 — the same boundary
    // band where even the exact assign only holds 0.69 vs k=1, the
    // SemDeDup recall trade documented at the operator): those erode
    // first under any pruning, so they get a floor, not a ceiling.
    // Measured 0.82 at the k=16 floor with the full 64-bit budget.
    val exactRows = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val annRows = forced.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactRows.nonEmpty, "gate corpus must contain semantic dups")
    val recall = annRows.intersect(exactRows).size.toDouble / exactRows.size
    assert(recall >= 0.75, f"ANN-assign weak-pair dedup recall $recall%.3f < 0.75")

    // assign agreement: the ANN top-1 equals the exact top-1 for the
    // overwhelming share of vectors (the rest land in a near cluster —
    // a recall-only effect the end-to-end pin above already bounds)
    val rows = corpus.orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val cents = rows.take(96)
    def exactTop1(v: Array[Double]): Int = {
      val nv = math.sqrt(v.map(x => x * x).sum)
      cents.indices.map { id =>
        val c = cents(id)
        (v.indices.foldLeft(0.0)((a, j) => a + v(j) * c(j)) /
          (nv * math.sqrt(c.map(x => x * x).sum)), id)
      }.maxBy { case (cos, id) => (cos, id) }._2
    }
    val expr = CentAssign(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cents.map(_.toIndexedSeq).toIndexedSeq, 1, W, NT, Seed)
    val agree = rows.count { v =>
      val ids = expr.eval(InternalRow(ArrayData.toArrayData(v)))
        .asInstanceOf[ArrayData].toIntArray
      ids.nonEmpty && ids(0) == exactTop1(v)
    }
    val rate = agree.toDouble / rows.length
    assert(rate >= 0.5, f"ANN top-1 agreement $rate%.3f < 0.5 at k=96, w=$W")
  }

  test("planted strong near-dups survive the ANN assign (the operating point)") {
    // SemDeDup's operating point is cos ≈ 0.95+: near-identical
    // vectors have near-identical sketches and land in the same
    // probed buckets, so the pairs the operator EXISTS to kill are
    // exactly the ones the ANN assign keeps. Plant 200 such pairs
    // (elementwise ±1% perturbation → cos ≈ 0.9999) and pin their
    // recall vs the exact assign near-perfect.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-centassign").toFile.getAbsolutePath
    val base = Tables.embeddings(spark, sf001)
    val copies = base.filter(col("vec_id") < 200)
      .select((col("vec_id") + 10000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0 + 0.01 * " +
          "sin(CAST(vec_id AS DOUBLE) + i)) AS FLOAT))").as("embedding"),
        col("label"))
    base.unionByName(copies).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val planted = (0 until 200).map(i => i + 10000L).toSet
    def strongFound(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().filter(r => planted(r.getLong(0)) && r.getDouble(2) >= 0.9)
        .map(_.getLong(0)).toSet
    val exactStrong = strongFound(Similarity.semanticDedup(spark, dir))
    val annStrong = strongFound(Similarity.semanticDedup(spark, dir, annMinK = 1))
    assert(exactStrong.size >= 190,
      s"exact assign should catch nearly all planted pairs, got ${exactStrong.size}")
    val recall = annStrong.intersect(exactStrong).size.toDouble / exactStrong.size
    assert(recall >= 0.95, f"strong-pair recall $recall%.3f < 0.95")
  }
}
