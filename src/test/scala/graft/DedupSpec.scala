package graft

import graft.operators.Dedup
import org.apache.spark.sql.Row

/** Ground-truth checks for the probabilistic dedup operators (these
  * have no SQL oracle; this spec is their correctness gate). */
class DedupSpec extends SparkSpec {

  private def exactPairs(d: String): Set[(Long, Long)] =
    Dedup.ngramJaccard(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup keeps one survivor per distinct text") {
    val docs = Tables.documents(spark, sf0001)
    val survivors = Dedup.exact(spark, sf0001)
    assert(survivors.count() ===
      docs.selectExpr("lower(trim(regexp_replace(text, '\\\\s+', ' ')))").distinct().count())
    // every survivor is a real doc_id
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.collect().forall(r => ids(r.getLong(0))))
  }

  test("native minhash signature: codegen matches a driver-side reference and the column formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.MinHashSig
    graft.Graft.registerFunctions(spark)
    // independent driver-side reference over the same shingle arrays;
    // ONE frame carries every column both assertion blocks below need
    // (a second pipeline build would have to be edited in lockstep)
    val rows = Tables.documents(spark, sf0001).limit(20)
      .select(col("doc_id"), graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", call_function("graft_minhash_sig", col("sh")))
      .withColumn("bands", call_function("graft_minhash_bands", col("sh")))
      .withColumn("viaSig", array((0 until MinHashSig.NumBands).map { b =>
        xxhash64((b * MinHashSig.BandRows until (b + 1) * MinHashSig.BandRows)
          .map(i => element_at(col("sig"), i + 1)): _*)
      }: _*))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shinglesArr = r.getSeq[String](1)
      val expected = Array.fill(MinHashSig.NumHashes)(MinHashSig.Prime)
      shinglesArr.foreach { s =>
        val base = java.lang.Math.floorMod(
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
            UTF8String.fromString(s), 42L), MinHashSig.Prime)
        for (j <- 0 until MinHashSig.NumHashes) {
          val v = java.lang.Math.floorMod(
            MinHashSig.coeffA(j) * base + MinHashSig.coeffB(j), MinHashSig.Prime)
          if (v < expected(j)) expected(j) = v
        }
      }
      assert(r.getSeq[Long](2).toArray.toSeq === expected.toSeq,
        s"signature mismatch for doc ${r.getLong(0)}")
    }
    // the fused bands expression folds exactly the xxhash64 chain the
    // column formulation computes over the signature slots
    rows.foreach { r =>
      assert(r.getSeq[Long](3) === r.getSeq[Long](4),
        s"fused band keys diverge from xxhash64-over-signature for doc ${r.getLong(0)}")
    }
    // the Scala-side sentinel constant IS what Catalyst's xxhash64
    // computes over four Prime slots (the empty-doc signature)
    val sqlSentinel = spark.range(1)
      .select(xxhash64((0 until MinHashSig.BandRows).map(_ => lit(MinHashSig.Prime)): _*))
      .head.getLong(0)
    assert(sqlSentinel === MinHashSig.SentinelBand)
    // an empty doc's fused bands are ALL the sentinel (what bandIndex drops)
    val emptyBands = spark.sql(
      "SELECT graft_minhash_bands(CAST(array() AS array<string>))").head.getSeq[Long](0)
    assert(emptyBands.forall(_ == MinHashSig.SentinelBand))
    // the two operator formulations return identical near-dup pairs
    val classic = Dedup.minhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val native = Dedup.minhashLshNative(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native === classic)
  }

  test("adaptive, naive and prefix-filtered jaccard all return the same pairs") {
    val adaptive = Dedup.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = Dedup.ngramJaccardNaive(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPrefix(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(adaptive === naive)
    assert(pref === naive)
  }

  test("adaptive jaccard stays exact on a boilerplate-skewed corpus (hot path engaged)") {
    import spark.implicits._
    // every doc shares a 10-token boilerplate header; with hotDf = 4 all
    // 8 pure-boilerplate shingles (df = 40) go through the prefix path
    // while the per-pair unique tails (df = 2) stay on the capped index
    val boiler = "the quick brown fox jumps over a very lazy dog"
    val docs = (0L until 40L).map { i =>
      if (i >= 38) (i, boiler) // a pair whose overlap is ONLY hot shingles
      else (i, s"$boiler unique${i / 2} tail${i / 2} more${i / 2} extra${i / 2}")
    }.toDF("doc_id", "text")

    val got = Dedup.ngramJaccardDocs(docs, hotDf = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    def sh3(t: String) = t.split(" ").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val texts = (0L until 40L).map(i => i ->
      (if (i >= 38) boiler
       else s"$boiler unique${i / 2} tail${i / 2} more${i / 2} extra${i / 2}")).toMap
    val expect = (for {
      i <- texts.keys; j <- texts.keys if i < j
      a = sh3(texts(i)); b = sh3(texts(j))
      jac = a.intersect(b).size.toDouble / a.union(b).size if jac >= 0.5
    } yield (i, j, jac)).toSet

    assert(expect.contains((38L, 39L, 1.0)), "hot-only dup pair must be in the ground truth")
    assert(got === expect)
  }

  test("minhash LSH finds exactly the >=0.5-jaccard pairs (planted dups)") {
    val exact = exactPairs(sf0001)
    val mh = Dedup.minhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(mh === exact)
  }

  test("gram frac: cross-doc sharing only, in-row repeats collapse, short docs zero") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-gramfrac")
      .toFile.getAbsolutePath
    Seq(
      // docs 1+2 share exactly their first 8-gram (1 of 3 grams each)
      (1L, "a b c d e f g h x1 x2", "en", "s0"),
      (2L, "a b c d e f g h y1 y2", "en", "s0"),
      // docs 3+5 are verbatim copies: their single gram is shared
      (3L, "p q r s t u v w", "en", "s0"),
      (4L, "short text", "en", "s0"),
      (5L, "p q r s t u v w", "en", "s0"),
      // a WITHIN-doc repeated gram is not "shared": df stays 1
      (6L, "m n o p2 q2 r2 s2 t2 m n o p2 q2 r2 s2 t2", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.gramFrac(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> ((3L, 1L, 0.333333)), 2L -> ((3L, 1L, 0.333333)),
      3L -> ((1L, 1L, 1.0)), 4L -> ((0L, 0L, 0.0)),
      5L -> ((1L, 1L, 1.0)), 6L -> ((8L, 0L, 0.0))))
  }

  test("span extract: maximal merged spans at exact token positions") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-span")
      .toFile.getAbsolutePath
    val A = (1 to 10).map(i => s"s$i").mkString(" ")        // 10-token shared run
    Seq(
      (1L, A, "en", "s0"),                                   // A alone
      (2L, s"x1 x2 $A", "en", "s0"),                         // A offset by 2
      (3L, (1 to 7).map(i => s"u$i").mkString(" ") + s" $A " +
        (1 to 5).map(i => s"v$i").mkString(" "), "en", "s0"), // A inside padding
      (4L, s"$A ${(1 to 10).map(i => s"w$i").mkString(" ")} $A", "en", "s0"), // two runs
      (5L, (1 to 12).map(i => s"z$i").mkString(" "), "en", "s0")) // unique text
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.spanExtract(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // doc 1: whole doc; doc 2: tokens 3-12; doc 3: boundary grams are
    // unique so the span is exactly A's tokens 8-17; doc 4: two spans
    // with the unshared w-run untouched; doc 5 absent
    assert(out.toSeq === Seq(
      (1L, 1L, 10L), (2L, 3L, 12L), (3L, 8L, 17L),
      (4L, 1L, 10L), (4L, 21L, 30L)))
  }

  test("span removal: cut text drops exactly the extracted spans, order kept") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-spanrm")
      .toFile.getAbsolutePath
    val A = (1 to 10).map(i => s"s$i").mkString(" ")
    Seq(
      (1L, A, "en", "s0"),                                    // fully duplicated
      (2L, s"x1 x2 $A", "en", "s0"),                          // head survives
      (3L, s"$A ${(1 to 10).map(i => s"w$i").mkString(" ")} $A", "en", "s0"),
      (4L, (1 to 12).map(i => s"z$i").mkString(" "), "en", "s0")) // untouched
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.spanRemoval(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((10L, 0L, 10L, "")))
    assert(out(2L) === ((12L, 2L, 10L, "x1 x2")))
    assert(out(3L) === ((30L, 10L, 20L, (1 to 10).map(i => s"w$i").mkString(" "))))
    assert(out(4L) === ((12L, 12L, 0L, (1 to 12).map(i => s"z$i").mkString(" "))))
  }

  test("incremental: delta admits vs corpus and earlier batch rows, corpus pairs unreported") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-incr")
      .toFile.getAbsolutePath
    val A = (1 to 12).map(i => s"a$i").mkString(" ")
    val B = (1 to 12).map(i => s"b$i").mkString(" ")
    Seq(
      // standing corpus (src5+): two internal verbatim dups — settled,
      // must NOT appear in the output
      (10L, A, "en", "src5"),
      (11L, A, "en", "src6"),
      (12L, B, "en", "src5"),
      (13L, (1 to 12).map(i => s"c$i").mkString(" "), "en", "src7"),
      // the new batch (src0/src1)
      (20L, A, "en", "src0"),                      // dup of corpus 10 AND 11
      (21L, s"$B extra", "en", "src0"),            // near-dup of corpus 12
      (22L, (1 to 12).map(i => s"d$i").mkString(" "), "en", "src1"), // novel
      (23L, (1 to 12).map(i => s"d$i").mkString(" "), "en", "src1"), // dup of 22 (same batch)
      (24L, (1 to 12).map(i => s"e$i").mkString(" "), "en", "src1")) // novel
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.incremental(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq(
      (20L, 0, 10L),   // corpus partner, smallest corpus id preferred
      (21L, 0, 12L),   // near-dup caught (10 of 13 grams shared)
      (22L, 1, -1L),   // earlier batch row: 23 does not disqualify 22
      (23L, 0, 22L),   // same-batch dup drops the LATER row
      (24L, 1, -1L)))
    // the corpus-internal dup pair (10, 11) is nowhere in the output
    assert(!got.exists(g => g._1 == 10L || g._1 == 11L))
  }

  test("incremental stays exact on a boilerplate-skewed corpus (hot path engaged)") {
    import spark.implicits._
    // every doc opens with a shared 10-token boilerplate header (its 8
    // shingles go hot at hotDf = 4); per-pair unique tails stay on the
    // capped index; docs 36-39 overlap ONLY via hot shingles (the
    // prefix-path-or-nothing case). Corpus = even ids, delta = odd.
    val boiler = "the quick brown fox jumps over a very lazy dog"
    val docs = (0L until 40L).map { i =>
      val text =
        if (i >= 36) boiler // hot-only duplicates across corpus and delta
        else s"$boiler unique${i / 2} tail${i / 2} more${i / 2} extra${i / 2}"
      (i, text, "en", if (i % 2 == 1) "src0" else "src9")
    }.toDF("doc_id", "text", "lang", "source")

    val got = Dedup.incrementalDocs(docs, hotDf = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq

    // naive ground truth in plain Scala: per delta doc, the best
    // (corpus-first, then smallest-id) >=0.5-jaccard partner among the
    // corpus and EARLIER delta rows — the jac value is compared too,
    // so a hot/rare intersection miscount cannot hide behind an
    // unchanged partner pick
    def sh3(t: String) = t.split(" ").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val texts = (0L until 40L).map { i =>
      i -> (if (i >= 36) boiler
            else s"$boiler unique${i / 2} tail${i / 2} more${i / 2} extra${i / 2}")
    }.toMap
    def jacOf(n: Long, p: Long): Double = {
      val (a, b) = (sh3(texts(n)), sh3(texts(p)))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val expect = (0L until 40L).filter(_ % 2 == 1).sorted.map { n =>
      val partners = (0L until 40L).filter { p =>
        p != n && (p % 2 == 0 || p < n) && jacOf(n, p) >= 0.5
      }
      val best = partners.sortBy(p => (p % 2, p)).headOption
      (n, if (best.isEmpty) 1 else 0, best.getOrElse(-1L),
        best.map(jacOf(n, _)).getOrElse(-1.0))
    }
    // delta 37 is pure boilerplate: it has NO rare shingles, so every
    // candidate it forms can only arrive through the hot prefix path —
    // the ground truth must still find it a partner (a broken hot path
    // would report keep = 1)
    assert(expect.exists(e => e._1 == 37L && e._2 == 0))
    assert(got === expect)
  }

  test("simhash pairs are genuinely similar (jaccard >= 0.3) with high recall") {
    val exact = exactPairs(sf0001)
    val sh = Dedup.simhash(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision: every simhash pair must be a true near-dup pair
    val texts = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def jac(a: Long, b: Long): Double = {
      def sh3(t: String) = t.split(" ").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
      val (x, y) = (sh3(texts(a)), sh3(texts(b)))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    sh.foreach { case (i, j) => assert(jac(i, j) >= 0.3, s"pair ($i,$j) not similar") }
    // recall on the planted (~0.99 jaccard) dups should be substantial
    assert(sh.intersect(exact).size >= exact.size / 2,
      s"simhash recall too low: ${sh.intersect(exact).size}/${exact.size}")
  }

  test("simhash wide-key twin: identical Hamming<=3 pair set, 20-band single fan-out") {
    // both block splits are pigeonhole-exact for Hamming<=3, so the
    // outputs must be ROW-IDENTICAL (the shared-oracle contract)
    val narrow = Dedup.simhash(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val wide = Dedup.simhashWide(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(wide === narrow, "wide twin must emit the identical pair set")
    assert(graft.operators.Dedup.WideBlockWidths.sum === 64)
    // all 20 bands ride one posexplode per join side — no unionAll
    // per band (the CLAUDE.md band-fan-out rule)
    val plan = Dedup.simhashWide(spark, sf0001).queryExecution.sparkPlan.toString
    assert(!plan.contains("Union"),
      "band fan-out must be a single posexplode, not a unionAll per band")
  }

  test("bloom gate: no false negatives, exact verdicts, bounded FPs, partitioning-independent") {
    import spark.implicits._
    def plant(dir: String, parts: Int): Unit = {
      val corpus = (0 until 200).map(i =>
        (i.toLong, s"corpus document number $i with unique alpha content stream", "en", "web"))
      // 20 batch docs duplicate corpus texts with case/whitespace noise
      // (same normalized fingerprint), 300 are genuinely new
      val dups = (0 until 20).map(i =>
        (1000L + i, s"  CORPUS   document NUMBER $i with unique ALPHA content stream ", "en", "src0"))
      val fresh = (0 until 300).map(i =>
        (2000L + i, s"fresh crawl page $i bearing beta content nobody saw before", "en", "src0"))
      val df = (corpus ++ dups ++ fresh)
        .toDF("doc_id", "text", "lang", "source")
      (if (parts == 1) df.coalesce(1) else df.repartition(parts))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft-bloom").toFile.getAbsolutePath
    plant(d1, 1)
    val rows = Dedup.bloomGateRaw(spark, d1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(rows.size === 320, "one verdict per batch row")
    // exact verdicts: the 20 planted duplicates and nothing else
    val dupIds = rows.filter(_._2._2 == 1).keySet
    assert(dupIds === (0 until 20).map(i => 1000L + i).toSet)
    // the Bloom guarantee: is_dup == 1 implies bloom_hit == 1 (never a
    // false negative), and every planted dup was hit
    rows.values.foreach { case (hit, dup) => if (dup == 1) assert(hit === 1) }
    // false positives among the 300 fresh docs bounded well above the
    // 1% sizing (5% leaves margin for hash-collision luck)
    val fp = rows.filter { case (id, (hit, dup)) => id >= 2000L && hit == 1 && dup == 0 }
    assert(fp.size <= 15, s"false-positive rate too high: ${fp.size}/300")
    // partial filters OR together: a 7-way partitioned corpus builds
    // the identical verdict set (merge path exercised)
    val d2 = java.nio.file.Files.createTempDirectory("graft-bloom7").toFile.getAbsolutePath
    plant(d2, 7)
    val again = Dedup.bloomGateRaw(spark, d2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(again === rows, "bloom verdicts must not depend on partitioning")
    // the REGISTERED witness card: exact is_dup for every batch row,
    // nfn_ok pinned TRUE (a probe that missed a true dup would flip it)
    val card = Dedup.bloomGate(spark, d1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(card.size === 320)
    assert(card.filter(_._2._1 == 1).keySet === dupIds)
    card.values.foreach { case (_, nfn) => assert(nfn === 1, "nfn_ok must hold") }
  }

  test("bloom gate: EMPTY standing corpus degrades to admit-everything, not a null filter") {
    import spark.implicits._
    // every doc is a delta source → the corpus side of the gate is empty
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom0").toFile.getAbsolutePath
    (0 until 25).map(i => (i.toLong, s"only new crawl page $i", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val raw = Dedup.bloomGateRaw(spark, dir).collect()
    assert(raw.length === 25)
    raw.foreach { r =>
      assert(r.getInt(2) === 0, "empty corpus: no probe may hit")
      assert(r.getInt(3) === 0, "empty corpus: nothing is a duplicate")
    }
    val card = Dedup.bloomGate(spark, dir).collect()
    assert(card.length === 25)
    card.foreach { r =>
      assert(r.getInt(2) === 0 && r.getInt(3) === 1, "card: is_dup=0, nfn_ok pinned")
    }
  }

  test("embedding near-dup pairs report correct cosine and respect threshold") {
    val rows: Array[Row] = Dedup.embeddingNearDup(spark, sf0001, threshold = 0.3).collect()
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(c >= 0.3)
      assert(math.abs(cos(vecs(i), vecs(j)) - c) < 1e-9)
    }
  }

  test("containment: embedded doc caught, jaccard would miss it") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-contain")
      .toFile.getAbsolutePath
    val core = "alpha bravo charlie delta echo foxtrot golf hotel"
    val pad = (1 to 40).map(i => s"pad$i").mkString(" ")
    Seq(
      (1L, core, "en", "s0"),                 // 6 shingles, all inside doc 2
      (2L, s"$core $pad", "en", "s0"),        // doc 1 + 40 unique tokens
      (3L, "unrelated words entirely different text here now", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.containment(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 1)
    val (i, j, shared, c) = out.head
    assert((i, j) === ((1L, 2L)))
    assert(c === 1.0, "every shingle of doc 1 appears in doc 2")
    assert(shared === 6L)
    // symmetric jaccard on the same pair stays far below the 0.5 cut:
    // 6 shared / (6 + 46 - 6) union — the case this operator exists for
    val jac = Dedup.ngramJaccardDocs(
      Tables.documents(spark, d)).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("containment: boilerplate-only overlap is not cloning evidence") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-contain-hot")
      .toFile.getAbsolutePath
    // 300 docs of identical boilerplate: every shared shingle has
    // df = 300 > 256, so NO pair qualifies; two docs sharing one
    // rare shingle DO qualify
    val boiler = (1L to 300L).map(i => (i, "all rights reserved terms apply", "en", "s0"))
    val rare = Seq(
      (1001L, "zulu yankee xray whiskey victor", "en", "s1"),
      (1002L, "zulu yankee xray whiskey victor extra tail words here", "en", "s1"))
    (boiler ++ rare).toDF("doc_id", "text", "lang", "source")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.containment(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1001L, 1002L)))
  }
}
