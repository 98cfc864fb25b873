package graft

import java.nio.file.Files

import graft.operators.{Chunking, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Drives the text pipeline over planted pathological documents —
  * empty text, whitespace-only, exact duplicates, single token — the
  * cases the synthetic corpus never contains (its min is 10 tokens).
  * This is what exercises the divide-by-zero guards and short-input
  * bounds for real. */
class EdgeCaseSpec extends SparkSpec {

  /** Write a miniature documents.parquet and return its directory. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-edge").toFile.getAbsolutePath
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0", 43L),
      (1L, "", "en", "src1", 0L),                       // empty
      (2L, "   ", "en", "src1", 3L),                    // whitespace-only
      (3L, "solo", "en", "src2", 4L),                   // single token
      (4L, "the quick brown fox jumps over the lazy dog", "en", "src3", 43L), // dup of 0
      (5L, "a b", "en", "src4", 3L))                    // below shingle width
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("quality guards empty/whitespace docs with nulls instead of failing") {
    val rows = TextOps.quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 6)
    // zero-token docs: ratios are null, not a DIVIDE_BY_ZERO crash
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).isNullAt(3), s"doc $id stop_ratio should be null")
      assert(rows(id).isNullAt(5), s"doc $id quality should be null")
    }
    assert(!rows(0L).isNullAt(5))
  }

  test("chunking drops token-less docs and keeps sub-window docs whole") {
    val chunks = Chunking.chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1)
    assert(!byDoc.contains(1L) && !byDoc.contains(2L), "no chunks for empty docs")
    assert(byDoc(3L).map(_._3).toSeq === Seq("solo"))
    assert(byDoc(5L).map(_._3).toSeq === Seq("a b"))
  }

  test("exact dedup collapses planted duplicates, shingle ops skip short docs") {
    val survivors = Dedup.exact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(survivors(0L) === 2L, "docs 0 and 4 are identical")
    assert(!survivors.contains(4L))
    // pairwise jaccard must not blow up on docs below the shingle width
    val pairs = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 4L)))
  }

  test("props explode fans out multi-key JSON maps with parent context") {
    import spark.implicits._
    val df = Seq(
      (1L, "view", """{"k": 87, "x": "a b", "y": null}"""),
      (2L, "click", "not json"),
      (3L, "view", """{}"""))
      .toDF("event_id", "event_type", "props")
    val rows = graft.operators.Dwd.explodeProps(df).collect()
      .map(r => (r.getLong(0), r.getString(2), Option(r.getString(3))))
    assert(rows.toSet === Set(
      (1L, "k", Some("87")), (1L, "x", Some("a b")), (1L, "y", None)))
  }

  test("pagerank: empty pair set yields empty ranks; self-loop graph stays finite") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("a", "b")
    assert(graft.operators.Graph.pageRankEdges(empty, 3, 0.85).collect().isEmpty)
    // self-loop + isolated edge: ranks stay finite and sum to 1
    val loops = Seq("a" -> "a", "b" -> "c").toDF("a", "b")
    val ranks = graft.operators.Graph.pageRankEdges(loops, 4, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet === Set("a", "b", "c"))
    ranks.values.foreach(v => assert(!v.isNaN && !v.isInfinite && v > 0))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
  }

  test("ngram decontam on pathological docs: gram-free docs always survive") {
    val kept = Chunking.decontaminateNgram(spark, dir).collect().map(_.getLong(0)).toSet
    // docs 1,2,3,5 carry no 8-gram -> keep; 0 is benchmark (src0, has
    // 9 tokens -> grams, drops itself); 4 is its verbatim dup -> drops
    assert(kept === Set(1L, 2L, 3L, 5L))
  }

  test("count-min on a tiny corpus keeps probes bounded by row count") {
    val rows = graft.operators.Sketches.countMin(spark, dir, probes = 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // guarantee witness must hold even on a degenerate corpus
    rows.foreach(r => assert(r.getInt(2) === 1))
  }

  test("pii scrub and token counts behave on empty text") {
    val tc = TextOps.tokenCount(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(tc(1L) === ((0, 0)) && tc(2L) === ((0, 0)))
    assert(tc(3L) === ((1, 1)))
    val scrub = Chunking.piiScrub(spark, dir).collect()
    assert(scrub.length === 6)
  }

  test("gram frac on pathological docs: verbatim dups 1.0, gram-free docs 0.0") {
    val out = Dedup.gramFrac(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 0/4 are verbatim copies with 9 tokens → 2 grams, both shared
    assert(out(0L) === ((2L, 2L, 1.0)) && out(4L) === ((2L, 2L, 1.0)))
    Seq(1L, 2L, 3L, 5L).foreach(id => assert(out(id) === ((0L, 0L, 0.0)), s"doc $id"))
  }

  test("rfm with a single purchaser: degenerate cuts give scores (4, 1, 1)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-rfm-edge").toFile.getAbsolutePath
    Seq((1L, 86400L * 1000000000L, 7L, "purchase", 25.5, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.operators.Ads.rfm(spark, d).collect()
    assert(r.length === 1)
    // every cut equals the single observation, so nothing is "above" any
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getDouble(3)) === ((0L, 1L, 25.5)))
    assert((r.head.getInt(4), r.head.getInt(5), r.head.getInt(6)) === ((4, 1, 1)))
    // and a single active day: DAU = WAU = 1
    val au = graft.operators.Ads.activeUsers(spark, d).collect()
    assert(au.length === 1 && au.head.getLong(1) === 1L && au.head.getLong(2) === 1L)
  }

  test("bfs with no sources terminates empty; isolated source reports only itself") {
    import spark.implicits._
    val pairs = Seq(1L -> 2L).toDF("a", "b")
    assert(graft.operators.Graph.bfsEdges(pairs,
      Seq.empty[Long].toDF("node"), 6).count() === 0L)
    // source 9 touches no edge: one row at distance 0
    val iso = graft.operators.Graph.bfsEdges(pairs, Seq(9L).toDF("node"), 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(iso.toSeq === Seq(9L -> 0))
  }

  test("scd2 pit: versions and tombstones interleaving within ONE microsecond resolve by cdc id") {
    import spark.implicits._
    import graft.operators.DimMaintenance
    val d = Files.createTempDirectory("graft-pit-us").toFile.getAbsolutePath
    val T = 100L * 1000000000L // 100 s in ns; all same-μs rows live in [T, T+1000ns)
    // raw nanos DELIBERATELY order opposite to event_id within the
    // microsecond: ordering on ns instead of (ts_us, event_id) would
    // flip the winners, and DuckDB (micros read) could never agree
    def ev(id: Long, ns: Long, typ: String, k: Long): (Long, Long, Long, String, Double, String) =
      (id, ns, 1L, typ, 1.0, s"""{"k": $k}""")
    Seq(
      // k=1 inside one μs: upd(40) → tombstone(41) → upd(42); the
      // same-μs chain collapses to empty intervals and upd-42 survives
      ev(40, T + 800, "purchase", 1), ev(41, T + 500, "error", 1),
      ev(42, T + 100, "purchase", 1),
      // k=2 inside one μs: upd(50) → upd(51) → tombstone(52): the
      // tombstone is the max tie, so the key is DELETED at T
      ev(50, T + 900, "purchase", 2), ev(51, T + 600, "purchase", 2),
      ev(52, T + 300, "error", 2),
      // facts: views at the SAME μs as the chains (id above every cdc
      // id), one before, one after
      ev(60, T + 950, "view", 1),          // same μs → upd-42
      ev(61, T - 1000000000L, "view", 1),  // 1 s before → base
      ev(62, T + 2000000000L, "view", 1),  // 2 s after → upd-42
      ev(63, T + 50, "view", 2),           // same μs → deleted → NULL
      ev(64, T - 1000000000L, "view", 2),  // before → base
      ev(65, T + 2000000000L, "view", 2))  // after → still deleted → NULL
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq((1L, "base-1", "B"), (2L, "base-2", "B"))
      .toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = DimMaintenance.scd2PointInTime(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(out === Map(
      60L -> "upd-42", 61L -> "base-1", 62L -> "upd-42",
      63L -> null, 64L -> "base-2", 65L -> null))
    // the SCD2 history view of the same μs: every same-μs predecessor
    // carries an EMPTY [T, T) validity; only upd-42 stays current
    val hist = DimMaintenance.dimScd2(spark, d).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getString(1) -> ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))).toMap
    val tUs = T / 1000
    assert(hist("upd-40") === ((tUs, tUs, 0)), "same-μs predecessor: empty validity")
    assert(hist("upd-42") === ((tUs, -1L, 1)), "max cdc id within the μs is current")
  }

  test("pca on a zero-variance corpus: no NaNs, unit start vector, zero var share") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pca-edge").toFile.getAbsolutePath
    (1L to 5L).map(i => (i, Array.fill(8)(2.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = graft.operators.Similarity.embPca(spark, d).collect()
    assert(rows.length === 16, "8 dims x 2 components")
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
      assert(r.getDouble(3) === 0.0)
    }
    // each component's (arbitrary but deterministic) start direction
    // stays a unit vector, and the pair stays orthogonal
    val byComp = rows.groupBy(_.getLong(0))
      .map { case (c, rs) => c -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    byComp.values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
    }
    val dot12 = byComp(1L).zip(byComp(2L)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-4, "components must stay orthogonal")
    // and an empty corpus returns an empty frame, not a crash
    val e = Files.createTempDirectory("graft-pca-empty").toFile.getAbsolutePath
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$e/embeddings.parquet")
    assert(graft.operators.Similarity.embPca(spark, e).count() === 0L)
  }

  test("events loader: nanos-long, NTZ-micros and instant-micros encodings normalize identically") {
    // the testdata generator has shipped events.ts as int64
    // TIMESTAMP(NANOS) (read as long under nanosAsLong) and as plain
    // TIMESTAMP_NTZ(MICROS); Tables.events must normalize every
    // encoding to the same (ts_ns, ts_us, ts) — this pins the
    // contract against the next regeneration
    import spark.implicits._
    val usVals = Seq(86400000000L, 86400000001L, 86399999999L) // around day 1
    def load(d: String) = Tables.events(spark, d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("ts_ns"),
        r.getAs[Long]("ts_us"), r.getAs[java.sql.Timestamp]("ts").getTime))
      .sortBy(_._1).toSeq

    val dNanos = Files.createTempDirectory("graft-ev-ns").toFile.getAbsolutePath
    usVals.zipWithIndex.map { case (us, i) =>
      (i.toLong, us * 1000L, i.toLong, "view", 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dNanos/events.parquet")

    val dNtz = Files.createTempDirectory("graft-ev-ntz").toFile.getAbsolutePath
    usVals.zipWithIndex.map { case (us, i) =>
      (i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
        i.toLong, "view", 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dNtz/events.parquet")

    val dLtz = Files.createTempDirectory("graft-ev-ltz").toFile.getAbsolutePath
    usVals.zipWithIndex.map { case (us, i) =>
      // Timestamp(ms) truncates to millis; sub-ms rides in the nanos field
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      (i.toLong, t, i.toLong, "view", 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dLtz/events.parquet")

    val expected = usVals.zipWithIndex.map { case (us, i) =>
      (i.toLong, us * 1000L, us, us / 1000L)
    }.sortBy(_._1).toSeq
    assert(load(dNanos) === expected, "nanos-long encoding")
    assert(load(dNtz) === expected, "TIMESTAMP_NTZ(MICROS) encoding")
    assert(load(dLtz) === expected, "instant TIMESTAMP(MICROS) encoding")
  }

  test("entropy: empty and whitespace docs emit no row, single token is zero-entropy") {
    val out = TextOps.entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    // docs 1 and 2 (empty / whitespace-only) have no tokens -> absent,
    // matching the oracle's term-derived row set
    assert(!out.contains(1L) && !out.contains(2L))
    // "solo": one token, p=1 -> H=0, type-token ratio 1
    assert(out(3L) === ((1L, 0.0, 1.0)))
    // duplicate docs 0 and 4 score identically
    assert(out(0L) === out(4L))
  }
}
