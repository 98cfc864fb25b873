package graft

import java.nio.file.Files

import graft.operators.Chunking

/** Planted-corpus checks for the n-gram decontamination semantics —
  * the oracle proves engine-equality, these prove the overlap rule. */
class ChunkingSpec extends SparkSpec {

  test("ngram decontam: 8-gram quotes drop, 7-gram overlaps keep, short bench docs survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-decon").toFile.getAbsolutePath
    val bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      // benchmark docs (sources src0-4 play the held-out set)
      (1L, bench, "en", "src0", 1L),
      (2L, "tiny bench doc", "en", "src1", 1L), // < 8 tokens: no grams
      // corpus docs
      (3L, "prefix words then alpha bravo charlie delta echo foxtrot golf hotel and more", "en", "src7", 1L), // 8-gram quote
      (4L, "alpha bravo charlie delta echo foxtrot golf DIFFERENT tail words here", "en", "src8", 1L), // only 7-gram overlap
      (5L, "completely unrelated content with no shared phrases at all whatsoever", "en", "src9", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = Chunking.decontaminateNgram(spark, dir).collect().map(_.getLong(0)).toSet
    // doc 1 drops (is benchmark), doc 2 survives (no grams to match),
    // doc 3 drops (verbatim 8-gram), docs 4 and 5 keep
    assert(kept === Set(2L, 4L, 5L))
  }

  test("pmi: collocation scores recompute from driver-side counts") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pmi")
      .toFile.getAbsolutePath
    val texts =
      Seq.fill(5)("big apple tour") ++ Seq("big apple", "small apple") ++
        Seq.fill(5)("big dog runs") ++ Seq("dog sleeps")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    // independent reference with the same probability expression
    val toks = texts.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, v) => w -> v.size.toDouble }
    val u = toks.flatten.size.toDouble
    val bis = toks.flatMap(l => l.zip(l.drop(1)))
    val b = bis.size.toDouble
    val expect = bis.groupBy(identity).map { case (p, v) => p -> v.size }
      .filter(_._2 >= 5)
      .map { case ((w1, w2), cab) =>
        val raw = math.log((cab / b) / ((uni(w1) / u) * (uni(w2) / u)))
        (w1, w2, cab.toLong,
          BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
    val got = graft.operators.TextOps.pmi(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(expect.map(t => (t._1, t._2)).toSet ===
      Set("big" -> "apple", "apple" -> "tour", "big" -> "dog", "dog" -> "runs"))
    assert(got === expect)
  }
}
