package graft

import java.nio.file.Files

import graft.functions.RollingHash64
import graft.operators.TextOps

/** Winnowing fingerprints (`text_winnow`) against a from-scratch
  * driver reference, and bigram stupid-backoff LM (`text_lm_bigram`)
  * against hand-computed scores. */
class WinnowSpec extends SparkSpec {

  /** Independent winnowing reference: k-token shingles, FNV rolling
    * hash, rightmost-min per w-window, deduped (pos, fp) set. */
  private def refWinnow(text: String, k: Int = 4, w: Int = 4): Set[(Int, Long)] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val h = toks.sliding(k).map(g =>
      RollingHash64.hash(g.mkString(" ").getBytes("UTF-8"))).toArray
    val L = math.max(h.length - (w - 1), 1)
    (0 until L).map { i =>
      val win = h.slice(i, math.min(i + w, h.length))
      val mn = win.min
      (i + win.lastIndexOf(mn), mn)
    }.toSet
  }

  test("text_winnow matches the driver reference on every corpus doc") {
    val got = TextOps.winnow(spark, sf0001).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet }
    val want = Tables.documents(spark, sf0001).collect()
      .map(r => r.getLong(0) -> refWinnow(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    assert(got === want)
  }

  test("text_winnow: rightmost-min tie rule and coverage on planted docs") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-winnow").toFile.getAbsolutePath
    val tieDoc = "x y z w x y z w x y z w x y z w"  // period-4 equal hashes
    val shortDoc = "a b c d e"                       // 2 shingles < one window
    val tiny = "a b c"                               // < k tokens: no shingles
    Seq((1L, tieDoc, "en", "s", 1L), (2L, shortDoc, "en", "s", 1L),
      (3L, tiny, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.winnow(spark, d).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet }
    assert(got.getOrElse(3L, Set.empty) === Set.empty)
    assert(got(1L) === refWinnow(tieDoc) && got(2L) === refWinnow(shortDoc))
    // local-coverage guarantee: every w-window of shingle positions
    // contains a selected fingerprint position
    val m = tieDoc.split(" ").length - 3
    val sel1 = got(1L).map(_._1)
    (0 to m - 4).foreach { i =>
      assert(sel1.exists(p => p >= i && p < i + 4), s"window $i uncovered")
    }
  }

  test("text_lm_bigram: hand-computed stupid-backoff scores, real backoff path") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-lmb").toFile.getAbsolutePath
    Seq((0L, "a b a c", "en", "s", 1L), (2L, "b a", "en", "s", 1L),
      (1L, "a b x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    // train (even ids): cu = {a:3, b:2, c:1}, N=6;
    // cb = {(a,b):1, (b,a):2, (a,c):1}
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def mean(xs: BigDecimal*): Double = xs.sum.toDouble / xs.length
    val lpAB = r6(math.log(1.0 / 3.0))
    val lpBA = r6(math.log(2.0 / 2.0))
    val lpAC = r6(math.log(1.0 / 3.0))
    val floor = r6(math.log(0.4 / 6.0))
    val got = TextOps.lmBigram(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 3L, mean(lpAB, lpBA, lpAC), 0L),
      // doc 1: (a,b) seen; (b,x) unseen bigram, x unseen unigram → floor
      (1L, 2L, mean(lpAB, floor), 1L),
      (2L, 1L, mean(lpBA), 0L)))
  }
}
