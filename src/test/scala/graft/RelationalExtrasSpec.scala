package graft

import java.nio.file.Files

import graft.operators.Relational
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Hand-computed checks for the round-3 relational/text additions —
  * the oracle proves engine-equality; these prove the SEMANTICS. */
class RelationalExtrasSpec extends SparkSpec {

  test("rolling GMV: RANGE frame narrows over missing days (not a rows frame)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-roll").toFile.getAbsolutePath
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // days 1, 2, 10: day 10's 7-day frame covers days 4-10 → only
    // itself; a 3-rows frame would wrongly include days 1 and 2
    Seq((1L, 1L, "O", 100.0, t(1), "p"), (2L, 1L, "O", 10.0, t(2), "p"),
      (3L, 1L, "O", 1.0, t(10), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.rollingGmv(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got === Map(
      "2024-01-01" -> (100.0, 100.0),
      "2024-01-02" -> (10.0, 110.0),
      "2024-01-10" -> (1.0, 1.0)))
  }

  test("tfidf: scores and ranks recompute by hand on a planted corpus") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tfidf").toFile.getAbsolutePath
    // 3 docs; "rare" appears only in doc 1 (twice), "common" in all
    Seq((1L, "rare rare common", "en", "s", 0L),
      (2L, "common alpha", "en", "s", 0L),
      (3L, "common beta", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def score(tf: Long, df: Long): Double =
      BigDecimal(tf * math.log(4.0 / (df + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.tfidf(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: rare tf=2 df=1 beats common tf=1 df=3 (whose idf is 0)
    assert(got((1L, 1)) === ("rare", 2L, 1L, score(2, 1)))
    assert(got((1L, 2)) === ("common", 1L, 3L, score(1, 3)))
    assert(got((1L, 2))._4 === 0.0) // ln(4/4) = 0: all-docs terms score 0
    // doc 2: alpha (tf=1, df=1) ranks above common
    assert(got((2L, 1)) === ("alpha", 1L, 1L, score(1, 1)))
  }

  test("unpivot emits one (charge, amount) row per metric column, no shuffle") {
    val out = Relational.unpivotCharges(spark, sf0001)
    val n = Tables.lineitem(spark, sf0001).count()
    assert(out.count() === 3 * n)
    // narrow transform: no Exchange anywhere before the presentation sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.split("Sort").head.contains("Exchange"),
      "unpivot should be an in-place Expand, not a shuffle")
  }
}
