package graft

import graft.functions.SimHashAgg
import org.apache.spark.sql.functions._

/** The native SimHash aggregate must match the driver-side reference
  * and be insensitive to partitioning (merge correctness). */
class SimHashAggSpec extends SparkSpec {

  test("agg matches reference and is partitioning-invariant") {
    import spark.implicits._
    Graft.registerFunctions(spark)
    val hashes = Seq(1L, 3L, 3L, -7L, 42L, Long.MinValue, Long.MaxValue)
    val expected = SimHashAgg.reference(hashes)
    for (parts <- Seq(1, 3, 7)) {
      val got = hashes.toDF("h").repartition(parts)
        .agg(call_function("graft_simhash", col("h")))
        .collect().head.getLong(0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("equals the 64-column sum formulation on real documents") {
    import spark.implicits._
    Graft.registerFunctions(spark)
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("tok"))
    val h = xxhash64(col("tok"))
    val viaColumns = toks.groupBy(col("doc_id"))
      .agg(
        sum(when(h.bitwiseAND(lit(1L)) =!= 0, 1).otherwise(-1)).as("s0"),
        (1 until 64).map(i =>
          sum(when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, 1).otherwise(-1)).as(s"s$i")): _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"s$i") > 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = toks.groupBy(col("doc_id"))
      .agg(call_function("graft_simhash", h).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaColumns)
  }
}
