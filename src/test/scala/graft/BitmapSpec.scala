package graft

import graft.functions.{BitmapAgg => BitmapAggObj}
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Native Roaring bitmap distinct-set aggregates: exactness against
  * countDistinct, partitioning invariance (OR/AND are
  * order-independent — the property that makes this family
  * oracle-comparable where MG/CMS are not), planted intersection
  * semantics, and the SQL surface. */
class BitmapSpec extends SparkSpec {

  test("bitmap union rollup equals exact countDistinct on real data") {
    val viaBitmap = Sketches.bitmapDistinct(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = Tables.orders(spark, sf001)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("o_custkey")).as("ac"), countDistinct(col("month")).as("mo"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaBitmap === truth)
  }

  test("bitmap cardinalities are exact under any partitioning") {
    graft.Graft.registerFunctions(spark)
    val base = Tables.orders(spark, sf001)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    def run(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.groupBy(col("month"))
        .agg(call_function("graft_bitmap_agg", col("o_custkey")).as("bm"))
        .groupBy(substring(col("month"), 1, 4).as("year"))
        .agg(call_function("graft_bitmap_union_card", col("bm")).as("c"))
        .orderBy(col("year"))
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val a = run(base)
    val b = run(base.repartition(7))
    val c = run(base.repartition(1))
    assert(a === b)
    assert(a === c)
    val exact = Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(countDistinct(col("o_custkey")).as("c"))
      .orderBy(col("year"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(a === exact)
  }

  test("planted intersection: AND card, empty overlap, missing-side guard") {
    graft.Graft.registerFunctions(spark)
    import spark.implicits._
    // group g1: {1,2,3} ∩ {2,3,9} = {2,3}; g2: {1} ∩ {2} = ∅;
    // g3 has ONE side only — the yrs-guard case the query filters out
    val rows = Seq(
      ("g1", "a", 1L), ("g1", "a", 2L), ("g1", "a", 3L),
      ("g1", "b", 2L), ("g1", "b", 3L), ("g1", "b", 9L),
      ("g2", "a", 1L), ("g2", "b", 2L),
      ("g3", "a", 5L)).toDF("g", "side", "id")
    val out = rows.groupBy($"g", $"side")
      .agg(call_function("graft_bitmap_agg", $"id").as("bm"))
      .groupBy($"g")
      .agg(call_function("graft_bitmap_and_card", $"bm").as("both"),
        count(lit(1)).as("sides"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("g1") === ((2L, 2L)))
    assert(out("g2") === ((0L, 2L)))
    // one partial present: AND of a single set is that set — callers
    // must guard on the partial count, exactly as bitmapIntersect does
    assert(out("g3") === ((1L, 1L)))
  }

  test("bitmapIntersect matches the per-customer HAVING oracle shape") {
    val viaBitmap = Sketches.bitmapIntersect(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val truth = Tables.orders(spark, sf001)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1995, 1996))
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_custkey"))
      .agg(countDistinct(col("yr")).as("yrs"))
      .filter(col("yrs") === 2)
      .groupBy(col("n_name")).agg(count(lit(1)).as("both_years"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaBitmap === truth)
    assert(viaBitmap.nonEmpty)
  }

  test("serialization roundtrip preserves the set") {
    val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
    Seq(0L, 1L, 42L, Int.MaxValue.toLong + 7L, Long.MaxValue - 1).foreach(bm.addLong)
    val back = BitmapAggObj.deserialize(BitmapAggObj.serialize(bm))
    assert(back.getLongCardinality === 5L)
    assert(back.contains(Int.MaxValue.toLong + 7L))
    assert(back.contains(Long.MaxValue - 1))
  }

  test("SQL surface: the bitmap functions compose in pure SQL text") {
    graft.Graft.registerFunctions(spark)
    Graft.registerViews(spark, sf001)
    val sql = spark.sql(
      """SELECT substr(month, 1, 4) AS year,
        |  graft_bitmap_union_card(bm) AS c
        |FROM (
        |  SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
        |    graft_bitmap_agg(o_custkey) AS bm
        |  FROM orders GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(countDistinct(col("o_custkey")).as("c"))
      .orderBy(col("year"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sql === exact)
  }

  test("persisted serving: the monthly bitmap table round-trips through parquet") {
    graft.Graft.registerFunctions(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-bmtable")
      .toFile.getAbsolutePath
    // build the fine-grained pre-agg ONCE (the thing a 100 TB
    // warehouse persists), write it as a plain parquet BINARY column
    Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(call_function("graft_bitmap_agg", col("o_custkey")).as("bm"))
      .write.mode("overwrite").parquet(s"$d/custs_by_month.parquet")
    // serve an ad-hoc coarser rollup from the FILE alone — raw orders
    // are never read again
    val served = spark.read.parquet(s"$d/custs_by_month.parquet")
      .groupBy(substring(col("month"), 1, 4).as("year"))
      .agg(call_function("graft_bitmap_union_card", col("bm")).as("c"))
      .orderBy(col("year"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(countDistinct(col("o_custkey")).as("c"))
      .orderBy(col("year"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(served === exact)
  }
}
