package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Mergeable HLL pre-aggregation: merged monthly sketches must agree
  * with (a) the exact distinct counts within the lgK=14 error bound
  * and (b) a direct year-level sketch — the merge loses nothing. */
class SketchesSpec extends SparkSpec {

  test("year rollup of monthly sketches tracks exact distinct counts") {
    val approx = Sketches.hllPreAggRaw(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Sketches.exactByYear(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (y, e) =>
      val a = approx(y)
      assert(math.abs(a - e).toDouble / e < 0.03,
        s"year $y: sketch estimate $a vs exact $e")
    }
  }

  test("merging monthly sketches equals sketching the year directly") {
    val merged = Sketches.hllPreAggRaw(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === direct.keySet)
    // same lgK, same hashed values → unioned registers are the
    // pointwise max of the monthly registers = the direct registers
    merged.foreach { case (y, m) =>
      assert(m === direct(y), s"year $y: merged $m != direct ${direct(y)}")
    }
  }

  test("sketch estimates are deterministic across repartitionings") {
    val a = Sketches.hllPreAggRaw(spark, sf001).collect().toSeq
    val b = Sketches.hllPreAggRaw(spark, sf001).collect().toSeq
    assert(a === b)
  }

  test("q_hll_presketch witness card: exact distincts and months, hll_ok TRUE") {
    val exact = Sketches.exactByYear(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Sketches.hllPreAgg(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) === exact(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getInt(3) === 1, s"${r.getString(0)}: hll_ok must hold")
    }
  }

  test("count-min guarantee witness: top-20 exact counts with cms_ok TRUE on every probe") {
    val terms = Tables.documents(spark, sf001)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
    val exact = terms.groupBy(col("t")).agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Sketches.countMin(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      // the witness column carries the guarantee (exact <= est <=
      // exact + ceil(eps*N), checked against the live grid inside the
      // operator); a sketch regression flips it and fails here AND in
      // the driver's oracle compare
      assert(r.getInt(2) === 1, s"${r.getString(0)}: cms_ok must hold")
      assert(r.getLong(1) === exact(r.getString(0)),
        s"${r.getString(0)}: exact_ct must match a direct groupBy")
    }
  }

  test("count-min grid is partitioning-independent for a fixed seed") {
    val a = Sketches.countMin(spark, sf001).collect().toSeq
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Sketches.countMin(spark, sf001).collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
