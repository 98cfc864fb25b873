package graft

import graft.operators.{Dws, Relational}

/** The SQL surface: a user who runs plain SQL (not the DataFrame API)
  * against `Graft.registerViews` + the native extension functions must
  * get exactly what the operators produce. Each case runs a pure
  * `spark.sql` text and compares collected rows with the DataFrame
  * formulation. */
class SqlSurfaceSpec extends SparkSpec {

  private def same(sqlText: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sqlText).collect().map(_.toSeq).toSeq
    val viaDf = df.collect().map(_.toSeq).toSeq
    assert(viaSql === viaDf)
  }

  test("q1 pricing summary as pure SQL matches the DataFrame operator") {
    Graft.registerViews(spark, sf001)
    same(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      Relational.q1PricingSummary(spark, sf001))
  }

  test("keyword stats as pure SQL (LATERAL explode) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """SELECT keyword, count(*) AS ct, 'SEARCH' AS source
        |FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS keyword
        |WHERE length(keyword) > 0
        |GROUP BY keyword
        |ORDER BY keyword""".stripMargin,
      Dws.keywordStats(spark, sf001))
  }

  test("native extension functions are callable from SQL") {
    Graft.registerViews(spark, sf001)
    Graft.registerFunctions(spark)
    // rolling hash: SQL text ≡ the operator's call_function path
    val viaSql = spark.sql(
      "SELECT doc_id, graft_rolling_hash64(text) AS fp FROM documents ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaOp = graft.operators.TextOps.rollingFingerprint(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql === viaOp)
    // simhash aggregate usable in a SQL GROUP BY (takes a 64-bit hash)
    val sh = spark.sql(
      "SELECT source, graft_simhash(xxhash64(text)) AS sh FROM documents GROUP BY source")
      .collect()
    assert(sh.length > 0 && sh.forall(!_.isNullAt(1)))
    // minhash signature over a SQL-built shingle array: 128 slots, all
    // inside [0, P)
    val sig = spark.sql(
      """SELECT doc_id, graft_minhash_sig(
        |  filter(split(text, ' '), t -> length(t) > 0)) AS sig
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(sig.length === 5)
    sig.foreach { r =>
      val arr = r.getSeq[Long](1)
      assert(arr.length === 128)
      assert(arr.forall(v => v >= 0 && v <= 2147483647L))
    }
  }
}
