package graft

import graft.functions.RollingHash64
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The native expression must agree across all three paths: generated
  * code (default), interpreted eval (codegen off), and the driver-side
  * reference implementation. */
class RollingHashSpec extends SparkSpec {

  test("codegen, interpreted, and reference hashes agree") {
    Graft.registerFunctions(spark)
    val texts = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

    def run(): Map[Long, Long] =
      TextOps.rollingFingerprint(spark, sf0001).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }

    val reference = texts.map { case (id, t) =>
      id -> RollingHash64.hash(t.getBytes("UTF-8"))
    }
    assert(viaCodegen === reference)
    assert(viaInterp === reference)
  }

  test("function is callable from SQL after registration") {
    Graft.registerFunctions(spark)
    val r = spark.sql("SELECT graft_rolling_hash64('spark') AS h").collect().head.getLong(0)
    assert(r === RollingHash64.hash("spark".getBytes("UTF-8")))
  }

  test("SQL views + engine functions give a full SQL surface") {
    Graft.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT count(DISTINCT graft_rolling_hash64(text)) AS c FROM documents")
      .collect().head.getLong(0)
    assert(n === Tables.documents(spark, sf0001).count())
  }
}
