package graft.tools

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Walks every registered query's physical plan (pre-AQE, the
  * PlanAuditSpec convention) and prints the distinct CodegenFallback
  * expression classes it contains — the interpreted-evaluation nodes
  * that multiply at 100 TB (the round-10 Shingles lesson: a lambda
  * pipeline re-tokenized ~7x per row until replaced with one codegen'd
  * expression). Feed the output into PlanAuditSpec's whitelist.
  * `sbt "runMain graft.tools.CodegenAudit /root/testdata/sf0.001"` */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Bench.benchSession("4")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val classes = graft.CodegenAuditSupport
        .fallbackClasses(fn(spark, sfDir))
      if (classes.nonEmpty)
        println(s"""    "$name" -> Set(${classes.toSeq.sorted.map("\"" + _ + "\"").mkString(", ")}),""")
    }
    spark.stop()
  }
}
