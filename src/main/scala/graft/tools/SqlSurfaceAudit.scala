package graft.tools

/** Enumerates SQL-surface reachability for every registered operator
  * (r12 verdict-6): walks each query's ANALYZED logical plan for node
  * types that have no `spark.sql` surface — typed/object operators
  * (flatMapGroupsWithState, mapPartitions, mapGroups…) and RDD-backed
  * roots (driver-iterative loops materialized via localCheckpoint).
  * A query with none of those is expressible as one SQL statement
  * over `Graft.registerViews` + the `graft_*` extension functions.
  * Feed the output into SqlSurfaceAuditSpec's declared map and the
  * SURVEY §3 table.
  * `sbt "runMain graft.tools.SqlSurfaceAudit /root/testdata/sf0.001"` */
object SqlSurfaceAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Bench.benchSession("4")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val blockers = graft.SqlSurfaceAuditSupport.sqlBlockers(fn(spark, sfDir))
      if (blockers.nonEmpty)
        println(s"""    "$name" -> Set(${blockers.toSeq.sorted.map("\"" + _ + "\"").mkString(", ")}),""")
    }
    spark.stop()
  }
}
