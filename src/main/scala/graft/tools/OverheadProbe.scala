package graft.tools

/** r14: per-query fixed-cost breakdown — construction (driver-side
  * operator building, incl. any bounded collects), planning (analysis
  * + optimization + physical planning), and execution — for a sample
  * of sub-second queries. Answers whether the ~60 s long-tail of the
  * 199-query sweep is compute or framework overhead (guide §1).
  * `sbt "runMain graft.tools.OverheadProbe q1_pricing_summary ..."` */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.benchSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q_gapfill", "q_full_outer", "dwd_clean",
        "text_pii_scrub", "dedup_exact", "q_cube", "ea_sessionize")
    (1 to 2).foreach { lap =>
      println(s"--- lap $lap ---")
      names.foreach { name =>
        spark.catalog.clearCache()
        val fn = graft.SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis->physical planning
        val t2 = System.nanoTime()
        graft.Bench.forceEval(df)
        val t3 = System.nanoTime()
        println(f"[overhead] $name%-24s construct ${(t1 - t0) / 1e9}%6.3f  " +
          f"plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f  " +
          f"total ${(t3 - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
