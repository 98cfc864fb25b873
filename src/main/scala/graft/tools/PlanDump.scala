package graft.tools

/** One-query formatted-plan dump + single timed run — the explain()
  * companion to BenchOne for chasing a scale-sweep reading.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanDump <query>"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.benchSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name formatted plan =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      graft.Bench.forceEval(df)
      println(f"===== $name executed in ${(System.nanoTime() - t0) / 1e9}%.2f s =====")
      val executed = df.queryExecution.executedPlan.toString
      println(s"sig occurrences in executed plan: " +
        "graft_hyperplane_sig".r.findAllIn(executed).length)
    }
    spark.stop()
  }
}
