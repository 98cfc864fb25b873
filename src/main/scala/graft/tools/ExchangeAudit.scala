package graft.tools

/** Regenerates the frozen per-query shuffle-exchange counts for
  * [[graft.ExchangeBudgets]]: prints the Scala map source to stdout.
  * Run after a deliberate plan change, paste the diff, and state the
  * reason in the commit (the BenchBudgets re-freeze discipline).
  * `sbt "runMain graft.tools.ExchangeAudit /root/testdata/sf0.001"` */
object ExchangeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Bench.benchSession("4")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = graft.ExchangeBudgets.countExchanges(fn(spark, sfDir))
      println(s"""    "$name" -> $n,""")
    }
    spark.stop()
  }
}
