package graft.tools

/** Single-query bench for iterating on one operator without the full
  * [[graft.Bench]] sweep — same session config and forced-evaluation
  * sink (both SHARED with Bench, not copied, so single-query medians
  * are directly comparable to the gate numbers), same cold-cache
  * median-of-3 protocol.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchOne q1 q2"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.benchSession(cpus)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.Bench.forceEval(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name%s median ${times.sorted.apply(1)}%.3f s (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
