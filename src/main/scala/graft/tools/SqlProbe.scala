package graft.tools

/** Dev probe: run one SQL statement against a local session (graft
  * functions + views registered when a dir is given) and print the
  * rows — for cross-checking engine builtins (e.g. xxhash64 test
  * vectors) against an oracle replication without writing a spec.
  * `sbt "runMain graft.tools.SqlProbe \"SELECT xxhash64('abc')\" [sfDir]"` */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.benchSession("4")
    graft.Graft.registerFunctions(spark)
    args.drop(1).headOption.foreach(d => graft.Graft.registerViews(spark, d))
    spark.sql(args(0)).collect().foreach(r => println("[probe] " + r.mkString(" | ")))
    spark.stop()
  }
}
