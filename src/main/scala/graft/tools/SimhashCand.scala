package graft.tools

/** Dev-only: candidate-pair counts of the narrow (4 × 16-bit) vs wide
  * (C(6,3) block-triple) simhash banding at each data scale — the
  * sub-quadratic-growth evidence for the BENCH_NOTES scaling table.
  * `sbt "runMain graft.tools.SimhashCand /root/testdata/sf0.1 /tmp/sf0.2 /tmp/sf0.5"` */
object SimhashCand {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.benchSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { d =>
      val (nc, nf, wc, wf) = graft.operators.Dedup.simhashCandidateCounts(spark, d)
      println(s"[cand] $d narrow_pairs=$nc narrow_false=$nf wide_pairs=$wc wide_false=$wf")
    }
    spark.stop()
  }
}
