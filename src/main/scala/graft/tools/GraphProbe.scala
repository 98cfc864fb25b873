package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r14 phase-timer for the graph family's shared prefix and the
  * pagerank round loop — answers "where do graph_pagerank's ~6 s go"
  * before any lever is pulled (guide §1: measure first).
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GraphProbe"` */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.benchSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm scan path

    def time[T](label: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"[graphprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def pairs(): DataFrame = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()

    (1 to 2).foreach { lap =>
      println(s"--- lap $lap ---")
      time("pairs distinct count")(pairs().count())
      time("pairs + explode edges + deg count") {
        val pinned = pairs().cache()
        val edges = pinned
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
        val n = deg.count()
        pinned.unpersist(); deg.unpersist()
        n
      }
      time("pageRankEdges partitioned (8 it)") {
        graft.Bench.forceEval(graft.operators.Graph.pageRankEdges(pairs(), 8, 0.85))
      }
      time("pageRankEdges broadcast   (8 it)") {
        graft.Bench.forceEval(graft.operators.Graph.pageRankEdges(pairs(), 8, 0.85,
          broadcastState = true))
      }
      time("full graph_pagerank query") {
        graft.Bench.forceEval(graft.SparkEntry.queries("graph_pagerank")(spark, sfDir))
      }
      Seq(1, 2, 4, 8).foreach { it =>
        time(s"pageRankEdges partitioned ($it it)") {
          graft.Bench.forceEval(graft.operators.Graph.pageRankEdges(pairs(), it, 0.85))
        }
      }
      time("variant D: no AQE coalesce (8 it)") {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try graft.Bench.forceEval(graft.operators.Graph.pageRankEdges(pairs(), 8, 0.85))
        finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      }
      time("variant E: no AQE at all (8 it)") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try graft.Bench.forceEval(graft.operators.Graph.pageRankEdges(pairs(), 8, 0.85))
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      // variant B: per-round eager checkpoint of the (small) rank
      // vector — kills the quadratically growing nested plan
      time("variant B: per-round ckpt (8 it)") {
        val pinned = pairs().cache()
        val edges = pinned
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
        val withDeg = edges.join(deg, "src").cache()
        val n = deg.count()
        var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("pr"))
          .localCheckpoint(true)
        for (_ <- 1 to 8) {
          val prev = ranks
          ranks = withDeg.join(ranks, col("src") === col("node"))
            .select(col("dst"), (col("pr") / col("deg")).as("w"))
            .groupBy(col("dst")).agg(sum(col("w")).as("m"))
            .select(col("dst").as("node"),
              (lit(0.15 / n) + lit(0.85) * col("m")).as("pr"))
            .localCheckpoint(true)
          graft.operators.Ckpt.release(prev)
        }
        graft.Bench.forceEval(ranks)
        Seq(withDeg, deg, pinned).foreach(_.unpersist())
      }
      // variant C: fold deg into an inverse-weight edge cache, narrow
      time("variant C: invdeg edges + per-round ckpt") {
        val pinned = pairs().cache()
        val edges = pinned
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val wEdges = edges.join(deg, "src")
          .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("iw"))
          .cache()
        val n = deg.count()
        var ranks = wEdges.select(col("src").as("node")).distinct()
          .select(col("node"), lit(1.0 / n).as("pr"))
          .localCheckpoint(true)
        for (_ <- 1 to 8) {
          val prev = ranks
          ranks = wEdges.join(ranks, col("src") === col("node"))
            .select(col("dst"), (col("pr") * col("iw")).as("w"))
            .groupBy(col("dst")).agg(sum(col("w")).as("m"))
            .select(col("dst").as("node"),
              (lit(0.15 / n) + lit(0.85) * col("m")).as("pr"))
            .localCheckpoint(true)
          graft.operators.Ckpt.release(prev)
        }
        graft.Bench.forceEval(ranks)
        wEdges.unpersist()
      }
    }
    spark.stop()
  }
}
