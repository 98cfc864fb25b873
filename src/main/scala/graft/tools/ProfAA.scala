package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.Tables

/** Throwaway stage profiler for graph_adamic_adar (deleted after use). */
object ProfAA {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Bench.benchSession("32")
    import org.apache.spark.sql.types.DecimalType
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.read.parquet(s"$d/lineitem.parquet").count()
    (1 to 3).foreach { it =>
      spark.catalog.clearCache()
      val pairs = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("c"), col("o_custkey").as("z"))
      time(s"$it join+select only")(pairs.write.format("noop").mode("overwrite").save())
      val nbrs = pairs.groupBy(col("z"))
        .agg(sort_array(collect_set(col("c"))).as("cs"))
        .withColumn("deg", size(col("cs")))
        .filter(col("deg") >= 2 && col("deg") <= 256)
        .select(col("cs"),
          round(lit(1.0) / log(col("deg").cast("double")), 6)
            .cast(DecimalType(18, 6)).as("w"))
      time(s"$it +groupBy collect_set")(nbrs.write.format("noop").mode("overwrite").save())
      val exploded = nbrs
        .select(col("w"), col("cs"), posexplode(col("cs")).as(Seq("i", "a")))
        .select(col("w"), col("a"),
          explode(expr("slice(cs, i + 2, size(cs))")).as("b"))
      time(s"$it +double explode")(exploded.write.format("noop").mode("overwrite").save())
      val agg = exploded.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("common"), sum(col("w")).cast("double").as("aa"))
      time(s"$it +groupBy(a,b) dec")(agg.write.format("noop").mode("overwrite").save())
      // variant A: micro-unit LONG weight through the fan-out
      val nbrsL = nbrs.select(col("cs"), (col("w") * 1000000).cast("long").as("wu"))
      val expL = nbrsL
        .select(col("wu"), col("cs"), posexplode(col("cs")).as(Seq("i", "a")))
        .select(col("wu"), col("a"),
          explode(expr("slice(cs, i + 2, size(cs))")).as("b"))
      val aggL = expL.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("common"), (sum(col("wu")) / 1000000.0).as("aa"))
      time(s"$it +groupBy(a,b) long")(aggL.write.format("noop").mode("overwrite").save())
      // variant B: long weight + packed single-long pair key
      val aggP = expL
        .select(col("wu"), (shiftleft(col("a"), 32) + col("b")).as("ab"))
        .groupBy(col("ab"))
        .agg(count(lit(1)).as("common"), (sum(col("wu")) / 1000000.0).as("aa"))
      time(s"$it +groupBy(ab) packed")(aggP.write.format("noop").mode("overwrite").save())
      time(s"$it full query")(graft.Bench.forceEval(Graph.adamicAdar(spark, d)))
    }
    spark.stop()
  }
}
