package graft.tools

import graft.{Graft, SparkEntry}
import graft.operators._

/** Runnable tour of the engine: one representative operator per
  * family, printed small. `sbt "runMain graft.tools.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session(master = "local[4]", shufflePartitions = 4, appName = "graft-demo")
    spark.sparkContext.setLogLevel("ERROR")
    Graft.registerViews(spark, d)

    def show(title: String, df: org.apache.spark.sql.DataFrame, n: Int = 5): Unit = {
      println(s"\n=== $title ===")
      df.show(n, truncate = 40)
    }

    show("DWS: province stats (windowed star-schema agg)", Dws.provinceStats(spark, d))
    show("DWM: bounce detection (batch CEP)", Dwm.userJump(spark, d))
    show("ADS: top trademarks", Ads.trademarkTopN(spark, d))
    show("Dedup: MinHash+LSH near-dup pairs", Dedup.minhashLsh(spark, d))
    show("Similarity: brute-force ANN top-k", Similarity.annBruteforce(spark, d))
    show("Text: quality scores", TextOps.quality(spark, d))
    show("Events: funnel", EventAnalytics.funnel(spark, d))
    show("As-of join: purchase ← last view", AsOfJoin.purchaseAsOfView(spark, d))
    show("SQL surface + native function",
      spark.sql("SELECT doc_id, graft_rolling_hash64(text) AS fp64 FROM documents LIMIT 5"))

    println(s"\n${SparkEntry.queries.size} operators registered; " +
      s"${SparkEntry.oracleSql.size} DuckDB-oracle-verified (see SURVEY.md §2)")
    spark.stop()
  }
}
