package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr, to_json, xxhash64}
import org.apache.spark.sql.types.MapType

/** Single-query bench for iterating on one operator without the full
  * [[graft.Bench]] sweep: same session config, same cold-cache
  * median-of-3 protocol, same forced-evaluation sink.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchOne q1 q2"`. */
object BenchOne {
  private def forceEval(df: DataFrame): Unit = {
    val cols: Array[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => to_json(col(f.name))
        case _          => col(f.name)
      }
    }
    df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        forceEval(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name%s median ${times.sorted.apply(1)}%.3f s (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
