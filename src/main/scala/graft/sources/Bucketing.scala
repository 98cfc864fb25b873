package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table materialization: the co-located-join path (SURVEY
  * §4). Writing both fact tables bucketed by the join key means the
  * recurring orders⋈lineitem join (OrderWideApp's core) reads
  * pre-partitioned data and runs with NO shuffle exchange on either
  * side — at 100 TB that converts the dominant network cost of every
  * downstream job into a one-time write cost.
  */
object Bucketing {

  /** Materialize `df` as a bucketed table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With matching
    * bucket counts Spark plans a shuffle-free sort-merge join. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
