package graft.tools

import org.apache.spark.sql.functions._

/** Bucket-occupancy diagnostic for the LSH kNN graph (r12): prints the
  * derived nbits, the bucket histogram's head, and the exact candidate
  * volume Σ probes×occupancy the bucket equi-join will produce — the
  * number that explains a scale-sweep reading before any profiling.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.KnnDiag"` */
object KnnDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.benchSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    graft.Graft.registerFunctions(spark)
    val c0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = c0.count()
    val nbits = math.min(24, math.max(4, (63 - java.lang.Long.numberOfLeadingZeros(n)) - 4))
    val c = c0.withColumn("bucket",
      call_function("graft_hyperplane_sig", col("v"), lit(24), lit(64), lit(11L))
        .bitwiseAND(lit((1L << nbits) - 1)))
    val occ = c.groupBy(col("bucket")).agg(count(lit(1)).as("occ")).cache()
    val hist = occ.orderBy(col("occ").desc).limit(12).collect()
    val nBuckets = occ.count()
    val sumSq = occ.agg(sum(col("occ") * col("occ"))).head().getLong(0)
    // candidates = sum over (1 + nbits) probe masks of the occupancy
    // of the probed bucket ~= (1 + nbits) * E[occ over Hamming<=1]
    println(s"[knndiag] n=$n nbits=$nbits buckets_used=$nBuckets " +
      s"(of ${1L << nbits}) sum_occ_sq=$sumSq " +
      s"candidates_same_bucket=${sumSq - n} " +
      s"top buckets: ${hist.map(r => r.getLong(1)).mkString(",")}")
    spark.stop()
  }
}
