package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Sequence packing and stratified sampling invariants the oracle's
  * hash compare can't express. */
class SamplingSpec extends SparkSpec {

  test("pack: every bin fills to the budget and overflows by at most one chunk") {
    val bins = Sampling.pack(spark, sf001)
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("chunk_tokens")).as("fill"), max(col("chunk_tokens")).as("maxc"),
        count(lit(1)).as("n"))
      .collect()
    val budget = 96L
    bins.foreach { r =>
      val (fill, maxc) = (r.getLong(2), r.getInt(3).toLong)
      // never exceeds budget + the one overflowing chunk
      assert(fill <= budget + maxc,
        s"bin ${r.getLong(0)}/${r.getLong(1)} fill=$fill maxc=$maxc")
    }
    // bins are contiguously numbered from 0 within each shard
    val byShard = bins.groupBy(_.getLong(0))
    byShard.foreach { case (shard, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head === 0L && ids.toSeq === (0L until ids.length).toSeq,
        s"shard $shard bins not contiguous: ${ids.toSeq}")
    }
    // conservation: every chunk appears exactly once
    val chunkCt = graft.operators.Chunking.chunk(spark, sf001).count()
    assert(Sampling.pack(spark, sf001).count() === chunkCt)
  }

  test("pack: bins below the final one are at least budget-full (greedy fill)") {
    val bins = Sampling.pack(spark, sf001)
      .groupBy(col("shard"), col("bin")).agg(sum(col("chunk_tokens")).as("fill"))
    val lastBin = bins.groupBy(col("shard")).agg(max(col("bin")).as("last"))
    val nonFinal = bins.join(lastBin, "shard").filter(col("bin") < col("last"))
    // a non-final bin closed because the next chunk crossed the budget
    assert(nonFinal.filter(col("fill") < 96L - 63L).count() === 0L)
  }

  test("stratified sample: deterministic, and rates land near the configured mix") {
    val a = Sampling.sampleStratified(spark, sf001).collect()
    val b = Sampling.sampleStratified(spark, sf001).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq) // bit-stable
    val total = Tables.documents(spark, sf001)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.sampleStratified(spark, sf001)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // upsampled sources keep ~80%, the rest ~25% (LCG is uniform-ish;
    // wide tolerance keeps the test robust at small sf)
    Seq("src0", "src1").foreach { s =>
      val rate = kept(s).toDouble / total(s)
      assert(rate > 0.6 && rate <= 1.0, s"$s rate=$rate")
    }
    (total.keySet -- Set("src0", "src1")).foreach { s =>
      val rate = kept.getOrElse(s, 0L).toDouble / total(s)
      assert(rate < 0.45, s"$s rate=$rate")
    }
  }

  test("weighted sample: deterministic, per-source bounded, and biased toward heavy docs") {
    val k = 10
    val a = Sampling.sampleWeighted(spark, sf001, k).collect()
    val b = Sampling.sampleWeighted(spark, sf001, k).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // bit-stable
    // no source exceeds k picks, ranks are 1..n without gaps
    a.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.length <= k)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length))
    }
    // weight bias: mean n_chars of the picked docs beats the corpus
    // mean (u/w priorities favor long docs; the LCG draw is fixed, so
    // this is a deterministic property of the data, not flaky)
    val pickedMean = a.map(_.getLong(3)).sum.toDouble / a.length
    val corpusMean = Tables.documents(spark, sf001)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(pickedMean > corpusMean,
      s"picked mean $pickedMean not above corpus mean $corpusMean")
  }
}
