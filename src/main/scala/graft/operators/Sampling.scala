package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators: sequence packing and
  * deterministic stratified sampling — the two passes every
  * pretraining corpus goes through between preprocessing and the
  * dataloader. Both are formulated so the DuckDB oracle reproduces
  * them bit-for-bit (no engine-private RNG or hash). */
object Sampling {

  private val TokenBudget = 96 // tokens per packed sequence bin
  private val NumShards = 8

  /** Sequence packing: assign each chunk (from [[Chunking.chunk]]) to
    * a fixed-token-budget bin. Chunks shard by `doc_id % NumShards`
    * (shards pack independently — the parallel unit at 100 TB), and
    * within a shard the greedy contiguous fill is a running token sum:
    * a chunk's bin is `floor(exclusive_cumsum / budget)`, so bins fill
    * to the budget and overflow by at most one chunk — the standard
    * "pack sequential, never split a chunk" recipe, expressed as ONE
    * window pass (no per-bin state, no driver loop). */
  def pack(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Chunking.chunk(s, d)
      .withColumn("shard", col("doc_id") % NumShards)
      .withColumn("cum", sum(col("chunk_tokens")).over(w))
      .select(
        col("shard"), col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
        floor((col("cum") - col("chunk_tokens")) / TokenBudget).as("bin"))
      .orderBy(col("shard"), col("doc_id"), col("chunk_idx"))
  }

  // the oracle replays the chunker CTE (geometry interpolated from
  // Chunking's OWN constants, so a stride/size tune can't desync the
  // two sides) and the same window sum
  val packSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS chunk_idx,
       |    CAST(len(string_split(array_to_string(
       |      l[(i*${Chunking.Stride}+1):(i*${Chunking.Stride}+${Chunking.ChunkSize})], ' '), ' '))
       |      AS INTEGER) AS chunk_tokens
       |  FROM toks, (SELECT unnest(range(0, (
       |      SELECT 1 + max(len(list_filter(string_split(text,' '), t -> len(t) > 0)))
       |        // ${Chunking.Stride}
       |      FROM documents))) AS i) r
       |  WHERE len(l) > 0 AND i*${Chunking.Stride} < len(l))
       |SELECT shard, doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_tokens,
       |  CAST(floor((cum - chunk_tokens) / $TokenBudget.0) AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id % $NumShards AS shard, doc_id, chunk_idx, chunk_tokens,
       |    CAST(sum(chunk_tokens) OVER (PARTITION BY doc_id % $NumShards
       |      ORDER BY doc_id, chunk_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM chunks) t
       |ORDER BY shard, doc_id, chunk_idx""".stripMargin

  /** Deterministic stratified sampling — the data-mixing pass: keep
    * each document with a per-source rate (benchmark-ish sources
    * upsampled, the rest downsampled). The keep decision is a pure
    * arithmetic minstd LCG step on doc_id (`(id·48271) mod (2³¹−1)
    * mod 100 < rate`) — reproducible across engines, partitionings and
    * runs, unlike `rand(seed)`/`sampleBy`, whose draw depends on row
    * order within partitions. At 100 TB this is a stateless
    * scan-speed filter with no shuffle. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1"), 80).otherwise(25)
    val draw = pmod(col("doc_id") * 48271L, lit(2147483647L)) % 100
    Tables.documents(s, d)
      .filter(draw < rate)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, source, n_chars
      |FROM documents
      |WHERE (doc_id * 48271) % 2147483647 % 100
      |      < CASE WHEN source IN ('src0','src1') THEN 80 ELSE 25 END
      |ORDER BY doc_id""".stripMargin

  /** Deterministic WEIGHTED sampling without replacement — per-source
    * top-k by weighted priority (the quality-weighted data-mixing
    * pass: longer docs favored here; swap in any non-negative weight
    * column). Each doc draws u ∈ (0,1) from the same minstd LCG as
    * [[sampleStratified]] and gets priority key = u / weight; the k
    * smallest keys per source win. Efraimidis–Spirakis would use
    * u^(1/w) for exact inclusion probabilities, but pow/ln live in
    * libm, whose last-ulp results differ between engines (the
    * text_tfidf lesson) — and a selection boundary is exactly where an
    * ulp flips membership. The engine therefore ships the RATIONAL
    * priority: IEEE division of identical operands is bit-identical
    * everywhere, so the SELECTION (not just the distribution) is
    * reproducible across engines, partitionings and runs. The
    * stochastic ordering is preserved (larger weight ⇒ stochastically
    * smaller key); the spec pins determinism and the weight bias.
    * One window top-k per source — scan-speed, no corpus shuffle
    * beyond the per-source rank. */
  def sampleWeighted(s: SparkSession, d: String, k: Int = 40): DataFrame = {
    val u = (pmod(col("doc_id") * 48271L, lit(2147483647L)) + 1).cast("double") /
      lit(2147483648.0)
    val w = Window.partitionBy(col("source")).orderBy(col("key"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("key", u / col("n_chars").cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rnk"))
  }

  val sampleWeightedSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, source, n_chars,
      |    (CAST((doc_id * 48271) % 2147483647 + 1 AS DOUBLE) / 2147483648.0)
      |      / CAST(n_chars AS DOUBLE) AS key
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rnk
      |  FROM keyed)
      |SELECT source, rnk, doc_id, n_chars FROM ranked WHERE rnk <= 40
      |ORDER BY source, rnk""".stripMargin
}
