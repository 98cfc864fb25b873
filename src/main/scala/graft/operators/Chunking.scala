package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preprocessing operators: fixed-window document
  * chunking and PII scrubbing. Both are narrow single-pass transforms
  * (the chunker explodes in place — no shuffle until the output sort),
  * so they run at scan speed over a 100 TB corpus. */
object Chunking {

  private[graft] val ChunkSize = 64
  private[graft] val Stride = 32 // 50% overlap — the usual LLM-pretraining split

  /** Split each document into overlapping token windows. One chunk row
    * per (doc, window); short tails kept (truncated, never padded).
    * Tokens are materialized as a column FIRST: a transform lambda
    * slicing an expression subtree would re-tokenize the document per
    * window (see TextFunctions.shingles); slicing a bound attribute is
    * a row-field read. */
  def chunk(s: SparkSession, d: String): DataFrame = {
    val toks = col("toks")
    Tables.documentsSpread(s, d) // r14 guide 2.5: per-row tokenize + window slice
      .withColumn("toks", tokens(col("text")))
      .filter(size(toks) > 0)
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), ((size(toks) - 1) / Stride).cast("int")),
            i => concat_ws(" ", slice(toks, i * Stride + 1, lit(ChunkSize))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .withColumn("chunk_tokens", size(split(col("chunk"), " ")))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val chunkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS chunk_idx,
       |    array_to_string(l[(i*$Stride+1):(i*$Stride+$ChunkSize)], ' ') AS chunk
       |  FROM toks, (SELECT unnest(range(0, (
       |      SELECT 1 + max(len(list_filter(string_split(text,' '), t -> len(t) > 0))) // $Stride
       |      FROM documents))) AS i) r
       |  WHERE len(l) > 0 AND i*$Stride < len(l))
       |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk,
       |  CAST(len(string_split(chunk,' ')) AS INTEGER) AS chunk_tokens
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  /** PII scrub: mask number runs and email-shaped tokens — the
    * redaction pass a corpus gets before training. Pure regexp
    * (codegen'd), identical semantics in the oracle. */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d) // r14 guide 2.5: per-row regex rewrite
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
          "[0-9]+", "<NUM>").as("scrubbed"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).as("digits_masked"))
      .orderBy(col("doc_id"))

  val piiScrubSql: String =
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
      |    '[0-9]+', '<NUM>', 'g') AS scrubbed,
      |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS digits_masked
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus n-gram frequency table (LM preprocessing: vocabulary /
    * boilerplate statistics): top 3-grams by document frequency and
    * total occurrences. */
  def ngramFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("ngram"))
      // explicit two-level distinct instead of countDistinct: the
      // Expand-based distinct-agg plan doubles the exploded stream
      // before its shuffle; aggregating (ngram, doc) pairs first gets
      // map-side combine AND ships each pair once
      .groupBy(col("ngram"), col("doc_id")).agg(count(lit(1)).as("ct"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("ct")).as("total_ct"))
      .orderBy(col("doc_freq").desc, col("total_ct").desc, col("ngram"))
      .limit(100)

  val ngramFreqSql: String =
    """SELECT ngram, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_ct
      |FROM (
      |  SELECT doc_id,
      |    unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l)-1)]) AS ngram
      |  FROM (SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
      |        FROM documents)
      |  WHERE len(l) >= 3) t
      |GROUP BY ngram
      |ORDER BY doc_freq DESC, total_ct DESC, ngram
      |LIMIT 100""".stripMargin

  /** Benchmark decontamination: drop corpus documents whose normalized
    * fingerprint appears in a held-out "benchmark" set (sources
    * src0-src4 play the benchmark) — the anti-join every training
    * corpus goes through before release. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val benchFps = docs.filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct()
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .join(benchFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  // NOT EXISTS (not NOT IN): NULL fingerprints must behave like the
  // Spark side's left_anti join, where NULL never matches
  val decontaminateSql: String =
    """SELECT a.doc_id, a.source FROM documents a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents b
      |  WHERE b.source IN ('src0','src1','src2','src3','src4')
      |    AND md5(lower(trim(regexp_replace(b.text, '\s+', ' ', 'g'))))
      |      = md5(lower(trim(regexp_replace(a.text, '\s+', ' ', 'g')))))
      |ORDER BY a.doc_id""".stripMargin

  private val DecontamN = 8

  /** N-gram-overlap decontamination (the GPT-3 appendix-C / PaLM form,
    * Brown et al. 2020): a corpus doc is contaminated if it shares ANY
    * word 8-gram with the benchmark set — catching partial quotes and
    * splices the whole-document fingerprint anti-join misses. Shape:
    * per-doc distinct n-grams (in-row `array_distinct`, no global
    * distinct shuffle) semi-join the benchmark gram set, contaminated
    * ids anti-join back. The gram set is the big side and stays
    * distributed; at 100 TB the semi-join keys on the gram string and
    * every stage is partial-aggregable. Benchmark docs drop themselves
    * (their grams are in the set) — EXCEPT docs too short to carry one
    * n-gram, which contribute nothing and survive, identically in both
    * engines. */
  def decontaminateNgram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def grams(df: DataFrame) =
      df.select(col("doc_id"), col("source"),
        explode(array_distinct(shingles(col("text"), DecontamN))).as("g"))
    val benchGrams = grams(docs.filter(col("source").isin(BenchSources: _*)))
      .select(col("g")).distinct()
    val contaminated = grams(docs).join(benchGrams, "g").select(col("doc_id")).distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val BenchSources = Seq("src0", "src1", "src2", "src3", "src4")

  val decontaminateNgramSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source,
       |    unnest([array_to_string(l[i:i+${DecontamN - 1}], ' ')
       |            for i in range(1, len(l) - ${DecontamN - 2})]) AS g
       |  FROM toks WHERE len(l) >= $DecontamN),
       |bench AS (SELECT DISTINCT g FROM grams
       |          WHERE source IN ('src0','src1','src2','src3','src4')),
       |bad AS (SELECT DISTINCT doc_id FROM grams JOIN bench USING (g))
       |SELECT a.doc_id, a.source FROM documents a
       |WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = a.doc_id)
       |ORDER BY a.doc_id""".stripMargin
}
