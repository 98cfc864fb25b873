package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` — the LLM-pipeline extension of
  * the reference's keyed-state dedup (UniqueVisitApp). Five levels:
  * exact, n-gram Jaccard (exact pairwise over an inverted index),
  * MinHash+LSH (the 100 TB path), SimHash, and embedding-cosine.
  *
  * Scale notes: nothing here compares all O(n²) pairs. The exact
  * Jaccard op builds an inverted index (shingle → docs) and only joins
  * docs sharing a shingle; MinHash/SimHash/embedding ops bucket by
  * band key first, so shuffle volume is O(n · bands), and the exact
  * verification runs only on bucket-collision candidates.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest
    * doc_id as survivor. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("dup_ct"))
      .select(col("survivor_id"), col("dup_ct"))
      .orderBy(col("survivor_id"))

  val exactSql: String =
    """SELECT min(doc_id) AS survivor_id, count(*) AS dup_ct
      |FROM documents
      |GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |ORDER BY survivor_id""".stripMargin

  /** Distinct 3-gram shingles per doc (the inverted-index rows).
    * Dedup happens IN-ROW via `array_distinct` before the explode —
    * (doc_id, shingle) is then unique by construction, so no global
    * `.distinct()` shuffle is ever paid (measured 4.3 s of the old
    * Jaccard cost at sf0.1; at 100 TB it's a full extra pass). */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("text"), 3))).as("shingle"))

  private def shingleRows(s: SparkSession, d: String): DataFrame =
    shingleRows(Tables.documents(s, d))

  /** Document frequency above which a shingle's inverted-index bucket
    * is "hot": a bucket of n docs emits n(n−1)/2 candidate pairs under
    * the naive self-join, so buckets are capped at HotDf docs (≤ ~32k
    * pairs each) and hot shingles take the prefix-filtered path. */
  private val HotDf = 256L

  /** Exact n-gram Jaccard near-dup pairs:
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ 0.5 — the ground truth the
    * probabilistic ops are judged against.
    *
    * SKEW-ADAPTIVE candidate generation, entirely in-plan (no driver
    * measurement): shingles with document frequency ≤ [[HotDf]] use
    * the naive inverted-index self-join (bucket size bounded by the
    * cap, so no quadratic blowup is possible), while hot shingles —
    * web boilerplate shared by millions of docs — go through a
    * PPJoin-style prefix filter computed ONLY over the docs that
    * contain at least one hot shingle. Exactness: a qualifying pair
    * either shares a rare shingle (caught by the capped index) or
    * shares only hot shingles — and then the globally rarest shared
    * shingle provably sits in BOTH docs' prefixes (the PPJoin prefix
    * theorem), so the hot-prefix join catches it. On a df-uniform
    * corpus the hot side is empty and the extra window passes see zero
    * rows; on a skewed corpus every bucket stays bounded. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardDocs(Tables.documents(s, d))

  /** NO cache on the tagged shingle table: its four consumers share
    * the shuffle via ReuseExchange (shuffle files persist for the
    * job), and measured cold at sf0.1 the recompute plan beats cache
    * materialization (3.9 s vs 4.2-8.6 s) while pinning nothing in
    * executor memory for the session. */
  def ngramJaccardDocs(docs: DataFrame, hotDf: Long = HotDf): DataFrame = {
    val t = 0.5
    // per-doc shingle SETS built in-row: sizes need no groupBy, and the
    // exploded (doc_id, shingle) stream is duplicate-free without a
    // distinct shuffle
    val withSets = docs
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("set"))
    val sizes = withSets.select(col("doc_id"), size(col("set")).as("sz"))
    val sh = withSets.select(col("doc_id"), explode(col("set")).as("shingle"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val tagged = sh.join(dfreq, "shingle")

    // rare path: the capped inverted-index self-join output IS the
    // intersection stream — one row per shared rare shingle — so the
    // per-pair rare-intersection count falls straight out of a groupBy.
    // (The old shape re-joined candidate pairs against the shingle
    // table to re-count what this join had already enumerated —
    // measured as the dominant cost at sf0.1.)
    val rare = tagged.filter(col("df") <= hotDf).select(col("doc_id"), col("shingle"))
    val cRare = rare.as("a")
      .join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c_r"))

    // hot path: prefix rows over ONLY the docs touching a hot shingle
    // (a hot-only pair has both members here); window input is empty
    // when the corpus has no hot shingles
    val hotRows = tagged.filter(col("df") > hotDf)
    val hotDocs = hotRows.select(col("doc_id")).distinct()
    val ranked = tagged.join(hotDocs, "doc_id")
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), xxhash64(col("shingle")))))
    val hotPairs = ranked
      .filter(col("rn") <= col("sz") - ceil(col("sz") * t) + 1 && col("df") > hotDf)
      .select(col("doc_id"), col("shingle"))
      .as("a").join(
        ranked.filter(col("rn") <= col("sz") - ceil(col("sz") * t) + 1 &&
          col("df") > hotDf).select(col("doc_id"), col("shingle")).as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    // hot-intersection counts, computed only for pairs that CAN share
    // a hot shingle (both ends in hotDocs): rare-path pairs restricted
    // to hot docs ∪ the prefix-caught hot-only pairs. On a df-uniform
    // corpus hotDocs is empty and this whole branch is zero rows.
    val hotPairKeys = cRare.select(col("i"), col("j"))
      .join(hotDocs.select(col("doc_id").as("i")), "i", "left_semi")
      .join(hotDocs.select(col("doc_id").as("j")), "j", "left_semi")
      .select(col("i"), col("j"))
      .unionAll(hotPairs)
      .distinct()
    val cHot = hotPairKeys
      .join(hotRows.select(col("doc_id").as("i"), col("shingle").as("s_i")), "i")
      .join(hotRows.select(col("doc_id").as("j"), col("shingle").as("s_j")), "j")
      .filter(col("s_i") === col("s_j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("c_h"))

    // every shared shingle is counted exactly once: rare ones by the
    // rare self-join, hot ones by the hot branch
    cRare.join(cHot, Seq("i", "j"), "full_outer")
      .withColumn("c", coalesce(col("c_r"), lit(0L)) + coalesce(col("c_h"), lit(0L)))
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("sz_i")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("sz_j")), "j")
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("sz_i") + col("sz_j") - col("c"))).as("jac"))
      .filter(col("jac") >= t)
      .orderBy(col("i"), col("j"))
  }

  /** The uncapped naive inverted index (every shared shingle joins).
    * Fastest on df-uniform shingles; quadratic hot buckets on skewed
    * corpora — kept as the A/B baseline the adaptive default is
    * spec-checked against. */
  def ngramJaccardNaive(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("i"), col("j"))
  }

  /** PREFIX-FILTERED exact Jaccard (PPJoin-style): two sets with
    * J ≥ t must share an element among each set's first
    * |X| − ⌈t·|X|⌉ + 1 shingles in a global rarity order, so only
    * those prefixes are indexed. Decisive when shingle document
    * frequency is SKEWED (web-scale corpora: boilerplate n-grams
    * shared by millions of docs): frequent shingles sort to the back
    * of every doc and never enter the index, eliminating the naive
    * index's quadratic hot buckets. Identical output to
    * [[ngramJaccard]] (spec-checked); costs two extra window passes,
    * so on df-uniform data the naive index is faster. */
  def ngramJaccardPrefix(s: SparkSession, d: String): DataFrame = {
    val t = 0.5
    val sh = shingleRows(s, d).cache()
    // global rarity order: (document frequency, hash) — no global rank
    // materialization (that would need a single-partition window)
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), xxhash64(col("shingle")))))
    val prefix = ranked.filter(col("rn") <= col("sz") - ceil(col("sz") * t) + 1)
      .select(col("doc_id"), col("shingle"))
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    verifyJaccard(sh, candidates)
  }

  val ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2] for i in range(1, len(l)-1)]) AS shingle
      |       FROM toks WHERE len(l) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT i, j, CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) AS jac
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = i
      |JOIN sizes sb ON sb.doc_id = j
      |WHERE CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) >= 0.5
      |ORDER BY i, j""".stripMargin

  // ---- MinHash + LSH ------------------------------------------------

  // banding geometry lives on MinHashSig (shared with the fused
  // MinHashBands expression) — aliased here so the column formulation
  // and the SQL oracle read the same constants
  private val NumHashes = graft.functions.MinHashSig.NumHashes
  private val BandRows = graft.functions.MinHashSig.BandRows
  private val NumBands = graft.functions.MinHashSig.NumBands // 32 → s-curve threshold ≈ 0.42
  private val Prime = graft.functions.MinHashSig.Prime // 2^31 - 1, universal-hash modulus

  /** MinHash signature + banded LSH: candidate pairs from band-bucket
    * collisions, then exact Jaccard verification on candidates only.
    * Per-doc work is 128 universal hashes of one xxhash64 base — all
    * codegen'd column arithmetic, no UDF. Output matches
    * `ngramJaccard` when the signature recalls every ≥0.5 pair (the
    * spec asserts this on the planted dups). */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    // canonical coefficient draw shared with the native expression —
    // graft.functions.MinHashSig is the single source, so the two
    // formulations produce bit-identical signatures
    val abs = graft.functions.MinHashSig.coeffA
      .zip(graft.functions.MinHashSig.coeffB).toSeq

    // the signature pass reads the RAW shingle stream (min() is
    // idempotent under duplicates, so the distinct's shuffle would be
    // pure cost); only the exact-verify pass needs distinct sets
    val rawShingles = Tables.documentsSpread(s, d) // r14 guide 2.5: parallel shingle fan-out
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("shingle"))
    val base = pmod(xxhash64(col("shingle")), lit(Prime))
    val hashed = rawShingles.select(
      col("doc_id") +: abs.zipWithIndex.map { case ((a, b), i) =>
        pmod(lit(a) * base + lit(b), lit(Prime)).as(s"h$i")
      }: _*)
    val sig = hashed.groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"),
        (1 until NumHashes).map(i => min(col(s"h$i")).as(s"m$i")): _*)

    // one (doc, band, key) row per band via posexplode — a single
    // signature computation fans out to all bands (no plan duplication).
    // The sentinel-band filter is a no-op here (explode already dropped
    // empty docs) EXCEPT on a 2⁻⁶⁴ xxhash64 collision — applied so the
    // column, native, and oracle formulations drop the same rows even
    // then (bit-identical by construction, not by probability).
    val bandRows = sig.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map { b =>
        xxhash64((b * BandRows until (b + 1) * BandRows).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band", "bk")))
      .filter(col("bk") =!= lit(graft.functions.MinHashSig.SentinelBand))
    // bucket equi-join: shuffle on (band, key), never all-pairs; the
    // identical x/y subplans share one shuffle via ReuseExchange
    val candidates = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()

    verifyJaccardSets(Tables.documentsSpread(s, d), candidates) // r14: parallel set build
  }

  /** MinHash+LSH over the NATIVE fused expression
    * (`graft.functions.MinHashBands`): signature AND band keys become
    * one narrow per-row projection — three tight codegen'd loops over
    * the in-row shingle array — instead of the column formulation's
    * explode + 128-column min-aggregate + 32-way xxhash64 projection,
    * deleting the (doc × shingle) signature shuffle entirely.
    * Coefficients are the same canonical draw, the band keys fold the
    * same longs, so candidates, verification, and output are identical
    * to [[minhashLsh]] (spec-checked pair for pair); only the plan
    * shape differs. The bucket join is HINTED to a shuffled hash join:
    * left to itself the planner broadcasts one side (the band index is
    * tiny), and a broadcast build has no exchange for ReuseExchange to
    * dedupe — the whole scan→shingle→signature subplan would run twice
    * (measured +0.8 s at sf0.1, and 2× the scan at 100 TB). With the
    * hint both sides shuffle on (band, bk), the two exchanges
    * canonicalize equal, and the index is computed exactly once. */
  def minhashLshNative(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerFunctions(s)
    val bandRows = bandIndex(Tables.documents(s, d).select(col("doc_id"), col("text")))
    val candidates = bandRows.as("x")
      .join(bandRows.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    verifyJaccardSets(Tables.documents(s, d), candidates)
  }

  /** (doc, band, bucket-key) index rows from any (doc_id, text, …)
    * frame — the native-signature banding stage shared by the batch
    * LSH op and the streaming near-dup gate (identical hash draw on
    * both sides is what makes a stream row land in the same bucket as
    * its corpus twin). Extra input columns (e.g. the stream's event
    * time) ride through untouched; `text` is consumed into the
    * signature. Works unchanged on streaming frames: signature and
    * band fan-out are narrow per-row projections. */
  def bandIndex(docs: DataFrame): DataFrame = {
    // fused signature→bands expression, then the empty-doc filter on
    // the GENERATED bk column. A doc-level pre-filter (the old
    // `size(sh) > 0`) gets predicate-pushed through the projection and
    // re-inlines the entire shingle pipeline into the Filter node —
    // every row paid the split/zip/concat twice (measured ~2× the
    // banding stage at sf0.1). A filter on the posexplode output can't
    // push below the Generate, so shingles + signature run exactly
    // once; empty docs emit the constant sentinel band in every slot
    // and drop here, which is "≥1 shingle participates" up to an
    // xxhash64 collision that the oracle's matching literal filter
    // reproduces exactly.
    val bands = docs
      .withColumn("bands",
        call_function("graft_minhash_bands", shingles(col("text"), 3)))
      .drop("text")
    val keep = bands.columns.filter(_ != "bands").map(col)
    bands.select((keep :+ posexplode(col("bands")).as(Seq("band", "bk"))): _*)
      .filter(col("bk") =!= lit(graft.functions.MinHashSig.SentinelBand))
  }

  /** Exact Jaccard restricted to candidate (i, j) pairs. */
  private def verifyJaccard(sh: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    candidates.as("c")
      .join(sh.as("a"), col("c.i") === col("a.doc_id"))
      .join(sh.as("b"), col("c.j") === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("i"), col("j"))
  }

  /** Exact Jaccard over candidate (i, j) pairs via per-doc SHINGLE
    * SETS (`array_distinct`, a narrow projection) instead of the
    * exploded shingle stream: `|A∩B|` is one in-row `array_intersect`
    * per candidate pair, so the verify stage needs no (doc × shingle)
    * aggregation at all. Used by both MinHash variants — the old
    * row-stream verify re-derived the shingle pipeline FOUR times
    * (a-side join, b-side join, and two size aggregates; each a full
    * document re-scan). Here the sets projection appears twice but
    * behind identical shuffle-hash exchanges on doc_id, which
    * ReuseExchange collapses to one — documents are scanned and
    * shingled exactly once. Same math as [[verifyJaccard]]:
    * |A∩B| / (|A| + |B| − |A∩B|) over distinct shingles. */
  private def verifyJaccardSets(docs: DataFrame, candidates: DataFrame): DataFrame = {
    val sets = docs.select(
      col("doc_id"), array_distinct(shingles(col("text"), 3)).as("set"))
    candidates.as("c")
      .join(sets.as("a").hint("shuffle_hash"), col("c.i") === col("a.doc_id"))
      .join(sets.as("b").hint("shuffle_hash"), col("c.j") === col("b.doc_id"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        size(array_intersect(col("a.set"), col("b.set"))).cast("long").as("inter"),
        (size(col("a.set")).cast("long") + size(col("b.set"))).as("tot"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") / (col("tot") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("i"), col("j"))
  }

  /** Generated DuckDB oracle shared by [[minhashLsh]] and
    * [[minhashLshNative]] (byte-identical outputs by construction —
    * same canonical coefficient draw, same band-key hash): the FULL
    * pipeline replays in SQL — per-shingle `xxhash64` via
    * [[SqlHash.xxh64String]], the 128 universal hashes against the
    * embedded [[graft.functions.MinHashSig]] coefficient literals,
    * per-doc minima, the 4-long `xxhash64` band-key CHAIN as four
    * sequential CTE stages (one [[SqlHash.hashLong]] each — DuckDB's
    * binder recursion cap forbids chaining them in one expression),
    * band-bucket candidates, and the exact-Jaccard verify. */
  val minhashLshSql: String = {
    import SqlHash._
    val al = graft.functions.MinHashSig.coeffA.mkString("[", ",", "]")
    val bl = graft.functions.MinHashSig.coeffB.mkString("[", ",", "]")
    def bandStage(k: Int): String = {
      val lane = bind(s"ln$k",
        s"CAST(sg[$BandRows*band+${k + 1}] AS HUGEINT)",
        hashLong(s"ln$k", "h", s"s$k"))
      s"br${k + 1} AS (SELECT doc_id, band, sg, $lane AS h FROM br$k)"
    }
    s"""WITH al AS (SELECT $al::BIGINT[] AS a, $bl::BIGINT[] AS b),
       |toks AS (
       |  SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
       |      [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)]
       |    ELSE [] END AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
       |        FROM documents)),
       |raw AS (SELECT doc_id, unnest(sh) AS shingle FROM toks),
       |base AS (
       |  SELECT doc_id, ((hs % $Prime) + $Prime) % $Prime AS base
       |  FROM (SELECT doc_id, [${xxh64String("g")} for g in [shingle]][1] AS hs FROM raw)),
       |hashes AS (
       |  SELECT doc_id, i, (a[i+1] * base + b[i+1]) % $Prime AS h
       |  FROM base, al, (SELECT unnest(range(0, $NumHashes)) AS i) r),
       |sig AS (
       |  SELECT doc_id, list(mh ORDER BY i) AS sg
       |  FROM (SELECT doc_id, i, min(h) AS mh FROM hashes GROUP BY doc_id, i)
       |  GROUP BY doc_id),
       |br0 AS (
       |  SELECT doc_id, band, sg, 42::HUGEINT AS h
       |  FROM sig, (SELECT unnest(range(0, $NumBands)) AS band) r),
       |${(0 until BandRows).map(bandStage).mkString(",\n")},
       |bandrows AS (
       |  SELECT doc_id, band, ${toSigned("h")} AS bk FROM br$BandRows
       |  WHERE ${toSigned("h")} <> ${graft.functions.MinHashSig.SentinelBand}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
       |  FROM bandrows x JOIN bandrows y
       |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |dsh AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.i, c.j, count(*) AS c
       |  FROM cand c JOIN dsh a ON c.i = a.doc_id
       |  JOIN dsh b2 ON c.j = b2.doc_id AND a.shingle = b2.shingle
       |  GROUP BY 1, 2)
       |SELECT i, j, CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) AS jac
       |FROM inter JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
       |WHERE CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) >= 0.5
       |ORDER BY i, j""".stripMargin
  }

  // ---- SimHash ------------------------------------------------------

  /** 64-bit SimHash per doc + 16-bit-band candidate generation +
    * Hamming-distance filter. Hashed over the RAW 3-gram shingle
    * stream — the classic frequency-weighted SimHash (unigram bags
    * collide too easily on a small vocabulary). The 64 bit-tallies are
    * deliberately 64 codegen'd sum columns, NOT the native SimHashAgg
    * object aggregate: measured at sf0.1 the codegen formulation is
    * ~4× faster because TypedImperativeAggregate evaluates its child
    * interpreted and sits outside whole-stage codegen (SimHashAgg
    * stays registered for the SQL API; SimHashAggSpec proves the two
    * agree). Pairs agree on ≥1 of 4 bands, Hamming ≤ 3. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val sim = simhashSigs(s, d)
    val bandRows = sim.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bk")))
    val pairs = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        col("x.simhash").as("sh_i"), col("y.simhash").as("sh_j"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_i").bitwiseXOR(col("sh_j"))))
      .filter(col("hamming") <= 3)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** The 64-bit SimHash signature table (doc_id, simhash) shared by
    * [[simhash]] and [[simhashWide]]: frequency-weighted bit votes
    * over the raw 3-gram shingle stream as 64 codegen'd sum columns
    * (see [[simhash]]'s doc for the measured 4× over the native
    * aggregate). */
  private def simhashSigs(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documentsSpread(s, d) // r14 guide 2.5: parallel shingle+bit-sum pass
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("tok"))
    val h = xxhash64(col("tok"))
    val bitSums = toks.groupBy(col("doc_id"))
      .agg(
        sum(when(h.bitwiseAND(lit(1L)) =!= 0, 1).otherwise(-1)).as("s0"),
        (1 until 64).map(i =>
          sum(when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, 1).otherwise(-1)).as(s"s$i")): _*)
    bitSums.select(
      col("doc_id"),
      (0 until 64).map(i =>
        when(col(s"s$i") > 0, lit(1L) * lit(1L << i)).otherwise(lit(0L)).as(s"bit$i")
      ).reduce(_ + _).as("simhash"))
  }

  /** Block widths of [[simhashWide]]'s 6-way fingerprint split
    * (Σ = 64); block b starts at bit offset Σ widths(0..b-1). */
  private[graft] val WideBlockWidths: Array[Int] = Array(11, 11, 11, 11, 10, 10)

  /** Candidate diagnostics of the two banding schemes: per scheme,
    * (DISTINCT candidate pairs, FALSE candidates among them — pairs
    * the Hamming ≤ 3 filter then discards). Both schemes catch every
    * true pair (pigeonhole), so the schemes differ ONLY in the false
    * column — narrow's grows ~4·n²/2¹⁶, wide's ~20·n²/2³² — which is
    * what the make_scale.py 2×/5× table reads. */
  private[graft] def simhashCandidateCounts(
      s: SparkSession, d: String): (Long, Long, Long, Long) = {
    val sim = simhashSigs(s, d).cache()
    def diag(bandRows: DataFrame): (Long, Long) = {
      val pairs = bandRows.as("x")
        .join(bandRows.as("y"),
          col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
          col("x.simhash").as("sh_i"), col("y.simhash").as("sh_j"))
        .distinct()
      val r = pairs.agg(count(lit(1)).as("cand"),
        sum(when(bit_count(col("sh_i").bitwiseXOR(col("sh_j"))) > 3, 1L)
          .otherwise(0L)).as("falsec")).head()
      (r.getLong(0), r.getLong(1))
    }
    val narrow = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bk")))
    val offsets = WideBlockWidths.scanLeft(0)(_ + _)
    def block(b: Int): Column =
      shiftright(col("simhash"), offsets(b))
        .bitwiseAND(lit((1L << WideBlockWidths(b)) - 1))
    val keys = (0 until WideBlockWidths.length).combinations(3).toSeq.map { ss =>
      val Seq(a, b, c) = ss
      block(a) +
        block(b) * lit(1L << WideBlockWidths(a)) +
        block(c) * lit(1L << (WideBlockWidths(a) + WideBlockWidths(b)))
    }
    val wide = sim.select(col("doc_id"), col("simhash"),
      posexplode(array(keys: _*)).as(Seq("band", "bk")))
    val (nc, nf) = diag(narrow)
    val (wc, wf) = diag(wide)
    sim.unpersist()
    (nc, nf, wc, wf)
  }

  /** [[simhash]]'s 100× SCALE TWIN — the Manku/Jain/Sarma WWW'07
    * wide-key banding (reference analog: same candidate semantics as
    * dedup_simhash). The narrow form's 4 × 16-bit bands stop scaling:
    * 65,536 buckets per band means candidate pairs grow ~n²/2¹⁶ no
    * matter how the corpus spreads. Here the fingerprint splits into
    * SIX blocks (11/11/11/11/10/10 bits) and every band key is the
    * concatenation of a 3-block COMBINATION — C(6,3) = 20 bands of
    * ~32-bit keys, so random-regime bucket occupancy is n/2³², and
    * candidate volume stays near-linear until corpora reach billions
    * of docs (then: widen to 4-block keys, same construction).
    *
    * EXACTNESS: both schemes emit exactly {(i, j) : Hamming(shᵢ, shⱼ)
    * ≤ 3} — pigeonhole: ≤ 3 flipped bits dirty ≤ 3 blocks, so ≥ 3 of
    * 6 blocks are clean and the band keyed on that clean 3-subset
    * matches (narrow: ≥ 1 of 4 blocks clean). The post-filter then
    * keeps Hamming ≤ 3 only, so the candidate scheme affects COST,
    * never output — the twin shares [[simhashSql]] verbatim (the
    * `_chunked` convention). Fan-out is ONE posexplode of the 20
    * literal key expressions (the shingles lesson); the pair join is
    * an equi-join on (band, key). */
  def simhashWide(s: SparkSession, d: String): DataFrame = {
    val sim = simhashSigs(s, d)
    val offsets = WideBlockWidths.scanLeft(0)(_ + _)
    def block(b: Int): Column =
      shiftright(col("simhash"), offsets(b))
        .bitwiseAND(lit((1L << WideBlockWidths(b)) - 1))
    // key = blk(a) ++ blk(b) ++ blk(c), packed little-endian by width
    val keys = (0 until WideBlockWidths.length).combinations(3).toSeq.map {
      ss =>
        val Seq(a, b, c) = ss
        block(a) +
          block(b) * lit(1L << WideBlockWidths(a)) +
          block(c) * lit(1L << (WideBlockWidths(a) + WideBlockWidths(b)))
    }
    val bandRows = sim.select(
      col("doc_id"), col("simhash"),
      posexplode(array(keys: _*)).as(Seq("band", "bk")))
    val pairs = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        col("x.simhash").as("sh_i"), col("y.simhash").as("sh_j"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_i").bitwiseXOR(col("sh_j"))))
      .filter(col("hamming") <= 3)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** Generated DuckDB oracle for [[simhash]] (r7 promotion): the
    * per-shingle `xxhash64` replays via [[SqlHash.xxh64String]], bit
    * votes extract from the UNSIGNED hash (`(hu // 2^i) % 2` — exact
    * HUGEINT arithmetic, no engine-specific shift semantics), the
    * 64-bit fingerprint reassembles unsigned then wraps to the signed
    * BIGINT Spark sums to, and banding/Hamming replay directly
    * (`bit_count(xor(...))` agrees on the signed bit patterns). */
  val simhashSql: String = {
    import SqlHash._
    val bits = (0 until 64).map(i =>
      s"sum(CASE WHEN (hu // ${BigInt(1) << i}::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val simu = (0 until 64).map(i =>
      s"CASE WHEN s$i > 0 THEN ${BigInt(1) << i}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    val bandDiv = "CASE b WHEN 0 THEN 1::HUGEINT WHEN 1 THEN 65536::HUGEINT " +
      "WHEN 2 THEN 4294967296::HUGEINT ELSE 281474976710656::HUGEINT END"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(tk) >= 3 THEN
       |      [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)]
       |    ELSE [] END) AS tok
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
       |        FROM documents)),
       |h AS (
       |  SELECT doc_id, ${toUnsigned("hs")} AS hu
       |  FROM (SELECT doc_id, [${xxh64String("g")} for g in [tok]][1] AS hs FROM toks)),
       |bitsums AS (
       |  SELECT doc_id,
       |    $bits
       |  FROM h GROUP BY doc_id),
       |sim AS (
       |  SELECT doc_id, CAST(su AS HUGEINT) AS shu, ${toSigned("su")} AS sh
       |  FROM (SELECT doc_id, CAST($simu AS HUGEINT) AS su FROM bitsums)),
       |bands AS (
       |  SELECT doc_id, sh,
       |    b, CAST((shu // ($bandDiv)) % 65536::HUGEINT AS BIGINT) AS bk
       |  FROM sim, (SELECT unnest(range(0, 4)) AS b) r),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j, x.sh AS shi, y.sh AS shj
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
       |SELECT i, j, CAST(bit_count(xor(shi, shj)) AS INTEGER) AS hamming
       |FROM pairs WHERE bit_count(xor(shi, shj)) <= 3
       |ORDER BY i, j""".stripMargin
  }

  // ---- Embedding cosine ---------------------------------------------

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH buckets
    * + exact cosine on candidates. Hyperplanes are seeded-PRNG literal
    * arrays baked into the plan; ONE native codegen'd pass
    * (graft.functions.HyperplaneSig) computes all 64 sign bits packed
    * in a LONG, and table t's key is its `w`-bit slice of the sig.
    *
    * The table WIDTH is derived in-plan from the corpus size (r12 —
    * the knnGraphLsh derived-nbits recipe applied to the banding):
    * w = clamp(⌊log₂ n⌋ − 3, 8, 16) bits, nTables = 64 div w. The r12
    * 10×-independent sweep caught the fixed 8×8 layout going
    * QUADRATIC: with 2⁸ buckets per table, random same-bucket
    * collisions grow n²/256 and dominated at n = 20 000 (28× at 10×
    * data, warm). Derived width keeps expected occupancy ≤ 2⁴ per
    * bucket to n = 2¹⁹ (candidates ~16·n·nTables = linear); past the
    * 16-bit cap a second sig long is the next lever. Fewer, wider
    * tables trade recall exactly as LSH theory prices it (p^w per
    * table, 1−(1−p^w)^nTables overall — ~99 % → ~84 % for cos≈0.95
    * pairs at the 10× point); the verify stage stays exact, so
    * precision is untouched. At every gate SF (n ≤ 4095) the clamp
    * floors at w = 8, nTables = 8 — bit-identical to the fixed layout,
    * so oracle outputs and specs are unchanged there; the whole
    * derivation (count → w → slice keys) replays in the DuckDB oracle.
    *
    * The arithmetic shiftright's sign extension is masked off by the
    * & (2^w − 1), so the table covering sign bit 63 keys identically
    * to the bits[t·w+b]·(1<<b) sum the oracle computes. */
  def embeddingNearDup(s: SparkSession, d: String, threshold: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    graft.Graft.registerFunctions(s)
    // derived band geometry: one bounded count → a 1-row broadcast
    val nb = emb.agg(count(lit(1)).as("n"))
      .select(Hyperplanes.derivedWidth(col("n")).as("w"))
      .withColumn("ntab", expr("CAST(64 div w AS INT)"))
    val sig = call_function("graft_hyperplane_sig",
      col("v"), lit(64), lit(64), lit(7L))
    val sketched = emb.crossJoin(broadcast(nb)).withColumn("sig", sig)

    // candidates as bare (i, j) ids first; vectors re-joined after the
    // distinct so the wide arrays never go through the dedup shuffle.
    // ONE posexplode over the max 8 table slots, cut at ntab (the
    // knnGraphLsh mask-fanout recipe — never a unionAll per table)
    val bandRows = sketched
      .select(col("vec_id"), col("w"), col("ntab"), col("sig"),
        posexplode(array((0 until 8).map(i => lit(i)): _*)).as(Seq("pos", "tbl")))
      .filter(col("tbl") < col("ntab"))
      .select(col("vec_id"), col("tbl"),
        expr("shiftright(sig, tbl * w) & (shiftleft(CAST(1 AS BIGINT), w) - 1)")
          .as("bk"))
    val pairs = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bk") === col("y.bk") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"))
      .distinct()
      .join(emb.select(col("vec_id").as("i"), col("v").as("vi")), "i")
      .join(emb.select(col("vec_id").as("j"), col("v").as("vj")), "j")

    // native codegen'd dot (same fold order as the zip_with form it
    // replaces — see Similarity.dot): the candidate set is pairwise,
    // so the interpreter cost of a higher-order fold would multiply
    graft.Graft.registerFunctions(s)
    val dot = call_function("graft_dot", col("vi"), col("vj"))
    val ni = sqrt(call_function("graft_dot", col("vi"), col("vi")))
    val nj = sqrt(call_function("graft_dot", col("vj"), col("vj")))
    pairs
      .withColumn("cosine", dot / (ni * nj))
      .filter(col("cosine") >= threshold)
      .select(col("i"), col("j"), col("cosine"))
      .orderBy(col("i"), col("j"))
  }

  /** Generated DuckDB oracle for [[embeddingNearDup]] (r7 promotion;
    * r12: the derived band geometry replays too): the 64 seeded
    * hyperplanes embed as ONE literal, each vector's 64 sign bits
    * replay exactly ([[Hyperplanes.sqlBucket]] note), w and nTables
    * recompute from the same count via the integer bit-length, the
    * per-table key is the bit-array sum over its w-bit slice (the
    * packed-sig slice on the engine side — HyperplaneSigSpec pins the
    * equivalence), and the band equi-join and cosine≥0.4 verify replay
    * directly — `graft_dot` and `list_dot_product` share the same
    * ascending-index fold. */
  val embeddingNearDupSql: String = {
    val pl = Hyperplanes.make(64, dim = 64, seed = 7)
    s"""WITH pls AS (SELECT ${Hyperplanes.sqlLit(pl)} AS pl),
       |nb AS (SELECT least(16, greatest(8, length(bin(count(*))) - 1 - 3)) AS w,
       |         64 // least(16, greatest(8, length(bin(count(*))) - 1 - 3)) AS ntab
       |       FROM embeddings),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        [CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), pl[i+1]) >= 0
       |           THEN 1 ELSE 0 END for i in range(0,64)] AS bits
       |      FROM embeddings, pls),
       |bands AS (SELECT vec_id, t,
       |    list_sum([bits[t*w+b+1]*(1::BIGINT<<b) for b in range(0, w)]) AS bk
       |  FROM c, nb, (SELECT unnest(range(0,8)) AS t) r WHERE t < ntab),
       |pairs AS (SELECT DISTINCT x.vec_id AS i, y.vec_id AS j
       |  FROM bands x JOIN bands y
       |    ON x.t = y.t AND x.bk = y.bk AND x.vec_id < y.vec_id),
       |sc AS (SELECT i, j,
       |    list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
       |  FROM pairs JOIN c a ON a.vec_id = i JOIN c b ON b.vec_id = j)
       |SELECT i, j, cosine FROM sc WHERE cosine >= 0.4
       |ORDER BY i, j""".stripMargin
  }

  private val SharedN = 8

  /** Cross-document duplicated-n-gram fraction — the corpus-level
    * near-dup DIAGNOSTIC (RefinedWeb/FineWeb report it per dump;
    * `text_repetition` is its within-doc sibling): for every doc, the
    * fraction of its distinct word 8-grams that also occur in at least
    * one OTHER document. High-fraction docs are boilerplate/mirror
    * candidates even when no single partner clears a pairwise
    * threshold, which is exactly what the pair-based ops can't see.
    *
    * Shape: in-row distinct grams (no global distinct), gram
    * document-frequency by one partial-aggregable groupBy, grams
    * re-join their df (both sides hash-partitioned on the gram —
    * ReuseExchange folds the shuffle), one per-doc rollup. Everything
    * is linear in corpus grams; no pair blowup anywhere. */
  def gramFrac(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), SharedN))).as("g"))
    // (doc_id, g) unique by construction → count(1) = distinct-doc df
    val gramDf = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val perDoc = grams.join(gramDf, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("df") > 1).cast("long")).as("n_shared"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_grams"), 6)))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirrors decontaminateNgramSql's gram comprehension; sums
    * CAST to BIGINT (DuckDB HUGEINT), the fraction is one division of
    * two exact integers rounded 6dp — engine-stable. */
  val gramFracSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, g FROM (
       |    SELECT doc_id,
       |      unnest([array_to_string(l[i:i+${SharedN - 1}], ' ')
       |              for i in range(1, len(l) - ${SharedN - 2})]) AS g
       |    FROM toks WHERE len(l) >= $SharedN) t),
       |gdf AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
       |  FROM grams JOIN gdf USING (g) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(n_grams, 0) AS n_grams,
       |  coalesce(n_shared, 0) AS n_shared,
       |  CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
       |       ELSE round(CAST(n_shared AS DOUBLE) / n_grams, 6) END AS shared_frac
       |FROM documents d LEFT JOIN perdoc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Maximal duplicated-SPAN extraction — the step after
    * [[gramFrac]]'s diagnostic: WHERE exactly is each document
    * duplicated (the RefinedWeb/“Deduplicating Training Data” exact
    * substring removal feed). A token position is covered when some
    * word 8-gram starting there also occurs in another document;
    * overlapping/contiguous covered ranges merge into maximal spans
    * `[span_start, span_end]` (1-based token indices).
    *
    * Shape: gram occurrences KEEP their positions (one `posexplode`),
    * the shared-gram set comes from the same distinct-gram df rollup
    * as [[gramFrac]], and span merging is the classic running-max
    * interval fold — one window over each doc's duplicated positions,
    * bounded by tokens-per-doc, never corpus-sized. */
  def spanExtract(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(s, d) // r14 guide 2.5: parallel posexplode+window
    val occ = docs.select(col("doc_id"),
      posexplode(shingles(col("text"), SharedN)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("g"))
    val shared = occ.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1).select(col("g"))
    val dup = occ.join(shared, "g").select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMaxEnd = max(col("pos") + (SharedN - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("new_span",
        (prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1).cast("int"))
      .withColumn("span", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (SharedN - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span").cast("long").as("span"),
        col("span_start"), col("span_end"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Oracle: zipped-unnest positions, HAVING df ≥ 2, the identical
    * running-max interval fold (window sums CAST off HUGEINT). */
  val spanExtractSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id,
       |    unnest([i for i in range(1, len(l) - ${SharedN - 2})]) AS pos,
       |    unnest([array_to_string(l[i:i+${SharedN - 1}], ' ')
       |            for i in range(1, len(l) - ${SharedN - 2})]) AS g
       |  FROM toks WHERE len(l) >= $SharedN),
       |shared AS (
       |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ) t
       |  GROUP BY g HAVING count(*) > 1),
       |dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN shared USING (g)),
       |m AS (
       |  SELECT doc_id, pos,
       |    max(pos + ${SharedN - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
       |  FROM dup),
       |sp AS (
       |  SELECT doc_id, pos,
       |    CAST(sum(CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS span
       |  FROM m)
       |SELECT doc_id, span,
       |  CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + ${SharedN - 1} AS BIGINT) AS span_end
       |FROM sp GROUP BY doc_id, span
       |ORDER BY doc_id, span_start""".stripMargin

  /** Exact-substring REMOVAL — the rewrite step [[spanExtract]] feeds
    * (Lee et al. “Deduplicating Training Data Makes Language Models
    * Better” drop the duplicated bytes, keeping the remainder): every
    * token inside a duplicated span is cut and the survivors re-joined
    * into `clean_text`, with before/after token accounting.
    *
    * Shape: token positions come from one `posexplode`; the span set is
    * [[spanExtract]]'s plan (spans per doc ≤ tokens/gram — doc-bounded,
    * never corpus-bounded); the cut is a doc_id-equi anti-join whose
    * extra range predicate runs inside the join, so shuffle volume is
    * tokens + spans hashed on doc_id. The rebuild sorts each doc's
    * surviving tokens IN-ROW (`array_sort` over a doc-bounded list —
    * same bounded-collect discipline as the multimodal reassembly),
    * so no per-token window is paid. */
  def spanRemoval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(s, d) // r14 guide 2.5: parallel token explode+rebuild
    val toksArr = tokens(col("text"))
    val toks = docs.select(col("doc_id"), posexplode(toksArr).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("pos"), col("tok"))
    val spans = spanExtract(s, d)
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("pos") >= col("span_start") && col("pos") <= col("span_end"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")), " ").as("clean_text"))
    docs.select(col("doc_id"), size(toksArr).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: [[spanExtractSql]]'s span CTEs verbatim, the cut as
    * NOT EXISTS over the span table, the rebuild as an ordered
    * string_agg — an independent formulation of the same rewrite. */
  val spanRemovalSql: String =
    s"""WITH toks0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id,
       |    unnest([i for i in range(1, len(l) + 1)]) AS pos,
       |    unnest([l[i] for i in range(1, len(l) + 1)]) AS tok
       |  FROM toks0),
       |occ AS (
       |  SELECT doc_id,
       |    unnest([i for i in range(1, len(l) - ${SharedN - 2})]) AS pos,
       |    unnest([array_to_string(l[i:i+${SharedN - 1}], ' ')
       |            for i in range(1, len(l) - ${SharedN - 2})]) AS g
       |  FROM toks0 WHERE len(l) >= $SharedN),
       |shared AS (
       |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ) t
       |  GROUP BY g HAVING count(*) > 1),
       |dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN shared USING (g)),
       |m AS (
       |  SELECT doc_id, pos,
       |    max(pos + ${SharedN - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
       |  FROM dup),
       |sp AS (
       |  SELECT doc_id, pos,
       |    CAST(sum(CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS span
       |  FROM m),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + ${SharedN - 1} AS span_end
       |  FROM sp GROUP BY doc_id, span),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.tok FROM toks t
       |  WHERE NOT EXISTS (SELECT 1 FROM spans s
       |    WHERE s.doc_id = t.doc_id
       |      AND t.pos BETWEEN s.span_start AND s.span_end)),
       |ka AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT t0.doc_id, CAST(len(t0.l) AS BIGINT) AS n_tokens,
       |  coalesce(n_kept, 0) AS n_kept,
       |  CAST(len(t0.l) AS BIGINT) - coalesce(n_kept, 0) AS n_removed,
       |  coalesce(clean_text, '') AS clean_text
       |FROM toks0 t0 LEFT JOIN ka USING (doc_id)
       |ORDER BY t0.doc_id""".stripMargin

  /** Sources treated as the incoming crawl by [[incremental]]. */
  private[graft] val DeltaSources = Seq("src0", "src1")

  /** INCREMENTAL near-dup admission — the production dedup shape: a
    * new crawl batch is admitted against the standing corpus (and
    * against its own earlier rows) without ever re-comparing
    * corpus × corpus. Every pair the committed corpus forms
    * internally is already settled; only pairs touching the delta
    * matter, so the inverted-index join probes with DELTA grams only.
    * Verdict per new doc: dropped if some corpus doc, or an EARLIER
    * doc of the same batch (min-id survivor convention, matching
    * [[Clusters.dedupSurvivors]]), clears the Jaccard threshold; the
    * reported partner prefers corpus over batch, then smallest id.
    * The streaming twin is `StreamOps.nearDupGate`.
    *
    * r14 (guide §2.5, hot keys): candidates now run the SAME
    * skew-adaptive rare/hot split as [[ngramJaccardDocs]], probing
    * with delta grams. The old naive delta×corpus gram join bounded
    * candidates at Σ_g df_delta(g)·df_all(g) — linear in the batch
    * ONLY while per-gram document frequency is bounded; ONE
    * boilerplate shingle shared by millions of corpus docs multiplies
    * every delta occurrence by that df (measured: the 100×
    * fixed-vocabulary corpus, where every gram's df ~ 1000, pushed
    * the naive join to 22.8e9 intersection rows and an 8 GiB-heap
    * OOM). Now grams with df ≤ [[HotDf]] take the capped
    * inverted-index join (bucket ≤ cap ⇒ no quadratic blowup), and
    * hot grams go through the PPJoin prefix filter over hot-touching
    * docs only — a qualifying pair either shares a rare gram (caught
    * by the capped index) or shares only hot grams, and then the
    * globally rarest shared gram sits in both prefixes (the prefix
    * theorem, [[ngramJaccardDocs]]'s exactness argument verbatim with
    * the probe side restricted to delta docs). On a df-uniform corpus
    * (every gate SF: max df at sf0.1 is 25) the hot branch is EMPTY —
    * zero window/prefix rows — and the rare join IS the old naive
    * join; the only added gate-SF cost is the df count+join, itself
    * partial-aggregable. Output is bit-identical (oracle replays the
    * full naive intersection in SQL; DedupSpec pins naive ≡ adaptive
    * on a planted hot-gram corpus). */
  def incremental(s: SparkSession, d: String, threshold: Double = 0.5): DataFrame =
    incrementalDocs(Tables.documents(s, d), threshold)

  /** [[incremental]] over an explicit documents frame — `hotDf`
    * parameterized for the planted-hot-corpus spec (the
    * [[ngramJaccardDocs]] testing seam). */
  def incrementalDocs(docs: DataFrame, threshold: Double = 0.5,
      hotDf: Long = HotDf): DataFrame = {
    val isDelta = col("source").isin(DeltaSources: _*)
    val withSets = docs.select(col("doc_id"), isDelta.as("is_new"),
      array_distinct(shingles(col("text"), 3)).as("set"))
    val sizes = withSets.select(col("doc_id"), size(col("set")).as("sz"))
    val sh = withSets.select(col("doc_id"), col("is_new"),
      explode(col("set")).as("shingle"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val tagged = sh.join(dfreq, "shingle")

    // rare path: capped inverted index, delta probe side — the join
    // output IS the intersection stream (the cRare lesson): one row
    // per shared rare gram, counted straight into c_r
    val rareAll = tagged.filter(col("df") <= hotDf)
      .select(col("doc_id"), col("is_new"), col("shingle"))
    val cRare = rareAll.filter(col("is_new"))
      .select(col("doc_id"), col("shingle")).as("a")
      .join(rareAll.select(col("doc_id"), col("shingle")).as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("nid"), col("b.doc_id").as("pid"))
      .agg(count(lit(1)).as("c_r"))

    // hot path: PPJoin prefixes over ONLY the docs touching a hot
    // gram; empty at every gate SF (no df exceeds the cap there)
    val hotRows = tagged.filter(col("df") > hotDf)
    val hotDocs = hotRows.select(col("doc_id")).distinct()
    val ranked = tagged.join(hotDocs, "doc_id")
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), xxhash64(col("shingle")))))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1 &&
        col("df") > hotDf)
      .select(col("doc_id"), col("is_new"), col("shingle"))
    val hotPrefixPairs = prefix.filter(col("is_new"))
      .select(col("doc_id"), col("shingle")).as("a")
      .join(prefix.select(col("doc_id"), col("shingle")).as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("nid"), col("b.doc_id").as("pid"))
      .distinct()
    // hot-intersection counts, only for pairs that CAN share a hot
    // gram (both ends hot-touching): rare pairs restricted to hot
    // docs ∪ the prefix-caught hot-only pairs
    val hotPairKeys = cRare.select(col("nid"), col("pid"))
      .join(hotDocs.select(col("doc_id").as("nid")), Seq("nid"), "left_semi")
      .join(hotDocs.select(col("doc_id").as("pid")), Seq("pid"), "left_semi")
      // re-project: the second key-joined semi join surfaces pid first,
      // and unionAll is positional (the ngramJaccardDocs guard)
      .select(col("nid"), col("pid"))
      .unionAll(hotPrefixPairs)
      .distinct()
    val cHot = hotPairKeys
      .join(hotRows.select(col("doc_id").as("nid"), col("shingle").as("s_n")), "nid")
      .join(hotRows.select(col("doc_id").as("pid"), col("shingle").as("s_p")), "pid")
      .filter(col("s_n") === col("s_p"))
      .groupBy(col("nid"), col("pid"))
      .agg(count(lit(1)).as("c_h"))

    // every shared gram counted exactly once (rare by the capped
    // join, hot by the hot branch); partner flag re-attached from the
    // one-row-per-doc tag table
    val inter = cRare.join(cHot, Seq("nid", "pid"), "full_outer")
      .withColumn("c", coalesce(col("c_r"), lit(0L)) + coalesce(col("c_h"), lit(0L)))
    val scored = inter
      .join(sizes.select(col("doc_id").as("nid"), col("sz").as("sa")), "nid")
      .join(sizes.select(col("doc_id").as("pid"), col("sz").as("sb")), "pid")
      .withColumn("jac", col("c").cast("double") / (col("sa") + col("sb") - col("c")))
      .filter(col("jac") >= threshold)
      .join(docs.select(col("doc_id").as("pid"), isDelta.as("p_new")), "pid")
      // a same-batch partner only disqualifies if it came earlier
      .filter(!col("p_new") || col("pid") < col("nid"))
    val w = Window.partitionBy(col("nid"))
      .orderBy(col("p_new").cast("int"), col("pid"))
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("nid").as("doc_id"), col("pid").as("dup_of"), col("jac").as("dup_jac"))
    docs.filter(isDelta).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("dup_of").isNull.cast("int").as("keep"),
        col("dup_of"), col("dup_jac"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-filter ADMISSION PRE-GATE — the cheapest first stage of the
    * [[incremental]] pipeline at 100 TB: build ONE compact Bloom
    * filter over the standing corpus's content fingerprints (native
    * `graft_bloom_agg`, partial filters OR together map-side; the
    * serialized image for 10⁵ items at 1 % fpp is ~120 KB), pull that
    * single bounded row to the driver (the classifier-weights /
    * kmeans-seed contract), and probe every incoming batch row IN-ROW
    * via `graft_bloom_contains` — the filter rides into generated code
    * as a reference object, so the probe is k bit-tests inside
    * whole-stage codegen. Only probe HITS (|batch|·fpp + true
    * duplicates) reach the exact fingerprint join; misses are admitted
    * with zero join work. Bloom guarantee: no false negatives — every
    * true duplicate has bloom_hit = 1 — so `is_dup ⇒ bloom_hit` is an
    * invariant, spec-pinned.
    *
    * Output per batch row: (doc_id, fp, bloom_hit, is_dup). The Bloom
    * probe itself is not SQL-expressible, so THIS raw form is
    * spec-checked (planted ground truth, FP rate vs the sized fpp) and
    * the REGISTERED [[bloomGate]] folds the probe into the
    * no-false-negative witness card the oracle can pin. */
  /** Pull the standing corpus's Bloom image (the one bounded driver
    * row). An EMPTY corpus degrades to an empty filter of the same
    * sizing — bloom_hit = false for every probe, exactly the
    * no-duplicates-possible verdict — instead of feeding a null
    * through `lit()` into `graft_bloom_contains`. */
  private[graft] def corpusBloom(corpus: DataFrame,
      expectedItems: Long, fpp: Double): Array[Byte] =
    Option(corpus.agg(call_function("graft_bloom_agg",
        xxhash64(col("fp")), lit(expectedItems), lit(fpp)))
      .head().getAs[Array[Byte]](0))
      .getOrElse {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.spark.util.sketch.BloomFilter
          .create(expectedItems, fpp).writeTo(out)
        out.toByteArray
      }

  private[graft] def bloomGateRaw(s: SparkSession, d: String,
      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    graft.Graft.registerFunctions(s)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), fingerprint(col("text")).as("fp"))
    val isDelta = col("source").isin(DeltaSources: _*)
    val corpus = docs.filter(!isDelta)
    val batch = docs.filter(isDelta)
    val bloomBytes = corpusBloom(corpus, expectedItems, fpp)
    val probed = batch.withColumn("bloom_hit",
      call_function("graft_bloom_contains", lit(bloomBytes), xxhash64(col("fp"))))
    // exact verify: only the hits pay the join; the corpus side is a
    // distinct-fingerprint projection
    val verified = probed.filter(col("bloom_hit"))
      .join(corpus.select(col("fp")).distinct().withColumn("m", lit(1)),
        Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("m"), lit(0)).as("is_dup"))
    probed
      .select(col("doc_id"), col("fp"), col("bloom_hit").cast("int").as("bloom_hit"))
      .join(verified, Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0)))
      .orderBy(col("doc_id"))
  }

  /** Bloom no-false-negative WITNESS (the q_countmin precedent): the
    * exact duplicate verdict is recomputed for EVERY batch row (a
    * full fingerprint join — the witness pays what the gate saves;
    * the gated hits-only path stays [[bloomGateRaw]]'s production
    * shape), and `nfn_ok` = ¬(is_dup ∧ ¬bloom_hit) pins the Bloom
    * guarantee per row: a probe that misses a true duplicate — a
    * broken partial-OR merge, a seed drift between agg and probe —
    * flips the flag and fails the driver hash compare. The
    * fingerprints are md5 of normalized text (the text_fingerprint
    * oracle), so the whole emitted card replays in SQL; the raw
    * bloom_hit column stays engine-internal, spec-asserted. */
  def bloomGate(s: SparkSession, d: String,
      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    graft.Graft.registerFunctions(s)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), fingerprint(col("text")).as("fp"))
    val isDelta = col("source").isin(DeltaSources: _*)
    val corpus = docs.filter(!isDelta)
    val batch = docs.filter(isDelta)
    val bloomBytes = corpusBloom(corpus, expectedItems, fpp)
    batch
      .withColumn("bloom_hit",
        call_function("graft_bloom_contains", lit(bloomBytes), xxhash64(col("fp"))))
      .join(corpus.select(col("fp")).distinct().withColumn("m", lit(1)),
        Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("m"), lit(0)).as("is_dup"),
        when(coalesce(col("m"), lit(0)) === 1 && !col("bloom_hit"), 0)
          .otherwise(1).as("nfn_ok"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[bloomGate]]: the exact cross-corpus duplicate card
    * with the no-false-negative flag pinned TRUE. */
  val bloomGateSql: String = {
    val srcs = DeltaSources.map(x => s"'$x'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM documents),
       |corpus AS (SELECT DISTINCT fp FROM docs WHERE source NOT IN ($srcs)),
       |batch AS (SELECT doc_id, fp FROM docs WHERE source IN ($srcs))
       |SELECT b.doc_id, b.fp,
       |  CAST(c.fp IS NOT NULL AS INT) AS is_dup, 1 AS nfn_ok
       |FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
       |ORDER BY b.doc_id""".stripMargin
  }

  /** Oracle: the identical asymmetric join + verdict windows. */
  val incrementalSql: String = {
    val srcs = DeltaSources.map(x => s"'$x'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
       |  FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2] for i in range(1, len(l)-1)]) AS shingle
       |       FROM toks WHERE len(l) >= 3),
       |tags AS (SELECT doc_id, source IN ($srcs) AS is_new FROM documents),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS nid, b.doc_id AS pid, tb.is_new AS p_new, count(*) AS c
       |  FROM sh a
       |  JOIN tags ta ON ta.doc_id = a.doc_id AND ta.is_new
       |  JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  JOIN tags tb ON tb.doc_id = b.doc_id
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT nid, pid, p_new, CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) AS jac
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = nid
       |  JOIN sizes sb ON sb.doc_id = pid
       |  WHERE CAST(c AS DOUBLE)/(sa.sz + sb.sz - c) >= 0.5
       |    AND (NOT p_new OR pid < nid)),
       |best AS (
       |  SELECT nid, pid, jac,
       |    row_number() OVER (PARTITION BY nid
       |      ORDER BY CAST(p_new AS INT), pid) AS rn
       |  FROM scored)
       |SELECT d.doc_id,
       |  CAST(b.pid IS NULL AS INT) AS keep,
       |  b.pid AS dup_of, b.jac AS dup_jac
       |FROM (SELECT doc_id FROM documents WHERE source IN ($srcs)) d
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.nid = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- containment --------------------------------------------------

  /** Asymmetric CONTAINMENT near-dup pairs (Broder's containment
    * measure): |A∩B| / min(|A|, |B|) ≥ τ over 3-gram shingle sets —
    * catches a document EMBEDDED inside a larger one (quote farms,
    * page-plus-boilerplate wrappers), which symmetric Jaccard misses
    * because the union is dominated by the larger doc.
    *
    * Candidate semantics are DELIBERATELY discriminative: a pair
    * qualifies only by sharing at least one shingle with document
    * frequency ≤ [[HotDf]] — boilerplate-only overlap (shingles shared
    * by hundreds of docs) is exactly what a dedup pipeline must NOT
    * treat as cloning evidence (the RefinedWeb/massive-gram exclusions
    * make the same call), and the cap simultaneously bounds every
    * inverted-index bucket, so candidate volume is O(df²·buckets) with
    * df ≤ cap — no quadratic hot bucket exists by construction. The
    * containment score itself is EXACT over the full shingle sets
    * (in-row `array_intersect` on the candidate pair — no second
    * corpus shuffle). Oracle applies the identical candidate rule.
    */
  def containment(s: SparkSession, d: String, tau: Double = 0.8): DataFrame = {
    // same plan skeleton as [[ngramJaccardDocs]] (whose cost ladder is
    // in BENCH_NOTES): shingle sets built in-row, the capped rare
    // self-join's output IS the rare-intersection stream, and the hot
    // remainder is counted only for pairs that already qualify — no
    // set arrays ever enter a join, and the corpus is shingled once
    // per consumer with the shuffles shared via ReuseExchange
    val withSets = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("set"))
    val sh = withSets.select(col("doc_id"), explode(col("set")).as("shingle"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val tagged = sh.join(dfreq, "shingle")
    val rare = tagged.filter(col("df") <= HotDf).select(col("doc_id"), col("shingle"))
    val cRare = rare.as("a")
      .join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c_r"))
    val hotRows = tagged.filter(col("df") > HotDf)
    // PPJoin-style positional bound (the round-11 verify-term lever):
    // shared = c_r + c_h and c_h can never exceed min(|hot(i)|,
    // |hot(j)|), so round((c_r + min(hc)) / min(sz), 6) < τ proves the
    // pair can't qualify — prune it BEFORE the hot-intersection join,
    // which is the term that dominated the 5× growth row (round() is
    // monotonic, so the cut is exactly output-invariant). Both per-doc
    // stats (set size, hot-shingle count) come from ONE aggregate over
    // the already-materialized tagged stream, and the candidate stream
    // is joined exactly twice (i, j) — the same two stat joins the
    // un-levered plan spent at its tail, just moved above the verify
    // join so they prune instead of decorate.
    val stats = tagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("sz"),
      sum(when(col("df") > HotDf, 1L).otherwise(0L)).as("hc"))
    val bounded = cRare
      .join(stats.select(col("doc_id").as("i"), col("sz").as("sz_i"), col("hc").as("hc_i")), "i")
      .join(stats.select(col("doc_id").as("j"), col("sz").as("sz_j"), col("hc").as("hc_j")), "j")
      .filter(round(
        (col("c_r") + least(col("hc_i"), col("hc_j")))
          .cast("double") / least(col("sz_i"), col("sz_j")), 6) >= tau)
      // bounded feeds BOTH the verify join and the final assembly; the
      // stat joins above are broadcast builds, which leave no exchange
      // for reuse (the minhash-band lesson) — this explicit (i, j)
      // shuffle is the reuse point, and the final (i, j) sort-merge
      // join needs exactly this partitioning anyway
      .repartition(col("i"), col("j"))
    // only pairs with BOTH ends touching a hot shingle can share one —
    // the same left_semi cut ngramJaccardDocs applies before its hot
    // re-count (measured 6.2 → ~4.4 s at sf0.1 without it)
    val hotDocs = hotRows.select(col("doc_id")).distinct()
    val cHot = bounded.select(col("i"), col("j"))
      .join(hotDocs.select(col("doc_id").as("i")), Seq("i"), "left_semi")
      .join(hotDocs.select(col("doc_id").as("j")), Seq("j"), "left_semi")
      .join(hotRows.select(col("doc_id").as("i"), col("shingle").as("s_i")), "i")
      .join(hotRows.select(col("doc_id").as("j"), col("shingle").as("s_j")), "j")
      .filter(col("s_i") === col("s_j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("c_h"))
    bounded.join(cHot, Seq("i", "j"), "left")
      .withColumn("shared", col("c_r") + coalesce(col("c_h"), lit(0L)))
      .withColumn("containment",
        round(col("shared").cast("double") / least(col("sz_i"), col("sz_j")), 6))
      .filter(col("containment") >= tau)
      .select(col("i"), col("j"), col("shared"), col("containment"))
      .orderBy(col("i"), col("j"))
  }

  val containmentSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), t -> len(t) > 0) AS l
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      |                 for i in range(1, len(l)-1)]) AS shingle
      |       FROM toks WHERE len(l) >= 3),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
      |          FROM sh GROUP BY doc_id),
      |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      |  FROM sh a
      |  JOIN dfreq USING (shingle)
      |  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  WHERE df <= 256),
      |inter AS (
      |  SELECT c.i, c.j, CAST(count(*) AS BIGINT) AS shared
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.i
      |  JOIN sh b ON b.doc_id = c.j AND b.shingle = a.shingle
      |  GROUP BY c.i, c.j)
      |SELECT i, j, shared,
      |  round(CAST(shared AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = i
      |JOIN sizes sb ON sb.doc_id = j
      |WHERE round(CAST(shared AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.8
      |ORDER BY i, j""".stripMargin
}

/** Deterministic seeded hyperplanes for the cosine-LSH sketches. The
  * vectors are plan-time literals: cheap to generate, identical on
  * every run, and shipped to executors inside the serialized plan
  * (64 doubles per plane — negligible). */
object Hyperplanes {
  def make(n: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** [[graft.operators.Dedup.embeddingNearDup]]'s derived band width,
    * w = clamp(⌊log₂ n⌋ − 3, 8, 16), as a column over the corpus
    * count — single-sourced so the plan expression and the spec pin
    * (HyperplaneSigSpec) cannot drift; the DuckDB oracle carries the
    * same text with `//` division ([[Dedup.embeddingNearDupSql]]). */
  def derivedWidth(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{bin, greatest, least, length, lit}
    least(lit(16), greatest(lit(8), length(bin(n)) - 1 - 3)).cast("int")
  }

  /** The same planes as a DuckDB 2-D DOUBLE[][] literal. Scala's
    * `Double.toString` is shortest-round-trip, so the SQL text parses
    * back to bit-identical doubles — the seeded draw and its oracle
    * rendering live in ONE place (the AdamicAdarDegCap discipline:
    * a re-seed cannot silently diverge from a registered oracle). */
  def sqlLit(planes: Array[Array[Double]]): String =
    planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]") + "::DOUBLE[][]"

  /** `bucket` replay of `Similarity.hyperplaneSketch`: bit i set iff
    * v · plane_i ≥ 0, packed as Σ 1<<i. `list_dot_product` folds in
    * ascending index order exactly like the engine's
    * `aggregate(zip_with(...))` (the annBruteforceSql precedent —
    * bit-identical at all scale factors), so the sign of every dot is
    * the same on both engines. Expects the planes bound as `pl`. */
  def sqlBucket(v: String, nBits: Int): String =
    s"list_sum([CASE WHEN list_dot_product($v, pl[i+1]) >= 0 " +
      s"THEN (1<<i)::BIGINT ELSE 0 END for i in range(0,$nBits)])"
}
