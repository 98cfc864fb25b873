package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * `annBruteforce` is the exact baseline: broadcast the (small) query
  * set against the corpus — one scan, no shuffle of the corpus, exact
  * top-k per query. `annLsh` is the 100 TB path: random-hyperplane
  * buckets bound each query's candidate set, so corpus rows are only
  * compared inside matching buckets.
  *
  * Dot products run through `zip_with`/`aggregate` higher-order
  * functions — columnar, no UDF serialization.
  */
object Similarity {

  /** Pairwise dot product via the native codegen'd expression
    * (graft.functions.DotProduct) — same ascending-index fold as the
    * `aggregate(zip_with(...))` form and DuckDB's `list_dot_product`,
    * so cosines stay bit-identical to every oracle, ~100× cheaper per
    * pair (the kNN graph is millions of pairs). */
  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  private[graft] def corpus(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerFunctions(s)
    // r14: Tables.embeddings arrives spread across the session's
    // parallelism when the file is a single scan split (guide §2.5) —
    // the downstream dot/sig expressions are exactly the per-row-heavy
    // case that spread exists for
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  /** Shared top-k for the ANN family — [[annBruteforce]], [[annLsh]],
    * [[annIvf]], [[annIvfPq]] and [[annRecall]] all rank to the SAME
    * depth, and every oracle interpolates this constant, so the
    * recall denominator can never drift from the result-set size. */
  private[graft] val AnnK = 5

  /** [[semanticDedup]]'s derived-k ceiling, shared by
    * [[derivedClusters]] and the `derivedK` oracle CTE
    * ([[ivfSqlPrefix]]) — one constant so engine and oracle cannot
    * silently diverge. Declared BEFORE every generated-SQL val: object
    * init order would otherwise bake a 0 into any oracle string built
    * ahead of this line. r14 raised it 512 → 4096 (see
    * [[derivedClusters]]). */
  val MaxClusters: Int = 4096

  /** Declared corpus bound for [[knnGraph]], the registered all-pairs
    * exactness baseline. Past this, the quadratic pair set stops being
    * a baseline and starts being an outage (10¹⁰ pairs at the bound);
    * the in-plan guard raises instead of running. [[knnGraphLsh]] is
    * the unbounded production path. */
  private[graft] val KnnGraphMaxRows = 100000L

  /** Exact top-k cosine neighbors for the first `nQueries` vectors.
    * The query side is broadcast; ranking is a per-query window with a
    * deterministic tie-break. */
  def annBruteforce(s: SparkSession, d: String, nQueries: Int = 8, k: Int = AnnK): DataFrame = {
    val c = corpus(s, d)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** DuckDB oracle for [[annBruteforce]] — `list_dot_product` folds in
    * index order exactly like Spark's `aggregate(zip_with(...))`, so
    * the cosines are bit-identical. */
  val annBruteforceSql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM c WHERE vec_id < 8),
      |scored AS (
      |  SELECT q_id, c.vec_id,
      |    list_dot_product(qv, v) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
      |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
      |ranked AS (SELECT q_id, vec_id, cosine,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, vec_id, cosine FROM ranked WHERE rnk <= $AnnK
      |ORDER BY q_id, rnk""".stripMargin

  /** Random-hyperplane sign sketch, packed LONG: bit i set iff
    * v · plane_i ≥ 0. Native codegen'd expression
    * ([[graft.functions.HyperplaneSig]]) — the former
    * `aggregate(transform(zip_with(...)))` lambda tower was
    * CodegenFallback on every declared 100 TB embedding path; the
    * planes are the same seeded draw the DuckDB oracles render via
    * [[Hyperplanes.sqlLit]], derived inside the expression from
    * (nBits, dim, seed). */
  private[graft] def hyperplaneSketch(v: Column, nBits: Int, seed: Long,
    dim: Int = 64): Column =
    call_function("graft_hyperplane_sig", v, lit(nBits), lit(dim), lit(seed))

  /** LSH-bucketed ANN: 8-bit random-hyperplane sketch partitions the
    * corpus; each query only scans buckets within Hamming distance ≤ 3
    * of its own sketch (multi-probe ≈ 36 % of buckets). Recall vs
    * `annBruteforce` is spec-checked. NOTE: the synthetic embeddings
    * are isotropic Gaussians — the hardest case for any sublinear ANN;
    * on real (clustered) embedding corpora the same sketch gives far
    * better recall at far lower probe fractions. */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 8, k: Int = AnnK): DataFrame = {
    def sketch(v: Column): Column = hyperplaneSketch(v, nBits = 8, seed = 11)

    val c = corpus(s, d).withColumn("bucket", sketch(col("v")))
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("qb"))
    // multi-probe: corpus row is a candidate if its bucket is within
    // Hamming distance 2 of the query bucket (broadcast query side)
    val scored = c.join(broadcast(q),
        col("vec_id") =!= col("q_id") &&
        bit_count(col("bucket").bitwiseXOR(col("qb"))) <= 3)
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Generated DuckDB oracle for [[annLsh]] (r7 promotion): the seeded
    * hyperplanes embed as a DOUBLE[][] literal, the 8-bit bucket
    * replays sign-exactly ([[Hyperplanes.sqlBucket]]), and the
    * Hamming≤3 multi-probe + exact-cosine re-rank replay directly —
    * the candidate set and the cosines are both deterministic data
    * arithmetic once the planes are plan literals. */
  val annLshSql: String = {
    val pl = Hyperplanes.make(8, dim = 64, seed = 11)
    s"""WITH pls AS (SELECT ${Hyperplanes.sqlLit(pl)} AS pl),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        ${Hyperplanes.sqlBucket("CAST(embedding AS DOUBLE[])", 8)} AS bucket
       |      FROM embeddings, pls),
       |q AS (SELECT vec_id AS q_id, v AS qv, bucket AS qb FROM c WHERE vec_id < 8),
       |scored AS (
       |  SELECT q_id, c.vec_id,
       |    list_dot_product(qv, v)
       |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
       |  FROM c JOIN q ON c.vec_id <> q.q_id AND bit_count(xor(bucket, qb)) <= 3),
       |ranked AS (SELECT q_id, vec_id, cosine,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, vec_id, cosine FROM ranked WHERE rnk <= $AnnK
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Recall@k of [[annLsh]] against the exact [[annBruteforce]]
    * ground truth — the evaluation harness every ANN deployment runs
    * before trusting an index (and re-runs after every re-tune of
    * bits/probes). Both sides are deterministic data arithmetic
    * (plan-literal hyperplanes, exact cosines), so the recall table
    * itself is fully oracle-able — the oracle replays BOTH pipelines
    * and diffs them exactly as this does. Per-query hit counts come
    * from a left join of the two k-sized result sets (output is
    * nQueries rows; the dominant cost is the two ANN passes
    * themselves). */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val truth = annBruteforce(s, d).select(col("q_id"), col("vec_id"))
    val cand = annLsh(s, d)
      .select(col("q_id").as("cq"), col("vec_id").as("cv"))
    truth
      .join(cand, col("q_id") === col("cq") && col("vec_id") === col("cv"),
        "left")
      .groupBy(col("q_id"))
      .agg(sum(when(col("cv").isNotNull, 1L).otherwise(0L)).as("hits"))
      .select(col("q_id"), col("hits"),
        round(col("hits").cast("double") / lit(AnnK.toDouble), 6).as("recall"))
      .orderBy(col("q_id"))
  }

  val annRecallSql: String =
    s"""WITH truth AS (SELECT q_id, vec_id FROM ($annBruteforceSql) t),
       |cand AS (SELECT q_id AS cq, vec_id AS cv FROM ($annLshSql) c)
       |SELECT truth.q_id,
       |  CAST(sum(CASE WHEN cv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  round(CAST(sum(CASE WHEN cv IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / $AnnK.0, 6) AS recall
       |FROM truth LEFT JOIN cand ON truth.q_id = cq AND truth.vec_id = cv
       |GROUP BY truth.q_id ORDER BY truth.q_id""".stripMargin

  /** Exact k-nearest-neighbor GRAPH — every vector gets its top-k
    * cosine neighbors (the structure behind kNN-classification,
    * graph-based ANN indexes, and embedding-cluster diagnostics).
    * All-pairs by construction (the exactness oracle, like
    * [[annBruteforce]]); one side rides as a broadcast so the corpus
    * is scanned once, and ranking is the per-query window. At corpus
    * scale the quadratic pair set is the point of [[knnGraphLsh]] —
    * this op is the small-side / recall-reference baseline, and it
    * GUARDS against misuse: an in-plan corpus count (1-row broadcast
    * scalar, the graph_kcore derived-k recipe) raises a loud error
    * past [[KnnGraphMaxRows]] instead of silently attempting n² on a
    * production corpus. The guard rides inside the broadcast side's
    * norm column so column pruning can never drop it. */
  def knnGraph(s: SparkSession, d: String, k: Int = 3,
      maxRows: Long = KnnGraphMaxRows): DataFrame = {
    // norms are computed ONCE per vector before the pair join (the
    // pair set is quadratic; a per-pair norm would triple its cost)
    val c = corpus(s, d).withColumn("nrm", norm(col("v")))
    val n1 = corpus(s, d).agg(count(lit(1)).as("n"))
    val q = c.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(n1))
      .select(col("q_id"), col("qv"),
        when(col("n") > maxRows,
          raise_error(concat(
            lit("emb_knn_graph is the declared all-pairs exactness baseline (bound n <= "),
            lit(maxRows).cast("string"), lit("); corpus has "), col("n").cast("string"),
            lit(" rows - use emb_knn_graph_lsh for production corpora")))
            .cast("double"))
          .otherwise(col("qn")).as("qn"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("nbr_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** DuckDB oracle — same fold order as Spark's `aggregate(zip_with)`,
    * so cosines are bit-identical (see [[annBruteforceSql]]). */
  val knnGraphSql: String =
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
      |    list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      |  FROM c a CROSS JOIN c b WHERE a.vec_id <> b.vec_id),
      |ranked AS (SELECT q_id, nbr_id, cosine,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nbr_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, nbr_id, cosine FROM ranked WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin

  /** Max hyperplanes precomputed for [[knnGraphLsh]]'s derived-width
    * sketch: 24 bits supports corpora to ~2²⁸ vectors at the ~16-per-
    * bucket target before the clamp binds. */
  private[graft] val KnnLshMaxBits = 24

  /** LSH-bucketed k-NN graph — the 100 TB construction: no broadcast
    * of the corpus, no all-pairs. The bucket WIDTH is derived in-plan
    * from the corpus size (the graph_kcore derived-k recipe): nbits =
    * clamp(⌊log₂ n⌋ − 4, 4, [[KnnLshMaxBits]]) from ONE bounded count
    * (a 1-row broadcast scalar), so expected occupancy stays ~2⁴ per
    * bucket at ANY corpus size and candidate volume is
    * n·(1+nbits)·2⁴ = O(n log n) — a fixed width is quadratic once n
    * outgrows 2^bits. ⌊log₂ n⌋ computes as the bit length of n
    * (length(bin(n)) − 1) — integer-exact on both engines, no
    * float-log edge at powers of two. The sketch is always the full
    * [[KnnLshMaxBits]]-plane literal, masked down to nbits at runtime;
    * the probe side fans out through ONE posexplode over the 1+24
    * xor masks, keeping mask rows ≤ nbits (self + one-bit flips), and
    * candidates come from ONE bucket equi-join (both sides
    * hash-partitioned on the bucket key) = all pairs within Hamming
    * ≤ 1. A hot bucket (clustered corpora) is a skew-join salting/AQE
    * case, not a plan change — spec-pinned. Recall vs [[knnGraph]] is
    * spec-checked; isotropic Gaussian test vectors are the worst case
    * (see [[annLsh]] note). Every emitted cosine is exact, and the
    * whole construction (count → width → mask → probe) replays in the
    * DuckDB oracle. */
  def knnGraphLsh(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val c0 = corpus(s, d)
    val nb = c0.agg(count(lit(1)).as("n"))
      .select(least(lit(KnnLshMaxBits), greatest(lit(4),
        length(bin(col("n"))) - 1 - 4)).as("nbits"))
    val c = c0.crossJoin(broadcast(nb))
      .withColumn("bucket", hyperplaneSketch(col("v"), KnnLshMaxBits, seed = 11)
        .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), nbits) - 1")))
      .withColumn("nrm", norm(col("v")))
    val probes = c.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qn"), col("nbits"),
      posexplode(array((lit(0L) +: (0 until KnnLshMaxBits).map(b =>
        lit(1L << b))).map(m => col("bucket").bitwiseXOR(m)): _*))
        .as(Seq("pos", "probe")))
      .filter(col("pos") <= col("nbits"))
    val scored = probes.join(c,
        col("probe") === col("bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("nbr_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Generated DuckDB oracle for [[knnGraphLsh]] (r7 promotion; r8:
    * the derived-width lever replays too): same plane-literal replay
    * as [[annLshSql]]; nbits recomputes from the same count via the
    * integer bit-length, the bucket masks down identically, the
    * Hamming≤1 multi-probe is the (1+24)-mask xor fan-out cut at
    * nbits, and the probe⋈bucket equi-join and top-3 window replay
    * directly. */
  val knnGraphLshSql: String = {
    val pl = Hyperplanes.make(KnnLshMaxBits, dim = 64, seed = 11)
    val masks = (0L +: (0 until KnnLshMaxBits).map(b => 1L << b)).mkString(",")
    s"""WITH pls AS (SELECT ${Hyperplanes.sqlLit(pl)} AS pl),
       |nb AS (SELECT least($KnnLshMaxBits,
       |         greatest(4, length(bin(count(*))) - 1 - 4)) AS nbits
       |       FROM embeddings),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        ((${Hyperplanes.sqlBucket("CAST(embedding AS DOUBLE[])", KnnLshMaxBits)})
       |          & ((1::BIGINT << nbits) - 1)) AS bucket
       |      FROM embeddings, pls, nb),
       |probes AS (SELECT q_id, qv, probe FROM (
       |    SELECT vec_id AS q_id, v AS qv,
       |      unnest(ms) AS probe, generate_subscripts(ms, 1) - 1 AS pos
       |    FROM (SELECT vec_id, v,
       |            [xor(bucket, m) for m in [$masks]] AS ms
       |          FROM c)) t, nb
       |  WHERE pos <= nbits),
       |scored AS (
       |  SELECT q_id, c.vec_id AS nbr_id,
       |    list_dot_product(qv, v)
       |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
       |  FROM probes JOIN c ON probe = bucket AND c.vec_id <> q_id),
       |ranked AS (SELECT q_id, nbr_id, cosine,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nbr_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, nbr_id, cosine FROM ranked WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Centroids with norms paired POSITIONALLY (list index 0..n-1), so
    * nothing depends on vec_id contiguity or zero-basing. */
  private[graft] final case class Centroid(id: Int, v: Array[Double], norm: Double)

  private def toCentroids(vecs: Array[Array[Double]]): Array[Centroid] =
    vecs.zipWithIndex.map { case (v, i) =>
      Centroid(i, v, math.sqrt(v.map(x => x * x).sum))
    }

  /** cosine(v, centroid_i) for every centroid as literal-array math;
    * descending (sim, cent_id) struct sort ranks the lists. */
  private def topCents(cents: Array[Centroid], v: Column, n: Int): Column = {
    val sims = cents.toSeq.map { c =>
      struct(
        (dot(v, typedLit(c.v.toSeq)) / (norm(v) * c.norm)).as("sim"),
        lit(c.id).as("cent_id"))
    }
    slice(reverse(array_sort(array(sims: _*))), 1, n)
  }

  /** Distributed Lloyd iterations for the IVF centroids. Seeds are the
    * first `nLists` corpus vectors; each iteration assigns every
    * corpus vector to its cosine-nearest centroid with plan-time
    * literal arithmetic (no corpus shuffle for assignment), then takes
    * per-list per-dimension means via one posexplode + hash agg. Means
    * are integer MICRO-UNIT sums (round(x·1e6) longs — exact, order
    * independent) divided once on the driver — centroids (and
    * therefore the whole IVF plan) stay bit-deterministic across
    * runs/partitionings AND replay exactly in SQL ([[ivfSqlPrefix]]).
    * Only nLists × dim aggregated (sum, count) pairs ever reach the
    * driver (bounded; documented collect). Empty clusters keep their
    * previous centroid.
    *
    * Training runs on a BOUNDED sample (`trainCap` vectors, ~128 per
    * list), not the full corpus — the standard IVF recipe: at 100 TB
    * you cannot (and need not) Lloyd every vector; a thousands-sized
    * sample pins the centroids and only the single assignment pass
    * touches the whole corpus.
    *
    * `annAssign` (r14, the k-cap raise): past [[AnnAssignMinK]]
    * centroids the per-iteration training assign runs through the SAME
    * [[graft.functions.CentAssign]] bucketed probe as the serving
    * assign (nProbe = 1; band tables rebuilt per iteration from the
    * current centroids — a driver-side k·⌊64/w⌋ hashing pass), instead
    * of evaluating k exact topCents literals per sampled row: the
    * exact path is O(trainCap·k) = O(128·k²) dots AND a k-struct
    * literal plan that stops codegen'ing long before the 4096 cap.
    * The probe only PRUNES each row's candidate centroids; the row
    * still takes exact cosines against them, and the vanishingly rare
    * empty-candidate row drops from that iteration's means (a
    * sample-weight, not correctness, effect — Lloyd is a heuristic
    * seeding step and stays fully deterministic). semanticDedup gates
    * this on k > AnnAssignMinK — a CONSTANT, not the test-override
    * parameter — so every gate-SF oracle trains exact and
    * byte-identical, and forced-ANN specs still isolate the serving
    * assign. */
  private[graft] def kmeansCentroids(c: DataFrame, nLists: Int, iters: Int,
    trainCap: Int = 2048, annAssign: Boolean = false): Array[Centroid] = {
    // Sample by xxhash64(vec_id) order, NOT by id value: ids may be
    // sparse, non-zero-based, or clustered by ingest order (hash order
    // is ingest-independent). orderBy+limit plans as TakeOrdered — one
    // corpus pass keeping trainCap rows per partition, no full sort.
    // vec_id tie-break keeps the draw total-ordered (hash collisions).
    val byHash = c.orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val train = byHash.limit(trainCap)
    var cents = toCentroids(
      byHash.limit(nLists).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2))
    for (_ <- 1 to iters) {
      // means in integer MICRO-UNITS (the emb_whiten recipe): the
      // per-cell round(x·1e6) longs sum exactly under any
      // partitioning, and floor(sx/n)/1e6 is floor of identical IEEE
      // doubles on every engine (the q9 floor-not-round lesson) — so
      // the WHOLE Lloyd run replays bit-for-bit in the DuckDB oracles
      // ([[ivfSqlPrefix]]). The ≤1e-6 centroid perturbation is far
      // below any assignment-relevant scale on unit-ish vectors.
      val assignCol =
        if (annAssign) {
          val w = derivedAssignWidth(nLists)
          get(org.apache.spark.sql.GraftColumnBridge.column(
            graft.functions.CentAssign(
              org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
              cents.map(_.v.toIndexedSeq).toIndexedSeq,
              1, w, derivedAssignTables(w), AssignSeed)), lit(0))
        } else topCents(cents, col("v"), 1)(0)("cent_id")
      val means = train
        .withColumn("list_id", assignCol)
        // annAssign: the rare empty-candidate row yields a null
        // list_id and drops from this iteration's means (exact path:
        // never null, filter is a no-op)
        .filter(col("list_id").isNotNull)
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(round(col("x") * 1e6, 0).cast("long")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getInt(1))
            .map(r => math.floor(r.getLong(2).toDouble / r.getLong(3)) / 1e6)
        }
      cents = toCentroids(cents.map(c => means.getOrElse(c.id, c.v)))
    }
    cents
  }

  /** Trained-centroid cache: an IVF index is built ONCE offline and
    * served for many queries — re-running Lloyd on every query call
    * would charge the (deliberately bounded) training cost to the
    * query path. Keyed by corpus dir + training params, which assumes
    * corpus paths are immutable/versioned (the warehouse convention —
    * a rewritten-in-place corpus must call [[clearCentroidCache]]).
    * Bit-identical to an uncached run: [[kmeansCentroids]] is
    * deterministic. Training runs OUTSIDE any map lock (worst case two
    * racing callers both train and one result wins). */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Array[Centroid]]()

  /** Drop every cached IVF index (after overwriting a corpus path). */
  def clearCentroidCache(): Unit = centroidCache.clear()

  /** IVF-style ANN: the corpus is partitioned into `nLists` inverted
    * lists by nearest centroid; a query scans only the `nProbe`
    * closest lists. Centroids come from [[kmeansCentroids]] (a few
    * distributed Lloyd passes) and are baked into the plan as literal
    * arrays, so BOTH centroid assignment and query probing are
    * pure column arithmetic: the corpus is never shuffled for
    * assignment, and the probe side is a broadcast join. The only
    * shuffle is the per-query top-k window over matched candidates. */
  def annIvf(s: SparkSession, d: String, nQueries: Int = 8, k: Int = AnnK,
    nLists: Int = 16, nProbe: Int = 4, kmeansIters: Int = 3): DataFrame = {
    val c = corpus(s, d)
    val key = (d, nLists, kmeansIters)
    val cents = Option(centroidCache.get(key)).getOrElse {
      val trained = kmeansCentroids(c, nLists, kmeansIters)
      // use putIfAbsent's return, never a second map read: a concurrent
      // clearCentroidCache() between put and re-read would yield null
      val prior = centroidCache.putIfAbsent(key, trained)
      if (prior != null) prior else trained
    }

    val assigned = c.withColumn("list_id", topCents(cents, col("v"), 1)(0)("cent_id"))
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(topCents(cents, col("v"), nProbe)("cent_id")).as("probe_list"))

    val scored = assigned.join(broadcast(q),
        col("list_id") === col("probe_list") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** cosine(v, centroid) in DuckDB — the [[topCents]] arithmetic:
    * `list_dot_product` matches the engine's index-order fold (the
    * annBruteforceSql precedent) and the centroid norm recomputes the
    * driver's index-order square fold, so similarity ranks agree
    * bit-for-bit. */
  private def ivfCos(v: String, cv: String): String =
    s"list_dot_product($v, $cv) / (sqrt(list_dot_product($v, $v)) * sqrt(list_dot_product($cv, $cv)))"

  /** Shared DuckDB replay of [[kmeansCentroids]] — the r7 oracle
    * promotion of `ann_ivf` and `dedup_semantic`. The whole Lloyd run
    * is deterministic integer/IEEE arithmetic, so it replays stage by
    * stage: (1) the hash-ordered training draw re-sorts on
    * [[SqlHash.hashLong]] of vec_id (bit-exact `xxhash64`, seed 42)
    * with the vec_id tie-break; (2) seeds are the first nLists rows
    * re-sorted by vec_id (cent_id = rank − 1, the driver's
    * sortBy(_._1) contract); (3) each unrolled iteration assigns train
    * vectors by descending (cosine, cent_id) — the [[topCents]]
    * reversed-struct-sort tie-break — and takes per-list per-dim
    * MICRO-UNIT means: round(x·1e6) BIGINTs sum exactly on both
    * engines, floor(sx/n)/1e6 is floor of identical IEEE doubles (the
    * q9 floor-not-round lesson); empty lists COALESCE to the previous
    * centroid. Every multiply-referenced CTE is MATERIALIZED (the
    * graph_kcore exponential-inline lesson). Ends with
    * `fin(cent_id, cv)`; append further CTEs with a leading comma. */
  /** `derivedK = true` replays [[semanticDedup]]'s corpus-derived
    * cluster count: k = clamp(count/256, nLists, [[MaxClusters]])
    * computed in a 1-row CTE, consumed as a scalar subquery by the
    * seed cut — the Lloyd iteration stages are k-agnostic, so nothing
    * else changes. (The replay is always the EXACT training assign:
    * at every gate SF k floors at nLists < AnnAssignMinK, so the
    * engine's large-k `annAssign` training mode never activates where
    * an oracle runs.) */
  private def ivfSqlPrefix(nLists: Int, iters: Int, trainCap: Int = 2048,
      derivedK: Boolean = false): String = {
    import SqlHash._
    val kSql = if (derivedK) "(SELECT k FROM nb)" else nLists.toString
    // derivedK also re-derives the Lloyd sample cap (r13 —
    // [[derivedTrainCap]]: max(2048, 128·k), the ~128-rows-per-seed
    // scaling); at every gate SF k floors at nLists so the cap floors
    // at the historical trainCap and the training draw is unchanged
    val capSql = if (derivedK) "(SELECT cap FROM nb)" else trainCap.toString
    val nbCte = if (derivedK)
      s"""nb AS MATERIALIZED (
         |  SELECT k, greatest($trainCap, 128 * k) AS cap FROM (
         |    SELECT greatest($nLists, least($MaxClusters, count(*) // 256)) AS k
         |    FROM embeddings)),
         |""".stripMargin
    else ""
    val hash = bind("lv", "CAST(vec_id AS HUGEINT)",
      toSigned(hashLong("lv", "42::HUGEINT", "iv")))
    def iterStage(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""a$i AS (
         |  SELECT vec_id, cent_id AS list_id
         |  FROM (SELECT t.vec_id, c.cent_id,
         |          row_number() OVER (PARTITION BY t.vec_id ORDER BY
         |            ${ivfCos("t.v", "c.cv")} DESC, c.cent_id DESC) AS rk
         |        FROM train t CROSS JOIN $prev c)
         |  WHERE rk = 1),
         |m$i AS (
         |  SELECT a.list_id AS cent_id,
         |         list(floor(sx / n) / 1000000.0 ORDER BY pos) AS mv
         |  FROM (SELECT a$i.list_id, u.pos,
         |          sum(CAST(round(u.x * 1000000, 0) AS BIGINT)) AS sx,
         |          count(*) AS n
         |        FROM a$i JOIN train USING (vec_id),
         |          LATERAL (SELECT unnest(train.v) AS x,
         |                          generate_subscripts(train.v, 1) AS pos) u
         |        GROUP BY 1, 2) a
         |  GROUP BY 1),
         |c$i AS MATERIALIZED (
         |  SELECT p.cent_id, coalesce(m.mv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN m$i m USING (cent_id))"""
    }
    s"""WITH ${nbCte}corpus AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |hord AS MATERIALIZED (
       |  SELECT vec_id, v, row_number() OVER (ORDER BY h, vec_id) AS rn
       |  FROM (SELECT corpus.*, $hash AS h FROM corpus)),
       |train AS MATERIALIZED (SELECT vec_id, v FROM hord WHERE rn <= $capSql),
       |c0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id,
       |         v AS cv
       |  FROM hord WHERE rn <= $kSql),
       |${(1 to iters).map(iterStage).mkString(",\n")},
       |fin AS MATERIALIZED (SELECT cent_id, cv FROM c$iters)"""
  }

  /** Generated DuckDB oracle for [[annIvf]] (r7 promotion): the full
    * IVF pipeline — Lloyd training ([[ivfSqlPrefix]]), corpus
    * assignment, nProbe=4 probing and the exact-cosine top-5 — replays
    * bit-for-bit; ties rank by descending cent_id exactly like
    * [[topCents]]'s reversed struct sort. */
  val annIvfSql: String =
    s"""${ivfSqlPrefix(nLists = 16, iters = 3)},
       |assigned AS (
       |  SELECT vec_id, cent_id AS list_id
       |  FROM (SELECT corpus.vec_id, f.cent_id,
       |          row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |            ${ivfCos("corpus.v", "f.cv")} DESC, f.cent_id DESC) AS rk
       |        FROM corpus CROSS JOIN fin f)
       |  WHERE rk = 1),
       |qprobe AS (
       |  SELECT vec_id AS q_id, cent_id AS probe_list
       |  FROM (SELECT corpus.vec_id, f.cent_id,
       |          row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |            ${ivfCos("corpus.v", "f.cv")} DESC, f.cent_id DESC) AS rk
       |        FROM corpus CROSS JOIN fin f
       |        WHERE corpus.vec_id < 8)
       |  WHERE rk <= 4),
       |scored AS (
       |  SELECT p.q_id, a.vec_id, ${ivfCos("qc.v", "cc.v")} AS cosine
       |  FROM qprobe p
       |  JOIN assigned a ON a.list_id = p.probe_list AND a.vec_id <> p.q_id
       |  JOIN corpus qc ON qc.vec_id = p.q_id
       |  JOIN corpus cc ON cc.vec_id = a.vec_id),
       |ranked AS (SELECT q_id, vec_id, cosine,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, vec_id, cosine FROM ranked WHERE rnk <= $AnnK
       |ORDER BY q_id, rnk""".stripMargin

  // ---- Product quantization (IVF-PQ) --------------------------------

  /** The m-th subvector (dsub dims) of a vector column. */
  private def subv(v: Column, m: Int, dsub: Int): Column =
    slice(v, m * dsub + 1, dsub)

  /** Index (into `cents`, positional) of the L2-nearest centroid:
    * ascending struct sort on (‖x−c‖² expanded as ‖x‖²−2⟨x,c⟩+‖c‖²,
    * id); ‖x‖² is common to all candidates so it is dropped. */
  private def l2NearestId(cents: Array[Centroid], x: Column): Column =
    array_sort(array(cents.toSeq.map { c =>
      struct((lit(c.norm * c.norm) - lit(2.0) * dot(x, typedLit(c.v.toSeq))).as("d"),
        lit(c.id).as("cent_id"))
    }: _*))(0)("cent_id")

  /** Per-subspace PQ codebooks: an independent L2 Lloyd run on each of
    * the `m` dsub-dimensional slices of a bounded training sample.
    * Same determinism contract as [[kmeansCentroids]]: hash-ordered
    * sample, MICRO-UNIT integer means (round(x·1e6) long sums,
    * floor(sx/n)/1e6 — exact under any partitioning AND bit-replayable
    * in the DuckDB oracle, the ivfSqlPrefix recipe), only
    * m × ksub × dsub doubles reach the driver. Empty clusters keep
    * their previous centroid. */
  private[graft] def pqCodebooks(c: DataFrame, m: Int, dsub: Int, ksub: Int,
    iters: Int, trainCap: Int = 2048): Array[Array[Centroid]] = {
    val byHash = c.orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val train = byHash.limit(trainCap)
    val seeds = byHash.limit(ksub).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    (0 until m).toArray.map { sub =>
      var cents = toCentroids(seeds.map(_.slice(sub * dsub, (sub + 1) * dsub)))
      for (_ <- 1 to iters) {
        val means = train
          .select(subv(col("v"), sub, dsub).as("x"))
          .withColumn("code", l2NearestId(cents, col("x")))
          .select(col("code"), posexplode(col("x")).as(Seq("pos", "xi")))
          .groupBy(col("code"), col("pos"))
          .agg(sum(round(col("xi") * 1e6, 0).cast("long")).as("sx"),
            count(lit(1)).as("n"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (id, rows) =>
            id -> rows.sortBy(_.getInt(1))
              .map(r => math.floor(r.getLong(2).toDouble / r.getLong(3)) / 1e6)
          }
        cents = toCentroids(cents.map(c => means.getOrElse(c.id, c.v)))
      }
      cents
    }
  }

  private val codebookCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int), Array[Array[Centroid]]]()

  /** Drop cached PQ codebooks (after overwriting a corpus path). */
  def clearCodebookCache(): Unit = codebookCache.clear()

  /** IVF-PQ: the 100 TB MEMORY path. The corpus is stored as m = 8
    * one-byte codes per vector (64 float64 dims → 8 bytes, 64:1
    * against float32) plus its coarse IVF list; a query probes nProbe
    * lists, scores candidates by ASYMMETRIC DISTANCE COMPUTATION —
    * ⟨q, recon(v)⟩ = Σₘ ⟨q⁽ᵐ⁾, codebookₘ[codeₘ]⟩ against the full-
    * precision query — and only the top `rerank` ADC survivors per
    * query are re-scored with exact cosine on the raw vectors
    * (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011). At scale the raw-vector re-rank join
    * touches rerank × queries rows — the full corpus is read once to
    * ENCODE, then queries run entirely on the 8-byte codes.
    *
    * Everything is plan-literal column arithmetic: encode = m
    * L2-argmins over 16-entry literal codebooks, ADC = m table
    * lookups (element_at on a 2-D literal) + subvector dots; the
    * reconstruction norm ‖recon(v)‖² = Σₘ ‖codebookₘ[codeₘ]‖² is
    * computed once at encode time from a literal norm table. */
  def annIvfPq(s: SparkSession, d: String, nQueries: Int = 8, k: Int = AnnK,
    nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
    kmeansIters: Int = 3, rerank: Int = 24): DataFrame = {
    val dsub = 64 / m
    val c = corpus(s, d)
    val cents = Option(centroidCache.get((d, nLists, kmeansIters))).getOrElse {
      val t = kmeansCentroids(c, nLists, kmeansIters)
      val prior = centroidCache.putIfAbsent((d, nLists, kmeansIters), t)
      if (prior != null) prior else t
    }
    val key = (d, m, ksub, kmeansIters)
    val books = Option(codebookCache.get(key)).getOrElse {
      val t = pqCodebooks(c, m, dsub, ksub, kmeansIters)
      val prior = codebookCache.putIfAbsent(key, t)
      if (prior != null) prior else t
    }

    // encode once: coarse list + m codes + reconstruction norm²
    val codeCols = (0 until m).map(sub =>
      l2NearestId(books(sub), subv(col("v"), sub, dsub)).as(s"code$sub"))
    val encoded = c
      .withColumn("list_id", topCents(cents, col("v"), 1)(0)("cent_id"))
      .select(col("vec_id") +: col("list_id") +: codeCols: _*)
      .select(col("vec_id"), col("list_id"),
        array((0 until m).map(sub => col(s"code$sub")): _*).as("codes"),
        (0 until m).map { sub =>
          element_at(typedLit(books(sub).map(c => c.norm * c.norm).toSeq),
            col(s"code$sub") + 1)
        }.reduce(_ + _).as("recon2"))

    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(topCents(cents, col("v"), nProbe)("cent_id")).as("probe_list"))

    // ADC: Σₘ ⟨q⁽ᵐ⁾, codebookₘ[codeₘ]⟩ — table lookups on 2-D literals
    val adcDot = (0 until m).map { sub =>
      dot(subv(col("qv"), sub, dsub),
        element_at(typedLit(books(sub).map(_.v.toSeq).toSeq),
          element_at(col("codes"), sub + 1) + 1))
    }.reduce(_ + _)
    val adc = encoded.join(broadcast(q),
        col("list_id") === col("probe_list") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (adcDot / (norm(col("qv")) * sqrt(col("recon2")))).as("adc_cos"))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_cos").desc, col("vec_id"))
    val shortlist = adc.withColumn("arnk", row_number().over(wAdc))
      .filter(col("arnk") <= rerank)
      .select(col("q_id"), col("vec_id"))

    // exact re-rank of the shortlist only (raw vectors re-join here)
    val exact = shortlist
      .join(c, "vec_id")
      .join(broadcast(c.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))), "q_id")
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Generated DuckDB oracle for [[annIvfPq]] (r8 promotion — the
    * last ANN-family rows-only op): [[ivfSqlPrefix]]'s coarse Lloyd
    * replay extends to the m=8 per-subspace PQ codebooks. Each
    * codebook is an independent L2 Lloyd run on the SAME hash-ordered
    * training draw (seeds = `c0` sliced per subspace — ksub equals the
    * coarse nLists, so the seed rows coincide); assignments order by
    * ascending (‖c‖² − 2⟨x,c⟩, cent_id) exactly like [[l2NearestId]]'s
    * struct sort (‖c‖² replays as sqrt(Σc²)·sqrt(Σc²) — the literal is
    * the driver's norm·norm, sqrt-then-square, NOT Σc² itself); means
    * are the micro-unit integer recipe shared with the coarse run.
    * Encoding, ADC (left-assoc subspace-dot sum over the codebook
    * rows, ÷ ‖q‖·√recon²) and the exact top-`rerank` re-rank are all
    * deterministic data arithmetic, so the final card replays
    * bit-for-bit. Every multiply-referenced CTE is MATERIALIZED (the
    * graph_kcore exponential-inline lesson). */
  val annIvfPqSql: String = {
    val (m, dsub, iters, nProbe, rerank) = (8, 8, 3, 4, 24)
    def lo(sub: Int) = sub * dsub + 1
    def hi(sub: Int) = (sub + 1) * dsub
    def ldp(a: String, b: String) = s"list_dot_product($a, $b)"
    def nrm2(v: String) = s"sqrt(${ldp(v, v)}) * sqrt(${ldp(v, v)})"
    def l2(x: String, cv: String) = s"${nrm2(cv)} - 2.0 * ${ldp(x, cv)}"

    def subStages(sub: Int): String = {
      val slices =
        s"""ps$sub AS MATERIALIZED (
           |  SELECT vec_id, v[${lo(sub)}:${hi(sub)}] AS x FROM train),
           |pb${sub}_0 AS MATERIALIZED (
           |  SELECT cent_id, cv[${lo(sub)}:${hi(sub)}] AS cv FROM c0)"""
      val its = (1 to iters).map { i =>
        val prev = s"pb${sub}_${i - 1}"
        s"""pa${sub}_$i AS (
           |  SELECT vec_id, cent_id AS code
           |  FROM (SELECT t.vec_id, c.cent_id,
           |          row_number() OVER (PARTITION BY t.vec_id ORDER BY
           |            ${l2("t.x", "c.cv")} ASC, c.cent_id ASC) AS rk
           |        FROM ps$sub t CROSS JOIN $prev c)
           |  WHERE rk = 1),
           |pm${sub}_$i AS (
           |  SELECT code AS cent_id,
           |         list(floor(sx / n) / 1000000.0 ORDER BY pos) AS mv
           |  FROM (SELECT a.code, u.pos,
           |          sum(CAST(round(u.xi * 1000000, 0) AS BIGINT)) AS sx,
           |          count(*) AS n
           |        FROM pa${sub}_$i a JOIN ps$sub t USING (vec_id),
           |          LATERAL (SELECT unnest(t.x) AS xi,
           |                          generate_subscripts(t.x, 1) AS pos) u
           |        GROUP BY 1, 2) s
           |  GROUP BY 1),
           |pb${sub}_$i AS MATERIALIZED (
           |  SELECT p.cent_id, coalesce(mm.mv, p.cv) AS cv
           |  FROM $prev p LEFT JOIN pm${sub}_$i mm USING (cent_id))"""
      }
      (slices +: its).mkString(",\n")
    }

    val encodes = (0 until m).map { sub =>
      s"""pe$sub AS MATERIALIZED (
         |  SELECT vec_id, cent_id AS code
         |  FROM (SELECT corpus.vec_id, c.cent_id,
         |          row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
         |            ${l2(s"corpus.v[${lo(sub)}:${hi(sub)}]", "c.cv")} ASC,
         |            c.cent_id ASC) AS rk
         |        FROM corpus CROSS JOIN pb${sub}_$iters c)
         |  WHERE rk = 1)"""
    }.mkString(",\n")

    val encCodeCols = (0 until m).map(s => s"e$s.code AS code$s").mkString(", ")
    val encJoins = (0 until m).map(s =>
      s"JOIN pe$s e$s ON e$s.vec_id = corpus.vec_id").mkString("\n|  ")
    val reconSum = (0 until m).map(s => nrm2(s"cb$s.cv")).mkString(" + ")
    val cbJoinsEnc = (0 until m).map(s =>
      s"JOIN pb${s}_$iters cb$s ON cb$s.cent_id = e$s.code").mkString("\n|  ")
    val adcSum = (0 until m).map(s =>
      ldp(s"qc.v[${lo(s)}:${hi(s)}]", s"cb$s.cv")).mkString("\n|      + ")
    val cbJoinsAdc = (0 until m).map(s =>
      s"JOIN pb${s}_$iters cb$s ON cb$s.cent_id = en.code$s").mkString("\n|  ")

    s"""${ivfSqlPrefix(nLists = 16, iters = iters)},
       |${(0 until m).map(subStages).mkString(",\n")},
       |$encodes,
       |passign AS (
       |  SELECT vec_id, cent_id AS list_id
       |  FROM (SELECT corpus.vec_id, f.cent_id,
       |          row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |            ${ivfCos("corpus.v", "f.cv")} DESC, f.cent_id DESC) AS rk
       |        FROM corpus CROSS JOIN fin f)
       |  WHERE rk = 1),
       |encoded AS MATERIALIZED (
       |  SELECT corpus.vec_id, a.list_id, $encCodeCols,
       |    ($reconSum) AS recon2
       |  FROM corpus
       |  JOIN passign a ON a.vec_id = corpus.vec_id
       |  $encJoins
       |  $cbJoinsEnc),
       |qprobe AS (
       |  SELECT vec_id AS q_id, cent_id AS probe_list
       |  FROM (SELECT corpus.vec_id, f.cent_id,
       |          row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |            ${ivfCos("corpus.v", "f.cv")} DESC, f.cent_id DESC) AS rk
       |        FROM corpus CROSS JOIN fin f
       |        WHERE corpus.vec_id < 8)
       |  WHERE rk <= $nProbe),
       |padc AS (
       |  SELECT p.q_id, en.vec_id,
       |    ($adcSum)
       |      / (sqrt(${ldp("qc.v", "qc.v")}) * sqrt(en.recon2)) AS adc_cos
       |  FROM qprobe p
       |  JOIN encoded en ON en.list_id = p.probe_list AND en.vec_id <> p.q_id
       |  JOIN corpus qc ON qc.vec_id = p.q_id
       |  $cbJoinsAdc),
       |pshort AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY adc_cos DESC, vec_id) AS arnk
       |    FROM padc) t
       |  WHERE arnk <= $rerank),
       |pexact AS (
       |  SELECT s.q_id, s.vec_id, ${ivfCos("qc.v", "cc.v")} AS cosine
       |  FROM pshort s
       |  JOIN corpus qc ON qc.vec_id = s.q_id
       |  JOIN corpus cc ON cc.vec_id = s.vec_id),
       |pranked AS (SELECT q_id, vec_id, cosine,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM pexact)
       |SELECT q_id, rnk, vec_id, cosine FROM pranked WHERE rnk <= $AnnK
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Per-label embedding centroids — the vector-column GROUP BY every
    * embedding pipeline runs (class prototypes, k-means init, drift
    * monitoring). The vector column explodes to (label, dim, value)
    * and aggregates per (label, dim): fully partial-aggregable, no
    * vector ever collected whole, state per group is one running
    * (sum, count) — the shape that holds at billions of vectors where
    * a collect-and-average would not. Output is the long form (one
    * row per dimension); re-collecting to arrays is a presentation
    * step downstream. Means rounded to 6dp: double sums drift only in
    * the last bits across partitionings/engines. */
  def embCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(round(avg(col("v")), 6).as("mean_val"), count(lit(1)).as("vec_ct"))
      .orderBy(col("label"), col("dim"))

  val embCentroidsSql: String =
    """SELECT label, i AS dim, round(avg(v), 6) AS mean_val,
      |  CAST(count(*) AS BIGINT) AS vec_ct
      |FROM (
      |  SELECT label, unnest(embedding) AS v,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings)
      |GROUP BY label, i
      |ORDER BY label, dim""".stripMargin

  /** Per-label embedding OUTLIER flags — the corrupted-vector /
    * mislabeled-row filter every embedding pipeline runs before
    * training: distance of each vector to its label centroid,
    * standardized within the label, |z| > 2 flagged.
    *
    * Engine-exactness: the centroid is [[embCentroids]]'s 6-dp ROUNDED
    * mean (both engines share exact inputs); each distance is one
    * in-row ascending-dim fold, then quantized to integer MICRO-UNITS,
    * so the per-label moment sums are exact integers under any
    * partitioning and z = (n·d − s) / √(n·ss − s²) is a fixed IEEE
    * sequence on exact operands (the variance arithmetic rides
    * DECIMAL(38,0) — n·ss overflows a long at corpus scale).
    * Shuffle profile: one (label, dim) rollup, one label rollup, one
    * broadcast-sized join back — the corpus is scanned twice. */
  def embOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val cents = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p("m")).as("c"))
    val dist = sqrt(aggregate(
      zip_with(col("v"), col("c"), (x, m) => (x - m) * (x - m)),
      lit(0.0), (a, x) => a + x))
    val withD = emb.join(cents, "label")
      .select(col("vec_id"), col("label"),
        round(dist * 1000000.0, 0).cast("long").as("du"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val moments = withD.groupBy(col("label")).agg(
      count(lit(1)).as("n"), sum(col("du")).as("s"),
      sum(dec(col("du")) * dec(col("du"))).as("ss"))
    // a degenerate label (one vector, or all distances equal) has zero
    // variance: guard the division explicitly so z is NULL by RULE in
    // both engines — unguarded, Spark's non-ANSI Divide gives NULL but
    // recent DuckDB (ieee_floating_point_ops) gives NaN/±inf, and the
    // hash compare would break on the first degenerate label
    val variance = dec(col("n")) * col("ss") - dec(col("s")) * dec(col("s"))
    withD.join(moments, "label")
      .select(col("vec_id"), col("label"),
        round(col("du").cast("double") / 1000000.0, 6).as("dist"),
        when(variance > 0,
          round((dec(col("n")) * dec(col("du")) - dec(col("s"))).cast("double") /
            sqrt(variance.cast("double")), 6)).as("z"))
      .withColumn("is_outlier", (abs(col("z")) > 2.0).cast("int"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the same rounded centroid, micro-unit quantization and
    * integer moments (HUGEINT natively exact in DuckDB). */
  val embOutliersSql: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cm AS (
      |  SELECT label, i AS pos, round(avg(x), 6) AS m
      |  FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e)
      |  GROUP BY label, i),
      |cents AS (
      |  SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY label),
      |wd AS (
      |  SELECT vec_id, e.label,
      |    CAST(round(sqrt(list_reduce(
      |      [0.0] || [(v[i] - c[i]) * (v[i] - c[i]) for i in range(1, len(v) + 1)],
      |      (a, x) -> a + x
      |    )) * 1000000, 0) AS BIGINT) AS du
      |  FROM e JOIN cents ON e.label = cents.label),
      |mo AS (
      |  SELECT label, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(du) AS HUGEINT) AS s,
      |    sum(CAST(du AS HUGEINT) * CAST(du AS HUGEINT)) AS ss
      |  FROM wd GROUP BY label)
      |SELECT vec_id, wd.label,
      |  round(CAST(du AS DOUBLE) / 1000000.0, 6) AS dist,
      |  CASE WHEN n * ss - s * s > 0 THEN
      |    round(CAST(n * CAST(du AS HUGEINT) - s AS DOUBLE) /
      |          sqrt(CAST(n * ss - s * s AS DOUBLE)), 6) END AS z,
      |  CAST(abs(CASE WHEN n * ss - s * s > 0 THEN
      |    round(CAST(n * CAST(du AS HUGEINT) - s AS DOUBLE) /
      |          sqrt(CAST(n * ss - s * s AS DOUBLE)), 6) END) > 2.0 AS INTEGER) AS is_outlier
      |FROM wd JOIN mo ON wd.label = mo.label
      |ORDER BY vec_id""".stripMargin

  /** Top principal component of the embedding corpus — the whitening /
    * all-but-the-top (Mu & Viswanath, ICLR'18) / drift-monitoring
    * primitive. The distributed part is ONE scan aggregating two
    * native [[graft.functions.VecSumAgg]] partials: Σx (dim doubles)
    * and the flattened Σxxᵀ (dim² doubles, the outer product built
    * in-row by codegen'd nested `transform`s) — per-partition state is
    * dim+dim² doubles, mergeable map-side, so a billion-vector corpus
    * ships ~33 KB per partition and exactly one bounded row to the
    * driver (the HLL/centroid contract). The driver then runs the
    * O(dim²·iters) power iteration on the dim×dim covariance — never
    * distributed because it is microscopic next to the scan. Sign
    * convention: the largest-|loading| component is positive. */
  def embPca(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pcaBasis(s, d) match {
      case None =>
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "component BIGINT, dim BIGINT, loading DOUBLE, var_share DOUBLE"))
      case Some(basis) =>
        def emit(component: Long, x: Array[Double], lambda: Double) = {
          val k = x.indices.maxBy(i => math.abs(x(i)))
          val signed = if (x(k) < 0) x.map(v => -v) else x
          val share = if (basis.trace > 0) lambda / basis.trace else 0.0
          signed.zipWithIndex.map { case (l, i) =>
            (component, (i + 1).toLong, round6(l), round6(share))
          }.toSeq
        }
        basis.components.zipWithIndex
          .flatMap { case ((v, lambda), i) => emit(i + 1L, v, lambda) }
          .toDF("component", "dim", "loading", "var_share")
          .orderBy(col("component"), col("dim"))
    }
  }

  /** The driver-side PCA basis shared by [[embPca]] and [[embWhiten]]:
    * corpus mean, the top two (component, Rayleigh λ) pairs, and the
    * covariance trace. None on an empty corpus. */
  private[operators] final case class PcaBasis(mu: Array[Double],
    components: Seq[(Array[Double], Double)], trace: Double)

  private[operators] def pcaBasis(s: SparkSession, d: String): Option[PcaBasis] = {
    graft.Graft.registerFunctions(s)
    // Inputs quantize to integer MICRO-UNITS before the moment scan, so
    // Σqx and Σqxqxᵀ are exact integers (well under 2^53 at test SFs)
    // and therefore identical under ANY partitioning / merge order —
    // the same order-free-determinism trick as [[embRpProject]] and
    // emb_outliers' integer moments. That exactness is what lets the
    // emb_whiten DuckDB oracle recompute the SAME covariance (HUGEINT
    // sums) and replay the power iteration bit-for-bit.
    val emb = Tables.embeddings(s, d)
      .select(transform(col("embedding").cast("array<double>"),
        x => round(x * 1000000.0, 0)).as("v"))
    val outer = flatten(transform(col("v"), x => transform(col("v"), y => x * y)))
    val row = emb.agg(
      call_function("graft_vec_sum", col("v")).as("sv"),
      call_function("graft_vec_sum", outer).as("so"),
      count(lit(1)).as("n")).head()
    val sv = row.getSeq[Double](0).toArray
    val so = row.getSeq[Double](1).toArray
    val n = row.getLong(2).toDouble
    val dim = sv.length
    if (dim == 0) return None
    val mu = sv.map(t => t / n / 1000000.0)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      (so(i * dim + j) / n - (sv(i) / n) * (sv(j) / n)) / 1000000000000.0)
    // deterministic LCG start: a UNIFORM start is exactly orthogonal to
    // any eigenvector whose components sum to zero (e.g. anti-correlated
    // dim pairs), stalling the iteration at the start vector; a fixed
    // pseudo-random direction has nonzero overlap with any eigenvector
    // that isn't adversarially tuned to this seed. Each component gets
    // its own seed so the deflated iteration does not start parallel to
    // the component it must be orthogonal to.
    def lcgStart(seed: Long): Array[Double] = {
      val x = Array.tabulate(dim) { i =>
        (((i + 1) * 6364136223846793005L + seed) >>> 11).toDouble
      }
      val nrm = math.sqrt(x.map(v => v * v).sum)
      x.map(_ / nrm)
    }
    // power iteration on `m`, re-orthogonalized against `against` every
    // step (belt over the deflation's braces: floating-point drift back
    // toward the dominant direction is projected out before it grows)
    def powerIter(m: Array[Array[Double]], start: Array[Double],
        against: Seq[Array[Double]]): Array[Double] = {
      def orth(v: Array[Double]): Array[Double] = {
        var r = v
        against.foreach { u =>
          val p = r.zip(u).map { case (a, b) => a * b }.sum
          r = r.zip(u).map { case (a, b) => a - p * b }
        }
        r
      }
      var x = orth(start)
      val n0 = math.sqrt(x.map(v => v * v).sum)
      if (n0 > 0) x = x.map(_ / n0)
      for (_ <- 1 to 200) {
        val y = orth(Array.tabulate(dim) { i =>
          var t = 0.0; var j = 0
          while (j < dim) { t += m(i)(j) * x(j); j += 1 }
          t
        })
        val nrm = math.sqrt(y.map(v => v * v).sum)
        if (nrm > 0) x = y.map(_ / nrm)
      }
      x
    }
    def rayleigh(m: Array[Array[Double]], x: Array[Double]): Double =
      (0 until dim).map { i =>
        x(i) * (0 until dim).map(j => m(i)(j) * x(j)).sum
      }.sum
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val v1 = powerIter(cov, lcgStart(1442695040888963407L), Nil)
    val lambda1 = rayleigh(cov, v1)
    // one deflation step: component 2 is the dominant direction of
    // cov − λ₁·v₁v₁ᵀ (the all-but-the-top recipe removes the top D
    // components; this is the same single-scan Σx/Σxxᵀ — no new
    // distributed work, just O(dim²) more driver arithmetic)
    val deflated = Array.tabulate(dim, dim)((i, j) => cov(i)(j) - lambda1 * v1(i) * v1(j))
    val v2 = powerIter(deflated, lcgStart(-8723657262896443283L), Seq(v1))
    val lambda2 = rayleigh(cov, v2)
    Some(PcaBasis(mu, Seq((v1, lambda1), (v2, lambda2)), trace))
  }

  /** All-but-the-top WHITENING (Mu & Viswanath, ICLR'18) — the
    * embedding post-processing step the [[embPca]] doc cites: subtract
    * the corpus mean and remove the projection onto the top two
    * principal components, which concentrates similarity signal by
    * deleting the dominant common directions. The basis comes from the
    * shared single-scan [[pcaBasis]]; the projection pass is ONE more
    * corpus scan with μ and the components riding as PLAN LITERALS —
    * per-row in-row arithmetic (native graft_dot for each projection
    * coefficient, zip_with for the subtraction), zero shuffles, so the
    * 100 TB cost is two scans total. Because v₁ ⊥ v₂, both
    * coefficients project the SAME centered vector — no sequential
    * dependency between the removals. Elements round to 6dp (the
    * centroid determinism contract); declared rows-only (a power
    * iteration is not SQL-expressible), spec-verified against planted
    * ground truth. */
  def embWhiten(s: SparkSession, d: String): DataFrame = {
    pcaBasis(s, d) match {
      case None =>
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "vec_id BIGINT, pos BIGINT, val DOUBLE"))
      case Some(basis) =>
        val Seq((v1, _), (v2, _)) = basis.components
        // basis rides as 6dp-rounded plan literals (exact-binary
        // HALF_UP, the same rule as SQL round) — belt over the oracle's
        // bit-identical iteration replay: a last-ulp divergence in the
        // basis would be absorbed by the rounding before projection
        def r6(a: Array[Double]): Seq[Double] = a.toSeq.map(round6)
        val muL = typedLit(r6(basis.mu))
        val u1L = typedLit(r6(v1))
        val u2L = typedLit(r6(v2))
        corpus(s, d)
          .withColumn("c", zip_with(col("v"), muL, (x, m) => x - m))
          .withColumn("p1", call_function("graft_dot", col("c"), u1L))
          .withColumn("p2", call_function("graft_dot", col("c"), u2L))
          .select(col("vec_id"), posexplode(
            zip_with(
              zip_with(col("c"), u1L, (x, u) => x - col("p1") * u),
              u2L, (x, u) => round(x - col("p2") * u, 6))).as(Seq("p0", "val")))
          .select(col("vec_id"), (col("p0") + 1).cast("long").as("pos"), col("val"))
          .orderBy(col("vec_id"), col("pos"))
    }
  }

  /** Exact-binary HALF_UP 6dp rounding — the same rule as Spark's and
    * DuckDB's `round(x, 6)`, used wherever the driver bakes basis
    * values into plan literals or result rows that an oracle must
    * reproduce. */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** DuckDB replay of [[pcaBasis]], shared by the [[embWhitenSql]] and
    * [[embPcaSql]] oracles — the full basis derivation, bit-for-bit:
    * (1) the micro-unit quantized moment sums are exact HUGEINTs, so
    * they equal Spark's order-free integer sums no matter how either
    * engine parallelizes; (2) the covariance entries divide the same
    * exact integers in the same expression order, giving bit-identical
    * doubles; (3) the 200-step power iteration (and the deflated,
    * re-orthogonalized second component) runs as a recursive CTE whose
    * per-step arithmetic — `list_dot_product` matrix rows,
    * `list_reduce` norms — folds in the same ascending index order as
    * the driver's while-loops, so after 200 identical IEEE steps both
    * engines hold the same basis. One-element list comprehensions
    * (`for y in [expr]`) bind intermediates, mirroring the Spark-side
    * one-element-array lambda trick. Ends after the `v2t` CTE; append
    * further CTEs with a leading comma. */
  private val BasisDim = 64
  private val basisRng = s"range(1, ${BasisDim + 1})"
  private def basisRayleigh(m: String, x: String): String =
    s"list_reduce([0.0] || [$x[i] * list_dot_product($m[i], $x) " +
      s"for i in $basisRng], (a,b) -> a+b)"
  private val basisSqlPrefix: String = {
    val dim = BasisDim
    val m64 = "18446744073709551616"
    // unsigned-64 wrap of ((i)*LCG_MULT + seed) >>> 11, in HUGEINT
    def lcg(seedUnsigned: java.math.BigInteger): String =
      s"[CAST(CAST((((i * 6364136223846793005::HUGEINT) + $seedUnsigned::HUGEINT) " +
        s"% $m64::HUGEINT + $m64::HUGEINT) % $m64::HUGEINT // 2048 AS BIGINT) AS DOUBLE) " +
        s"for i in range(1, ${dim + 1})]"
    def unsigned(seed: Long): java.math.BigInteger = {
      val b = java.math.BigInteger.valueOf(seed)
      if (b.signum() < 0) b.add(java.math.BigInteger.TWO.pow(64)) else b
    }
    def norm(x: String): String =
      s"sqrt(list_reduce([0.0] || [t*t for t in $x], (a,b) -> a+b))"
    def mv(m: String, x: String): String =
      s"[list_dot_product($m[i], $x) for i in range(1, ${dim + 1})]"
    def orth1(r: String, u: String): String =
      s"[[$r[i] - p * $u[i] for i in range(1, ${dim + 1})] " +
        s"for p in [list_dot_product($r, $u)]][1]"
    def step(m: String, x: String, againstU: Option[String]): String = {
      val y0 = mv(m, x)
      val y = againstU.map(u => orth1("y0", u)).getOrElse("y0")
      val body = s"[CASE WHEN ${norm("y")} > 0 THEN [t / ${norm("y")} for t in y] " +
        s"ELSE $x END for y in [$y]][1]"
      s"[$body for y0 in [$y0]][1]"
    }
    val start1 = s"[t / ${norm("s0")} for t in s0]"
    val start2 = s"[CASE WHEN ${norm("xo")} > 0 THEN [t / ${norm("xo")} for t in xo] " +
      s"ELSE xo END for xo in [${orth1("s0", "v1")}]][1]"
    val rng = basisRng
    s"""WITH RECURSIVE
       |q AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000, 0)) AS qx
       |  FROM embeddings),
       |cells AS (
       |  SELECT vec_id, unnest(qx) AS x, generate_subscripts(qx, 1) AS i FROM q),
       |sums AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j,
       |         sum(CAST(a.x AS HUGEINT) * CAST(b.x AS HUGEINT)) AS so
       |  FROM cells a JOIN cells b USING (vec_id)
       |  GROUP BY a.i, b.i),
       |svt AS MATERIALIZED (
       |  SELECT list(sv ORDER BY i) AS sv, CAST(max(n) AS DOUBLE) AS n FROM (
       |    SELECT i, sum(CAST(x AS HUGEINT)) AS sv, count(*) AS n FROM cells GROUP BY i)),
       |covm AS MATERIALIZED (
       |  SELECT list(r ORDER BY i) AS m FROM (
       |    SELECT i, list((CAST(so AS DOUBLE) / s.n
       |                    - (CAST(s.sv[i] AS DOUBLE) / s.n) * (CAST(s.sv[j] AS DOUBLE) / s.n))
       |                   / 1000000000000.0 ORDER BY j) AS r
       |    FROM sums, svt s GROUP BY i)),
       |it1(k, x) AS (
       |  SELECT 0, $start1 FROM (SELECT ${lcg(unsigned(1442695040888963407L))} AS s0)
       |  UNION ALL
       |  SELECT k + 1, ${step("m", "x", None)} FROM it1, covm WHERE k < 200),
       |v1t AS MATERIALIZED (SELECT x AS v1 FROM it1 WHERE k = 200),
       |dft AS MATERIALIZED (
       |  SELECT [[m[i][j] - l1 * v1[i] * v1[j] for j in $rng] for i in $rng] AS dm, v1
       |  FROM (SELECT m, v1, ${basisRayleigh("m", "v1")} AS l1 FROM covm, v1t)),
       |it2(k, x) AS (
       |  SELECT 0, $start2 FROM (SELECT ${lcg(unsigned(-8723657262896443283L))} AS s0, v1 FROM v1t)
       |  UNION ALL
       |  SELECT k + 1, ${step("dm", "x", Some("v1"))} FROM it2, dft WHERE k < 200),
       |v2t AS MATERIALIZED (SELECT x AS v2 FROM it2 WHERE k = 200)""".stripMargin
  }

  /** Generated DuckDB oracle for [[embWhiten]]: the shared
    * [[basisSqlPrefix]] replay, then projection and 6dp rounding —
    * bit-identical by construction. */
  val embWhitenSql: String = {
    val rng = basisRng
    s"""$basisSqlPrefix,
       |basis AS MATERIALIZED (
       |  SELECT [round(t / 1000000.0, 6) for t in [CAST(s.sv[i] AS DOUBLE) / s.n for i in $rng]] AS mu6,
       |         [round(t, 6) for t in v1] AS u1,
       |         [round(t, 6) for t in v2] AS u2
       |  FROM svt s, v1t, v2t),
       |proj AS (
       |  SELECT vec_id, c, u1, u2,
       |         list_dot_product(c, u1) AS p1, list_dot_product(c, u2) AS p2
       |  FROM (SELECT vec_id, [v[i] - mu6[i] for i in $rng] AS c, u1, u2 FROM q, basis))
       |SELECT vec_id, CAST(pos AS BIGINT) AS pos, val FROM (
       |  SELECT vec_id,
       |         unnest([round((c[i] - p1 * u1[i]) - p2 * u2[i], 6) for i in $rng]) AS val,
       |         generate_subscripts(c, 1) AS pos
       |  FROM proj)
       |ORDER BY vec_id, pos""".stripMargin
  }

  /** Generated DuckDB oracle for [[embPca]] (r7 promotion from
    * rows-only): the shared [[basisSqlPrefix]] replay, then the same
    * Rayleigh quotients, trace shares, first-argmax sign
    * normalization, and 6dp rounding the driver applies — every step
    * mirrors the Scala expression order, so loadings and var shares
    * match bit-for-bit. */
  val embPcaSql: String = {
    val rng = basisRng
    s"""$basisSqlPrefix,
       |lam AS MATERIALIZED (
       |  SELECT ${basisRayleigh("m", "v1")} AS l1, ${basisRayleigh("m", "v2")} AS l2,
       |         list_reduce([0.0] || [m[i][i] for i in $rng], (a,b) -> a+b) AS tr
       |  FROM covm, v1t, v2t),
       |comps AS (
       |  SELECT 1 AS component, v1 AS x, l1 AS lambda FROM v1t, lam
       |  UNION ALL
       |  SELECT 2 AS component, v2 AS x, l2 AS lambda FROM v2t, lam),
       |signed AS (
       |  SELECT component,
       |    [[CASE WHEN x[k] < 0 THEN -x[i] ELSE x[i] END for i in $rng]
       |     for k in [list_position([abs(t) for t in x], list_max([abs(t) for t in x]))]][1] AS sx,
       |    CASE WHEN tr > 0 THEN lambda / tr ELSE 0.0 END AS share
       |  FROM comps, lam)
       |SELECT CAST(component AS BIGINT) AS component, CAST(i AS BIGINT) AS dim,
       |  round(sx[i], 6) AS loading, round(share, 6) AS var_share
       |FROM signed, (SELECT unnest($rng) AS i) r
       |ORDER BY component, dim""".stripMargin
  }

  /** SemDeDup — SEMANTIC deduplication by cluster-then-compare (Abbas
    * et al. 2023, arXiv:2303.09540): k-means partitions the embedding
    * space, and cosine comparison runs ONLY within a cluster, turning
    * the O(n²) semantic-near-dup search into Σ|cluster|² work — the
    * paper's exact recipe for LAION/web-scale corpora. Pairs at
    * cosine ≥ τ mark the larger vec_id dropped in favor of its
    * smallest qualifying partner (the engine-wide min-id survivor
    * convention; `dup_of` is that canonical partner, `max_cos` the
    * strongest similarity evidence).
    *
    * Shares the [[centroidCache]] IVF training (same (dir, k, iters)
    * key): a warehouse trains ONE coarse quantizer and serves both
    * ANN queries and the dedup pass from it. Scale shape: assignment
    * is plan-literal column arithmetic (no shuffle), the pair search
    * is ONE cluster-id equi-join with both sides hash-partitioned —
    * a hot cluster is an AQE skew-join case, not a plan change
    * (same contract as `emb_knn_graph_lsh`); the probe side fans each
    * vector to its `nProbe` nearest clusters (the IVF recall lever —
    * constant fan-out, and both pair orientations probe, so a pair is
    * recalled if EITHER end reaches the other's cluster). Clustering
    * only PRUNES candidates; the cosine test is exact, so false drops
    * are impossible — residual cross-cluster near-dups are the recall
    * trade the paper accepts (the spec measures 0.69 at a deliberately
    * loose tau=0.4 against the k=1 exact run; at SemDeDup's own ~0.95
    * operating point near-identical vectors share a nearest centroid).
    *
    * r7: fully oracle-checked — the micro-unit Lloyd means make the
    * whole training + probe pipeline SQL-replayable
    * ([[semanticDedupSql]]). */
  def semanticDedup(s: SparkSession, d: String, nClusters: Int = 16,
    tau: Double = 0.4, kmeansIters: Int = 3, nProbe: Int = 2,
    annMinK: Int = AnnAssignMinK): DataFrame = {
    val c = corpus(s, d)
    // derived cluster COUNT (r12 — the graph_kcore/knnGraphLsh
    // derived-k recipe): k = clamp(n/256, nClusters, MaxClusters), one
    // bounded count to the driver (which already runs the Lloyd loop). The
    // fixed k = 16 went quadratic in the r12 10×-independent sweep:
    // cluster SIZE grows with the corpus, and SemDeDup's within-cluster
    // candidate pairs grow with its square (27× at 10× data, warm).
    // Derived k pins expected cluster size at ~256, so candidates stay
    // ~nProbe·256·n = linear; at every gate SF (n ≤ 4095) the clamp
    // floors at nClusters = 16, so oracle outputs are unchanged there,
    // and the SQL oracle re-derives the same k from its own count.
    // trainCap scales with k (r13 — [[derivedTrainCap]], ~128 rows per
    // seed) so the 512 cap no longer starves the Lloyd sample; the
    // oracle re-derives the same cap from its own count.
    //
    // CLOSED CURVE (r12 measured 11.5× at 10×, 68× at 30× data):
    // candidates were linear but the centroid ASSIGN (topCents: k
    // cosines per row) was O(n·k) ≈ O(n^1.5) under derived k ≈ √n/16.
    // r13 replaces it past the guard with the ANN-assisted assign the
    // r12 note specified — graft_cent_assign buckets the ≤MaxClusters
    // centroids into ⌊64/w⌋ hyperplane band tables of w = derivedAssignWidth(k)
    // bits (expected occupancy k/2^w ≤ ~4, one 64-bit sig per row) and
    // each row probes its ⌊64/w⌋ buckets, taking exact cosines against
    // only the gathered candidates: ≤ ~100 dim-dots per row at any
    // derived k, linear in n.
    // Bucketing only PRUNES the assign's candidate set — pairs still
    // pass the exact cosine ≥ τ verify, so precision is untouched and
    // the only cost is assign recall (CentAssignSpec pins it vs the
    // exact path). BELOW the guard (k ≤ annMinK = 64, i.e. n ≤ 16384 —
    // every gate SF) the exact topCents path runs unchanged, so all
    // oracle outputs are bit-identical and the sig never appears in
    // audited plans.
    val k = Similarity.derivedClusters(c.count(), nClusters)
    val key = (d, k, kmeansIters)
    val cents = Option(centroidCache.get(key)).getOrElse {
      // training's assign goes through the bucketed probe past the
      // CONSTANT guard (never the annMinK test-override: forced-ANN
      // specs must swap the serving assign only, and every gate SF
      // trains exact + oracle-byte-identical). annAssign is a function
      // of k, so the (d, k, iters) cache key still fully determines
      // the trained centroids.
      val trained = kmeansCentroids(c, k, kmeansIters, derivedTrainCap(k),
        annAssign = k > AnnAssignMinK)
      val prior = centroidCache.putIfAbsent(key, trained)
      if (prior != null) prior else trained
    }
    val assigned = c.withColumn("nrm", norm(col("v")))
    val useAnn = k > annMinK
    def annIds(n: Int): Column = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CentAssign(
        org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
        cents.map(_.v.toIndexedSeq).toIndexedSeq,
        n, derivedAssignWidth(k),
        derivedAssignTables(derivedAssignWidth(k)), AssignSeed))
    // probe side fans each vector to its nProbe nearest clusters (the
    // IVF recall lever, constant fan-out); the build side keeps single
    // assignment, so a pair is caught iff cluster(j) ∈ probes(i) —
    // cluster(j) is unique per j, hence no duplicate candidates
    val left = assigned
      .withColumn("cluster",
        if (useAnn) explode(annIds(nProbe))
        else explode(topCents(cents, col("v"), nProbe)("cent_id")))
      .select(col("cluster"), col("vec_id").as("i"), col("v").as("vi"), col("nrm").as("ni"))
    val right = assigned
      .withColumn("cluster",
        // get() is null-safe on the (vanishingly rare) empty candidate
        // set — a null cluster drops from the equi-join, a recall-only
        // loss; the exact branch can never be empty (k ≥ 16)
        if (useAnn) get(annIds(1), lit(0))
        else topCents(cents, col("v"), 1)(0)("cent_id"))
      .select(col("cluster"), col("vec_id").as("j"), col("v").as("vj"), col("nrm").as("nj"))
    // past the guard, pin the pair join to a shuffle hash join: AQE's
    // size estimate flips the exploded probe side to a broadcast at
    // MID scale (measured r13: 10×-independent reads 4.6 s broadcast
    // vs 2.4 s shuffled at 30× on 3× the data — shipping the whole
    // vector-carrying probe side to every task is the slow shape),
    // and the two sides co-partition on the cluster key anyway. Below
    // the guard the plan is untouched (gate exchange counts pinned).
    val rightSide = if (useAnn) right.hint("shuffle_hash") else right
    val pairs = left.join(rightSide, "cluster")
      .filter(col("i") =!= col("j"))
      .select(least(col("i"), col("j")).as("i2"), greatest(col("i"), col("j")).as("j2"),
        (dot(col("vi"), col("vj")) / (col("ni") * col("nj"))).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("i2").as("i"), col("j2").as("j"))
      .agg(max(col("cos")).as("cos"))
    pairs.groupBy(col("j").as("vec_id"))
      .agg(min(col("i")).as("dup_of"), round(max(col("cos")), 6).as("max_cos"))
      .select(col("vec_id"), col("dup_of"), col("max_cos"))
      .orderBy(col("vec_id"))
  }

  /** Generated DuckDB oracle for [[semanticDedup]] (r7 promotion):
    * same trained centroids as [[annIvfSql]] ([[ivfSqlPrefix]] — the
    * shared centroidCache contract made literal), nProbe=2 probe
    * fan-out vs single assignment, exact cosine ≥ τ verify (dot and
    * norm products commute, so the least/greatest reorientation keeps
    * the doubles identical), min-partner / max-evidence rollup. */
  val semanticDedupSql: String =
    s"""${ivfSqlPrefix(nLists = 16, iters = 3, derivedK = true)},
       |simt AS MATERIALIZED (
       |  SELECT corpus.vec_id, f.cent_id,
       |    row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |      ${ivfCos("corpus.v", "f.cv")} DESC, f.cent_id DESC) AS rk
       |  FROM corpus CROSS JOIN fin f),
       |lft AS (SELECT vec_id AS i, cent_id AS cluster FROM simt WHERE rk <= 2),
       |rgt AS (SELECT vec_id AS j, cent_id AS cluster FROM simt WHERE rk = 1),
       |cand AS (
       |  SELECT least(i, j) AS i2, greatest(i, j) AS j2,
       |    ${ivfCos("a.v", "b.v")} AS cos
       |  FROM lft JOIN rgt USING (cluster)
       |  JOIN corpus a ON a.vec_id = i JOIN corpus b ON b.vec_id = j
       |  WHERE i <> j),
       |pr AS (SELECT i2 AS i, j2 AS j, max(cos) AS cos
       |       FROM cand WHERE cos >= 0.4 GROUP BY 1, 2)
       |SELECT j AS vec_id, min(i) AS dup_of, round(max(cos), 6) AS max_cos
       |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-DIMENSION embedding health card (mean / variance / range per
    * coordinate): the drift-and-degeneracy diagnostic run before
    * training or index builds — a collapsed dimension (zero variance),
    * a mean far off zero, or a blown-out range flags a broken encoder
    * or bad normalization. Cell-grain explode like [[embCentroids]]:
    * dim× fan-out but fully partial-aggregable, no whole-vector state.
    *
    * Engine-exactness: values quantize to integer MICRO-UNITS
    * (embOutliers' recipe), so n/Σq/Σq²/min/max are exact under any
    * partitioning (Σq² in DECIMAL(38,0)) and the final mean/variance
    * are fixed IEEE sequences on identical operands in both engines. */
  def embDimStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"),
        round(col("x") * 1000000.0, 0).cast("long").as("q"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(dec(col("q")) * dec(col("q"))).as("ss"),
        min(col("q")).as("mn"), max(col("q")).as("mx"))
      .select(col("dim"), col("n"),
        round(col("s").cast("double") / col("n") / 1000000.0, 6).as("mean_val"),
        round((dec(col("n")) * col("ss") - dec(col("s")) * dec(col("s"))).cast("double")
          / ((col("n") * col("n")).cast("double") * 1.0e12), 6).as("var_val"),
        (col("mn").cast("double") / 1000000.0).as("min_val"),
        (col("mx").cast("double") / 1000000.0).as("max_val"))
      .orderBy(col("dim"))
  }

  val embDimStatsSql: String =
    """WITH e AS (
      |  SELECT generate_subscripts(embedding, 1) AS dim,
      |    unnest(CAST(embedding AS DOUBLE[])) AS x
      |  FROM embeddings),
      |q AS (SELECT CAST(dim AS BIGINT) AS dim,
      |        CAST(round(x * 1000000, 0) AS BIGINT) AS q FROM e),
      |m AS (
      |  SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
      |    sum(CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))) AS ss,
      |    CAST(min(q) AS BIGINT) AS mn, CAST(max(q) AS BIGINT) AS mx
      |  FROM q GROUP BY dim)
      |SELECT dim, n,
      |  round(CAST(s AS DOUBLE) / n / 1000000, 6) AS mean_val,
      |  round(CAST(CAST(n AS DECIMAL(38,0)) * ss
      |             - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)) AS DOUBLE)
      |        / (CAST(n * n AS DOUBLE) * 1e12), 6) AS var_val,
      |  CAST(mn AS DOUBLE) / 1000000 AS min_val,
      |  CAST(mx AS DOUBLE) / 1000000 AS max_val
      |FROM m ORDER BY dim""".stripMargin

  /** INT8 scalar quantization with reconstruction-error accounting —
    * the memory path between raw f32 and [[annIvfPq]]'s 8-byte codes
    * (8:1 compression, the faiss `SQ8` / vector-DB default): each
    * dimension gets a symmetric scale from its corpus max-|x| (one
    * partial-aggregable stats pass, 64 rows, broadcast back), codes
    * clamp to [-127, 127], and every vector reports its reconstruction
    * MSE + worst-dim error + an exact integer code checksum (the
    * witness that pins the CODES, not just the error stats, to the
    * oracle).
    *
    * Engine-exactness: the scale is a raw `max(abs(x))` (no
    * arithmetic, bit-exact in both engines); code = round(x/s·127)
    * (two IEEE ops + half-away round on identical operands);
    * reconstruction errors quantize to integer micro-units so the
    * per-vector Σq² (DECIMAL(38,0)) is exact under any partitioning —
    * the [[embOutliers]] recipe. */
  def embQuantizeInt8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val cells = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"), col("x"))
    val scales = cells.groupBy(col("dim"))
      .agg(max(abs(col("x"))).as("amax"))
    val coded = cells.join(broadcast(scales), "dim")
      .withColumn("code",
        when(col("amax") > 0,
          greatest(lit(-127L), least(lit(127L),
            round(col("x") / col("amax") * 127.0, 0).cast("long"))))
          .otherwise(lit(0L)))
      .withColumn("err",
        round((col("x") - col("code").cast("double") * col("amax") / 127.0)
          * 1000000.0, 0).cast("long"))
    coded.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        round(sum(dec(col("err")) * dec(col("err"))).cast("double")
          / (count(lit(1)).cast("double") * 1.0e12), 9).as("mse"),
        (max(abs(col("err"))).cast("double") / 1000000.0).as("max_abs_err"),
        sum(col("code") * col("dim")).as("code_checksum"))
      .orderBy(col("vec_id"))
  }

  val embQuantizeInt8Sql: String =
    """WITH cells AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
      |    unnest(CAST(embedding AS DOUBLE[])) AS x
      |  FROM embeddings),
      |scales AS (SELECT dim, max(abs(x)) AS amax FROM cells GROUP BY dim),
      |coded AS (
      |  SELECT vec_id, c.dim, x, amax,
      |    CASE WHEN amax > 0 THEN
      |      greatest(-127, least(127, CAST(round(x / amax * 127, 0) AS BIGINT)))
      |    ELSE 0 END AS code
      |  FROM cells c JOIN scales USING (dim)),
      |errs AS (
      |  SELECT vec_id, dim, code,
      |    CAST(round((x - CAST(code AS DOUBLE) * amax / 127)
      |               * 1000000, 0) AS BIGINT) AS err
      |  FROM coded)
      |SELECT vec_id, count(*) AS n_dims,
      |  round(CAST(sum(CAST(err AS DECIMAL(38,0)) * CAST(err AS DECIMAL(38,0))) AS DOUBLE)
      |        / (CAST(count(*) AS DOUBLE) * 1e12), 9) AS mse,
      |  CAST(max(abs(err)) AS DOUBLE) / 1000000 AS max_abs_err,
      |  CAST(sum(code * dim) AS BIGINT) AS code_checksum
      |FROM errs GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Deterministic ±1 sign matrix for [[embRpProject]] — a fixed LCG
    * over the flattened (i, j) index, so Spark literals and the
    * generated oracle SQL carry the SAME matrix by construction. */
  private[graft] def rpSigns(inDim: Int, outDim: Int): Array[Array[Double]] =
    Array.tabulate(outDim, inDim) { (j, i) =>
      val x = (1103515245L * (i * outDim + j) + 12345L) % 2147483648L
      if ((x / 65536L) % 2L == 0L) 1.0 else -1.0
    }

  /** Johnson–Lindenstrauss RANDOM PROJECTION to 16 dims (Achlioptas
    * '01 dense ±1 form — the cheap distance-preserving sketch run
    * before expensive geometry at 100 TB: coarse clustering,
    * candidate pruning, visualization feeds). The projection is
    * dot products against FIXED ±1 rows: vectors quantize to integer
    * micro-units (stored exactly in doubles), each output coordinate
    * is one native `graft_dot` against a literal sign row — in-row,
    * codegen'd, zero shuffle until the final sort; sums of ≤2^26-size
    * integers stay below 2^53 so every projection is EXACT and the
    * DuckDB `list_dot_product` oracle reproduces it bit-for-bit. */
  /** The JL target dimension shared by [[embRpProject]] and
    * [[embRpProjectSql]] — one constant so operator and oracle cannot
    * silently diverge (the FrameUnits/SceneCutThreshold discipline). */
  val RpOutDim: Int = 16

  def embRpProject(s: SparkSession, d: String, outDim: Int = RpOutDim): DataFrame = {
    graft.Graft.registerFunctions(s)
    val signs = rpSigns(64, outDim)
    val qx = transform(col("embedding").cast("array<double>"),
      x => round(x * 1000000.0, 0))
    val projs = array(signs.indices.map { j =>
      call_function("graft_dot", col("qx"),
        array(signs(j).map(v => lit(v)): _*))
    }: _*)
    Tables.embeddings(s, d)
      .select(col("vec_id"), qx.as("qx"))
      .select(col("vec_id"), posexplode(projs).as(Seq("j", "p")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        (col("p") / 1000000.0).as("val"))
      .orderBy(col("vec_id"), col("j"))
  }

  val embRpProjectSql: String = {
    val signs = rpSigns(64, RpOutDim)
    val legs = signs.indices.map { j =>
      val row = signs(j).map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")
      s"""SELECT vec_id, CAST($j AS BIGINT) AS j,
         |  list_dot_product(qx, [$row]) / 1000000.0 AS val FROM q""".stripMargin
    }
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000, 0)) AS qx
       |  FROM embeddings)
       |${legs.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY vec_id, j""".stripMargin
  }

  /** [[semanticDedup]]'s derived cluster count,
    * k = clamp(n/256, floor, [[MaxClusters]]) — single-sourced so the
    * driver derivation and the spec pin (HyperplaneSigSpec) cannot
    * drift; the DuckDB oracle carries the same arithmetic in its `nb`
    * CTE ([[ivfSqlPrefix]] with `derivedK = true`).
    *
    * r14 raised the cap 512 → 4096 (the r13 verdict-1 structural
    * drift): at the old cap, past n ≈ 2¹⁷ cluster size grew as n/512
    * and the within-cluster pair term re-entered ~quadratically in it.
    * The cap was never the ASSIGN side's constraint — the
    * graft_cent_assign probe is ~constant work per row at any derived
    * k — it guarded the TRAINING assign, which evaluated k exact
    * topCents literals per sampled row (O(trainCap·k) = O(128·k²)
    * dots, plus a k-struct literal plan that stops codegen'ing long
    * before 4096). [[kmeansCentroids]]' `annAssign` mode (r14) moves
    * training onto the same bucketed probe past [[AnnAssignMinK]], so
    * training is O(trainCap·~const) and the cap can sit where memory
    * does: 4096 centroids × 64 dims of plan-reference doubles = 2 MB,
    * and expected cluster size stays ~256 out to n ≈ 2²⁰ vectors.
    * Gate SFs (n ≤ 4095) still floor at `floor` — every oracle is
    * byte-identical, and the oracle re-derives the same cap from its
    * own count. */
  def derivedClusters(n: Long, floor: Int = 16): Int =
    math.max(floor.toLong, math.min(MaxClusters.toLong, n / 256L)).toInt

  /** [[semanticDedup]]'s Lloyd sample size, max(2048, 128·k) — ~128
    * training rows per seed at every derived k (the r12 512-cap note:
    * a fixed 2048-row sample left 4 rows/seed at k = 512). Floors at
    * the historical 2048 for every gate SF (k = 16 there), so gate
    * training draws — and therefore every oracle — are unchanged; the
    * DuckDB oracle re-derives the same cap from its own count
    * ([[ivfSqlPrefix]] `derivedK` mode). Single-sourced and pinned
    * beyond the gate floor by HyperplaneSigSpec. */
  def derivedTrainCap(k: Int): Int = math.max(2048, 128 * k)

  /** [[semanticDedup]]'s ANN-assign band width: w = clamp(⌈log₂ k⌉ −
    * 2, 4, 12) bits per table keeps expected bucket occupancy k/2^w at
    * ~2–4 for every derived k ≤ [[MaxClusters]], so the per-row
    * candidate gather stays constant-size. [[derivedAssignTables]]
    * spends the full signature budget — ⌊64/w⌋ tables of w bits, so
    * w·⌊64/w⌋ ≤ 64 and the packed signature is ONE
    * `graft_hyperplane_sig`-shaped long per row at every width (r13
    * advice: the old doc cited a nonexistent `AssignTables = 8`).
    * r14 lifted the upper clamp 8 → 12 with the k-cap raise: at the
    * old cap the clamp never bound below k = 1024, so every measured
    * config is unchanged; past it, w = 8 would have let occupancy grow
    * as k/256 (16 at k = 4096) — w = clamp now holds occupancy ≤ 4 out
    * to the new cap (k = 4096 → w = 10, 6 tables, occupancy 4).
    * Pinned beyond the gate floor by CentAssignSpec. */
  def derivedAssignWidth(k: Int): Int = {
    val ceilLog2 = 32 - Integer.numberOfLeadingZeros(math.max(1, k - 1))
    math.min(12, math.max(4, ceilLog2 - 2))
  }

  /** ANN-assign table count: use the FULL 64-bit signature budget —
    * ⌊64/w⌋ tables of w bits each (16 at w=4 … 8 at w=8). The sig is
    * ONE long either way, so extra tables cost only their probed
    * candidates (occupancy ~2–4 each); recall compounds as
    * 1−(1−p^w)^nTables. Measured on the sf0.01 corpus at the k=16
    * floor: 8 tables gave 0.64 end-to-end dedup recall, the full
    * budget lifts it past the 0.85 pin (CentAssignSpec). */
  def derivedAssignTables(w: Int): Int = 64 / w

  /** The assign sketch's fixed seed — distinct from every other
    * seeded draw so no bucket structure is shared accidentally. */
  private[graft] val AssignSeed = 0x5EED0CA55E77E13L

  /** [[semanticDedup]] assign-path guard: the ANN-assisted assign
    * activates only past k = 64 centroids (n > 16384 vectors under the
    * derived-k regime). Below it the exact `topCents` assign is both
    * cheaper (64 cosines beat a 64-bit sig + probes) and bit-pinned by
    * the gate oracles — every gate SF sits at the k = 16 floor. */
  private[graft] val AnnAssignMinK = 64
}
