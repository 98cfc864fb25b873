package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BitmapAgg, BitmapAndCard, BitmapCard, BitmapUnionCard, BloomContains, BloomFilterAgg, DotProduct, HyperplaneSig, MinHashBands, MinHashSig, RollingHash64, SimHashAgg, ThetaIntersectCard, ThetaSketchAgg, ThetaUnionCard, TopKFreqAgg, VecSumAgg}

/** User-facing entry points: a tuned session builder, table views for
  * the SQL surface, and native function registration. A user of the
  * reference system points this at their data directory and gets the
  * whole engine — DataFrame operators (graft.operators._), streaming
  * (graft.streaming.StreamOps), SQL over registered views, and the
  * native extension functions.
  */
object Graft {

  /** Build a session tuned for this engine. `shufflePartitions` should
    * track cluster parallelism (driver harnesses pass cores; a real
    * cluster sets ~2-3× total executor cores or relies on AQE). */
  def session(master: String = "local[*]", shufflePartitions: Int = 32,
    appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    registerFunctions(s)
    s
  }

  /** Register every table in `dir` as a temp view so the SQL surface
    * (`spark.sql`) works alongside the DataFrame operators. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Register the native extension functions on an existing session
    * (idempotent). Sessions created through `GraftExtensions` get them
    * automatically. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions`-style injection point: a session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` has the native
  * functions available with no code changes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(name: String)(build: Expression => Expression)
    : Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      s"$name expects exactly 1 argument, got ${children.length}")
    build(children.head)
  }

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "graft_rolling_hash64"),
      unary("graft_rolling_hash64")(RollingHash64(_))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      unary("graft_simhash")(SimHashAgg(_))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.Shingles].getName, "graft_shingles"),
      { children =>
        require(children.length == 2, "graft_shingles expects (text, n)")
        import org.apache.spark.sql.AnalysisException
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        // accept any FOLDABLE integral n (a bare literal, CAST(3 AS
        // INT), 1+2, a smallint literal, ...) — the SQL surface should
        // fail with an AnalysisException, not a raw require/match error
        def bad(what: String): Nothing = throw new AnalysisException(
          "INVALID_PARAMETER_VALUE.INTEGER",
          Map("parameter" -> "`n`", "functionName" -> "`graft_shingles`",
            "invalidValue" -> what))
        val nExpr = children(1)
        if (!nExpr.foldable) bad(s"non-foldable ${nExpr.sql}")
        val n = nExpr.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            nExpr.eval() match {
              case null => bad("NULL")
              case v: java.lang.Number if v.longValue >= 1 && v.longValue <= 64 =>
                v.intValue
              case v => bad(s"out-of-range value $v (need 1..64)")
            }
          case dt => bad(s"type ${dt.sql}")
        }
        graft.functions.Shingles(children.head, n)
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      unary("graft_minhash_sig")(MinHashSig(_))),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      unary("graft_minhash_bands")(MinHashBands(_))),
    (FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "graft_vec_sum"),
      unary("graft_vec_sum")(VecSumAgg(_))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      { children =>
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom_agg"),
      { children =>
        require(children.length == 3,
          "graft_bloom_agg expects (hash, expectedItems, fpp)")
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType => LT}
        val items = children(1) match {
          case Literal(v: Long, LT) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg: expectedItems must be an integral literal, got $other")
        }
        val fpp = children(2) match {
          case Literal(v: Double, DoubleType) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg: fpp must be a DOUBLE literal, got $other")
        }
        BloomFilterAgg(children.head, items, fpp)
      }),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      { children =>
        require(children.length == 2,
          s"graft_bloom_contains expects exactly 2 arguments, got ${children.length}")
        BloomContains(children(0), children(1))
      }),
    (FunctionIdentifier("graft_topk_freq"),
      new ExpressionInfo(classOf[TopKFreqAgg].getName, "graft_topk_freq"),
      { children =>
        require(children.length == 2, "graft_topk_freq expects (expr, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk_freq: k must be an INT literal, got $other")
        }
        TopKFreqAgg(children.head, k)
      }),
    (FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "graft_bitmap_agg"),
      unary("graft_bitmap_agg")(BitmapAgg(_))),
    (FunctionIdentifier("graft_bitmap_union_card"),
      new ExpressionInfo(classOf[BitmapUnionCard].getName, "graft_bitmap_union_card"),
      unary("graft_bitmap_union_card")(BitmapUnionCard(_))),
    (FunctionIdentifier("graft_bitmap_and_card"),
      new ExpressionInfo(classOf[BitmapAndCard].getName, "graft_bitmap_and_card"),
      unary("graft_bitmap_and_card")(BitmapAndCard(_))),
    (FunctionIdentifier("graft_bitmap_card"),
      new ExpressionInfo(classOf[BitmapCard].getName, "graft_bitmap_card"),
      unary("graft_bitmap_card")(BitmapCard(_))),
    (FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
      unary("graft_theta_agg")(ThetaSketchAgg(_))),
    (FunctionIdentifier("graft_theta_union_card"),
      new ExpressionInfo(classOf[ThetaUnionCard].getName, "graft_theta_union_card"),
      unary("graft_theta_union_card")(ThetaUnionCard(_))),
    (FunctionIdentifier("graft_theta_intersect_card"),
      new ExpressionInfo(classOf[ThetaIntersectCard].getName, "graft_theta_intersect_card"),
      unary("graft_theta_intersect_card")(ThetaIntersectCard(_))),
    (FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      { children =>
        require(children.length == 4,
          "graft_hyperplane_sig expects (vec, nBits, dim, seed)")
        def intLit(e: Expression, what: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
            org.apache.spark.sql.types.LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_sig: $what must be an integral literal, got $other")
        }
        HyperplaneSig(children.head,
          intLit(children(1), "nBits").toInt,
          intLit(children(2), "dim").toInt,
          intLit(children(3), "seed"))
      }))
}
