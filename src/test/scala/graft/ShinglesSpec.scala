package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native [[graft.functions.Shingles]] expression is byte-identical
  * to the column formulation it replaced (zip of n shifted slices over
  * `filter(split(text, " "))`) — on the real corpus and on the edge
  * rows where the two could plausibly diverge. */
class ShinglesSpec extends SparkSpec {

  /** The r9-era column formulation, kept verbatim as the reference. */
  private def columnForm(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = filter(split(text, " "), t => length(t) > 0)
    val len = greatest(size(toks) - (n - 1), lit(0))
    val z = arrays_zip((0 until n).map(i => slice(toks, lit(i + 1), len).as(s"g$i")): _*)
    when(size(toks) >= n,
      transform(z, s => concat_ws(" ", (0 until n).map(i => s(s"g$i")): _*)))
      .otherwise(array().cast("array<string>"))
  }

  private val edges = Seq(
    null.asInstanceOf[String],      // null doc -> empty array (not null)
    "",                             // empty
    " ",                            // only spaces
    "   ",                          // run of spaces
    "one",                          // < n tokens
    "one two",                      // < n tokens for n = 3
    "a b c",                        // exactly n
    "a  b   c  d",                  // internal space runs collapse
    " leading and trailing spaces ",
    "tab\tand\nnewline stay inside tokens x y", // only 0x20 splits
    "héllo wörld ünïcode multibyte grüße",      // UTF-8 multibyte
    "日本 語の 単語 分割 テスト")

  test("native shingles == column formulation on edges and the corpus (n = 2, 3)") {
    import spark.implicits._
    val docs = edges.toDF("text")
      .unionAll(Tables.documents(spark, sf0001).select(col("text")))
    Seq(2, 3).foreach { n =>
      val both = docs.select(
        graft.functions.TextFunctions.shingles(col("text"), n).as("native"),
        columnForm(col("text"), n).as("column")).collect()
      both.zipWithIndex.foreach { case (r, i) =>
        assert(!r.isNullAt(0), s"native produced NULL (row $i, n=$n)")
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"shingle mismatch at row $i, n=$n")
      }
    }
  }

  test("native tokens (1-gram shingles) == filter(split(...)) column form, null-in null-out") {
    import spark.implicits._
    val docs = edges.toDF("text")
      .unionAll(Tables.documents(spark, sf0001).select(col("text")))
    val both = docs.select(
      graft.functions.TextFunctions.tokens(col("text")).as("native"),
      filter(split(col("text"), " "), t => length(t) > 0).as("column")).collect()
    both.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity broken at row $i")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"token mismatch at row $i")
    }
  }

  test("property: native == column formulation on random space/unicode strings") {
    // a driver-side replica of the COLUMN form's semantics (split on
    // the single space char, drop empties, join n-grams with one
    // space), checked against the expression's interpreted eval over
    // generated strings — hits shapes the fixed edge list can't
    // (leading/trailing/run-of-space combos, lone multibyte tokens)
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val token = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', '語', '本', '\t', '\n', '.'))).map(_.mkString)
    val piece = Gen.oneOf(token, Gen.const(" "), Gen.const("  "))
    val text = Gen.listOf(piece).map(_.mkString)
    val prop = Prop.forAll(text, Gen.choose(1, 4)) { (s: String, n: Int) =>
      val toks = s.split(" ", -1).filter(_.nonEmpty)
      val expect =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val got = graft.functions.Shingles(Literal(UTF8String.fromString(s), StringType), n)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
    }
    // pinned seed: a counterexample must replay deterministically in CI
    // (ADVICE r10) — bump the literal to explore a different stream
    val seed = org.scalacheck.rng.Seed(20260815L)
    val res = check(
      Parameters.default.withMinSuccessfulTests(500).withInitialSeed(seed), prop)
    assert(res.passed, res.status.toString)
  }

  test("SQL surface: n accepts any foldable integral; bad n is an AnalysisException") {
    graft.Graft.registerFunctions(spark)
    def run(sql: String): Seq[String] =
      spark.sql(sql).head.getSeq[String](0)
    val expect = Seq("a b c", "b c d")
    // bare literal, folded arithmetic, CAST, and a narrower integral
    // type all resolve (ADVICE r10: only a bare INT literal used to)
    assert(run("SELECT graft_shingles('a b c d', 3)") === expect)
    assert(run("SELECT graft_shingles('a b c d', 1 + 2)") === expect)
    assert(run("SELECT graft_shingles('a b c d', CAST(3 AS INT))") === expect)
    assert(run("SELECT graft_shingles('a b c d', CAST(3 AS SMALLINT))") === expect)
    // non-integral, non-foldable, NULL and out-of-range n fail as
    // proper AnalysisExceptions, not raw require/match errors
    Seq(
      "SELECT graft_shingles('a b', 'x')",
      "SELECT graft_shingles('a b', n) FROM VALUES (2) t(n)",
      "SELECT graft_shingles('a b', CAST(NULL AS INT))",
      "SELECT graft_shingles('a b', 0)",
      "SELECT graft_shingles('a b', 65)").foreach { bad =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).collect())
      assert(e.getMessage.contains("graft_shingles"), s"$bad: ${e.getMessage}")
    }
  }

  test("interpreted eval matches the corpus run and handles null directly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.Shingles(Literal(UTF8String.fromString("a  b c d"),
      org.apache.spark.sql.types.StringType), 3)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until got.numElements()).map(got.getUTF8String(_).toString) ===
      Seq("a b c", "b c d"))
    val eNull = graft.functions.Shingles(
      Literal(null, org.apache.spark.sql.types.StringType), 3)
    val gotNull = eNull.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(gotNull.numElements() === 0)
  }
}
