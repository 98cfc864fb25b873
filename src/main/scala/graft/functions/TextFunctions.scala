package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything here is built from native Spark functions
  * (whole-stage-codegen'd) — no UDFs — so the hot path stays inside
  * Tungsten at 100 TB.
  *
  * These extend the reference's single text utility (IK-segmenter
  * tokenization in gmall-realtime/src/main/java/com/atguigu/utils/
  * KeywordUtil.java) into the full LLM-pipeline text toolkit.
  */
object TextFunctions {

  /** Whitespace tokenization, empty tokens dropped (KeywordUtil
    * analog). A 1-gram IS a token, so this rides the native
    * [[Shingles]] byte scan (r10) instead of the CodegenFallback
    * `filter(split(...))` lambda pair. `nullOnNull` preserves the old
    * form's NULL-in → NULL-out inside the expression — an external
    * isNull guard would reference (and for a derived text column,
    * evaluate) the text subtree twice. */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Shingles(org.apache.spark.sql.GraftColumnBridge.expression(text), 1,
        nullOnNull = true))

  /** BPE-ish regex token count: word pieces, digits, or any other
    * non-space symbol each count as one token. */
  def regexTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")), lit(0))

  /** Word n-gram shingles (n consecutive tokens joined by a space) —
    * the native [[Shingles]] expression: one codegen'd byte scan per
    * document. Replaced the zip-of-n-shifted-slices column formulation
    * (r10): that form's higher-order functions are CodegenFallback and
    * its CASE WHEN guard + n slices re-evaluate `split(text, " ")`
    * ~2(n+1) times per row interpreted; the native scan tokenizes
    * once. Byte-identical output (ShinglesSpec pins the column form,
    * edge rows included: null → empty array, runs of spaces, <n
    * tokens, multibyte UTF-8). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Shingles(org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Occurrence count of the most frequent element of a string array:
    * sort + one linear run-length fold — O(d log d) per row. The naive
    * count-per-distinct form (`transform(array_distinct(a), x ->
    * size(filter(a, y -> y = x)))`) is O(d²) per row: harmless on a
    * 40-token test doc, 10⁸ comparisons on a 10k-shingle web page.
    * Equal elements are adjacent after the sort, so the longest equal
    * run IS the top count. */
  def topCount(arr: Column): Column = {
    val zero = struct(
      lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best"))
    aggregate(array_sort(arr), zero,
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  /** Canonical form for exact dedup: collapse whitespace, lowercase. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** 128-bit content fingerprint of the normalized text (md5 so the
    * DuckDB oracle can reproduce it byte-for-byte). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Language marker-word hit count (n-gram heuristic): how many
    * tokens of `text` belong to `markers`. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    coalesce(
      regexp_count(lower(text), lit(markers.mkString("\\b(", "|", ")\\b"))),
      lit(0))

  /** Marker sets per language for the lang-id heuristic. Deterministic
    * priority order en > de > es > fr > zh on ties. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo"))

  /** English stopword pattern used by the quality score. */
  val stopwordPattern = "\\b(the|a|an|of|and|or|is|are|to|in)\\b"
}
