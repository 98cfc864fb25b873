package graft

import java.nio.file.Files

import graft.functions.DictTokenizer
import graft.operators.Dws
import org.apache.spark.sql.functions._

/** The dictionary segmentation path (the IK-analyzer analog) on
  * planted CJK text — the all-ASCII corpus exercises only the Latin
  * rule, which the DuckDB oracle covers. */
class DictTokenizerSpec extends SparkSpec {

  test("forward maximum matching prefers the longest dictionary word") {
    val tok = DictTokenizer(Seq("数据", "大数据", "数据分析", "分析", "引擎"))
    // 大数据 beats 数据; then 分析 and 引擎 match; trailing unknowns split
    assert(tok.segment("大数据分析引擎") === Seq("大数据", "分析", "引擎"))
    // from position 1, 数据分析 is the longest match — FMM is greedy
    // from the CURRENT position, not a global segmentation
    assert(tok.segment("数据分析引擎") === Seq("数据分析", "引擎"))
  }

  test("unknown CJK falls back to single characters; scripts mix freely") {
    val tok = DictTokenizer(Seq("世界", "你好"))
    assert(tok.segment("你好Spark世界") === Seq("你好", "spark", "世界"))
    // 银河 is not in the dictionary: each char stands alone
    assert(tok.segment("你好银河") === Seq("你好", "银", "河"))
    // punctuation separates, digits+latin run together per-run
    assert(tok.segment("你好, world2 世界!") === Seq("你好", "world2", "世界"))
  }

  test("latin rule equals the oracle's regexp semantics on ASCII") {
    val tok = DictTokenizer.default
    val text = "The QUICK brown fox-42 jumps!  over 7 lazy dogs."
    val expected = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    assert(tok.segment(text) === expected)
  }

  test("keywordStatsDict segments a planted mixed-script corpus distributedly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dict").toFile.getAbsolutePath
    Seq(
      (1L, "大数据分析引擎 runs 实时处理", "zh", "s", 0L),
      (2L, "机器学习 and 大语言模型", "zh", "s", 0L),
      (3L, "plain ascii only", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3) // tokenizer must init per partition, not per job
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dws.keywordStatsDict(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "大数据" -> 1L, "分析" -> 1L, "引擎" -> 1L, "runs" -> 1L,
      "实时处理" -> 1L, "机器学习" -> 1L, "and" -> 1L, "大语言模型" -> 1L,
      "plain" -> 1L, "ascii" -> 1L, "only" -> 1L))
  }
}
