package graft.functions

import scala.collection.mutable

/** Dictionary word segmentation — the public-domain analog of the
  * reference's IK analyzer (`utils/KeywordUtil.java` wraps
  * IKSegmenter): forward maximum matching over a trie, the classic
  * Chinese-segmentation baseline IK's "max_word"/"smart" modes build
  * on.
  *
  * Tokenization rules, deterministic and script-aware:
  *  - a CJK run is segmented by LONGEST dictionary match from the
  *    current position; characters that start no dictionary word are
  *    emitted as single-character tokens (IK's unmatched-CJK behavior)
  *  - a Latin/digit run is one lowercased token (so on an all-ASCII
  *    corpus the output is exactly `regexp_extract_all(lower(text),
  *    '[a-z0-9]+')` — which is what the DuckDB oracle checks)
  *  - everything else (punctuation, whitespace) separates tokens
  *
  * The trie is immutable after construction; build it ONCE per
  * partition/executor (the IK deployment shape — dictionary load is
  * task-init, not per-row work) and share across rows.
  */
final class DictTokenizer private (root: DictTokenizer.Node) extends Serializable {

  /** Longest-match segmentation of `text` under the rules above. */
  def segment(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c) && !DictTokenizer.isCjk(c)) {
        val start = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i)) &&
          !DictTokenizer.isCjk(text.charAt(i))) i += 1
        out += text.substring(start, i).toLowerCase
      } else if (DictTokenizer.isCjk(c)) {
        // forward maximum matching: walk the trie as far as the text
        // allows, remember the deepest word end
        var node = root
        var j = i
        var lastEnd = -1
        while (j < n && node.children.contains(text.charAt(j))) {
          node = node.children(text.charAt(j))
          j += 1
          if (node.isWord) lastEnd = j
        }
        if (lastEnd > i) { out += text.substring(i, lastEnd); i = lastEnd }
        else { out += text.substring(i, i + 1); i += 1 }
      } else i += 1
    }
    out.toSeq
  }
}

object DictTokenizer {
  private final class Node extends Serializable {
    val children: mutable.Map[Char, Node] = mutable.Map.empty
    var isWord: Boolean = false
  }

  private def isCjk(c: Char): Boolean = c >= '一' && c <= '鿿'

  def apply(words: Seq[String]): DictTokenizer = {
    val root = new Node
    words.foreach { w =>
      var node = root
      w.foreach { c => node = node.children.getOrElseUpdate(c, new Node) }
      node.isWord = true
    }
    new DictTokenizer(root)
  }

  /** Bundled demo wordlist: common-vocabulary compounds (general
    * public knowledge, not copied from any analyzer's dictionary).
    * A production deployment swaps in its own list — the segmenter
    * only sees `Seq[String]`. */
  val defaultWords: Seq[String] = Seq(
    "数据", "大数据", "数据库", "数据分析", "分析", "引擎", "系统",
    "计算", "分布式", "分布式系统", "实时", "处理", "实时处理",
    "中国", "人民", "世界", "你好", "机器", "学习", "机器学习",
    "模型", "语言", "语言模型", "大语言模型", "查询", "优化",
    "查询优化", "存储", "网络", "程序", "工程", "工程师")

  lazy val default: DictTokenizer = apply(defaultWords)
}
