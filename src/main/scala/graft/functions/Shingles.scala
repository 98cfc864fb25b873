package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: ONE byte scan per document instead of
  * the column formulation's lambda pipeline
  * (`transform(arrays_zip(slice(filter(split(text)))×n)))`), whose
  * higher-order functions are CodegenFallback AND whose `CASE WHEN`
  * guard + n slices re-evaluate `split(text, " ")` ~2(n+1) times per
  * row interpreted — the single hottest subtree in the dedup/text
  * family (it feeds minhash/simhash/ngram-jaccard/containment/
  * winnowing/…).
  *
  * Byte-identical to the column formulation (spec-pinned, including
  * the edge rows): tokens are maximal runs between 0x20 bytes — the
  * `split(text, " ")` + drop-empties semantics; the space byte never
  * occurs inside a UTF-8 multibyte sequence, so the scan is
  * encoding-safe — and each shingle is n consecutive tokens joined by
  * a single space. Fewer than n tokens (or a NULL document) yield the
  * EMPTY array, never null, matching the `CASE WHEN … ELSE array()`
  * of the column form. */
case class Shingles(child: Expression, n: Int, nullOnNull: Boolean = false)
  extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // `nullOnNull = false` (shingle consumers): NULL text -> EMPTY array,
  // matching the old CASE WHEN ... ELSE array() column form.
  // `nullOnNull = true` (the tokens() contract): NULL in -> NULL out —
  // handled INSIDE the expression so the caller never has to reference
  // the text subtree twice with an external isNull guard (a derived
  // text column would be evaluated once per reference).
  override def nullable: Boolean = nullOnNull && child.nullable
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null && nullOnNull) null
    else compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  /** The whole shingling pass; called once per row from generated code
    * too (one virtual call — the loop body itself is branch-light byte
    * work, so inlining it into codegen buys nothing over this). */
  def compute(s: UTF8String): ArrayData = {
    if (s == null) return Shingles.Empty
    val bytes = s.getBytes
    // pass 1: token boundaries (start offsets and lengths)
    var ntok = 0
    var i = 0
    val len = bytes.length
    while (i < len) { // count tokens
      if (bytes(i) != 0x20) {
        ntok += 1
        while (i < len && bytes(i) != 0x20) i += 1
      } else i += 1
    }
    if (ntok < n) return Shingles.Empty
    val starts = new Array[Int](ntok)
    val lens = new Array[Int](ntok)
    var t = 0
    i = 0
    while (i < len) {
      if (bytes(i) != 0x20) {
        starts(t) = i
        while (i < len && bytes(i) != 0x20) i += 1
        lens(t) = i - starts(t)
        t += 1
      } else i += 1
    }
    // pass 2: one buffer per shingle — n tokens + (n-1) joining spaces
    val out = new Array[Any](ntok - n + 1)
    var g = 0
    while (g <= ntok - n) {
      var blen = n - 1
      var k = 0
      while (k < n) { blen += lens(g + k); k += 1 }
      val buf = new Array[Byte](blen)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { buf(pos) = 0x20; pos += 1 }
        System.arraycopy(bytes, starts(g + k), buf, pos, lens(g + k))
        pos += lens(g + k)
        k += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (nullOnNull) {
      val ref = ctx.addReferenceObj("shingler", this, classOf[Shingles].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    } else {
      val c = child.genCode(ctx)
      val ref = ctx.addReferenceObj("shingler", this, classOf[Shingles].getName)
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            $ref.compute(${c.isNull} ? null : ${c.value});
        """,
        isNull = FalseLiteral)
    }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])
}
