package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit FNV-1a-style rolling hash of a
  * string's UTF-8 bytes — the document-fingerprinting primitive
  * (SURVEY §2 `text_fingerprint` family).
  *
  * Implemented as a real `Expression` with `doGenCode` (not a UDF) so
  * it stays inside whole-stage codegen: the generated code is a tight
  * loop over the UTF8String bytes with no boxing or serialization.
  * This is preference path (b) from the build rules: a scalar the
  * built-in function set lacks, added natively.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${RollingHash64.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${RollingHash64.Mul}L) ^ ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** FNV-1a 64-bit offset basis / prime. */
  final val Seed = -3750763034362895579L // 0xcbf29ce484222325
  final val Mul = 1099511628211L

  /** Reference implementation (must stay in lockstep with the codegen
    * loop above; the spec cross-checks all three paths). */
  def hash(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = (h * Mul) ^ (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}
