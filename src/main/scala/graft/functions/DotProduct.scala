package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two `ARRAY<DOUBLE>`
  * columns — the inner-loop primitive of every embedding operator
  * (cosine ANN, kNN graph, near-dup gating).
  *
  * Why native: the declarative form `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` is a higher-order function — CodegenFallback, one
  * closure dispatch per element plus a zipped intermediate array per
  * PAIR. Harmless at thousands of pairs, dominant at millions: the
  * exact kNN graph over a 2 000-vector corpus spends ~90 s in that
  * interpreter and ~1 s here. This is preference path (b) from the
  * build rules — a scalar the built-in set lacks, with `doGenCode`
  * emitting the tight primitive loop.
  *
  * The accumulation order is ascending-index, exactly the fold order
  * of both the `aggregate(zip_with(...))` form it replaces and
  * DuckDB's `list_dot_product` — every oracle hash compare stays
  * bit-identical. Mismatched lengths RAISE (matching DuckDB's
  * `list_dot_product`): for the dense equal-length embedding columns
  * this serves, a length mismatch is a corrupt row, and folding the
  * shorter prefix would let any future oracle-compared op drift
  * silently to a wrong-but-finite score instead of failing loudly.
  * Null ELEMENTS contribute 0.0 (the `zip_with` form would instead
  * null-poison the whole sum — a null that silently drops the row
  * from a top-k). A null ARRAY on either side yields null (standard
  * binary-expression null semantics). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) DotProduct.lengthMismatch(n, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  graft.functions.DotProduct.lengthMismatch($n, $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Called from both the interpreted and the generated path. */
  def lengthMismatch(l: Int, r: Int): Nothing =
    throw new IllegalArgumentException(
      s"graft_dot: array length mismatch ($l vs $r) — embedding columns " +
        "must be dense and equal-length; a mismatch is a corrupt row")
}
