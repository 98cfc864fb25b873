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
  * bit-identical. Null ELEMENTS contribute 0.0 and mismatched lengths
  * fold over the shorter prefix — both are contract violations for
  * the dense equal-length embedding columns this serves (the
  * `zip_with` form would instead null-poison the whole sum), chosen
  * so a malformed row degrades to a finite score instead of a
  * null that silently drops it from a top-k. A null ARRAY on either
  * side yields null (standard binary-expression null semantics). */
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
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
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
