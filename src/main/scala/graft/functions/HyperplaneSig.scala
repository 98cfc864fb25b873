package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane sign signature: bit i of the result is set
  * iff v · plane_i ≥ 0, packed as a LONG (so `nBits ≤ 64`). The planes
  * are the seeded Gaussian draw `Hyperplanes.make(nBits, dim, seed)` —
  * the SAME single-sourced draw every DuckDB oracle renders through
  * `Hyperplanes.sqlLit` — derived inside the expression from the
  * (nBits, dim, seed) scalars, so plan canonicalization and
  * `semanticEquals` work structurally (no array-identity equality) and
  * the SQL surface can call it with four plain literals.
  *
  * Why native (the `graft_shingles` move for the embedding family):
  * the column formulation — `aggregate(transform(planesLit, p ->
  * when(aggregate(zip_with(v, p, _*_), 0.0, _+_) >= 0, 1<<i)), 0, _+_)`
  * — is a higher-order-function tower, entirely CodegenFallback: per
  * ROW it allocated nBits zipped intermediate arrays and dispatched
  * ~nBits·dim closure calls, and it kept `ann_lsh`, `dedup_embedding`,
  * `emb_knn_graph_lsh` and `emb_ann_recall` on the interpreted-lambda
  * whitelist despite being declared 100 TB paths. Here the whole
  * signature is one flat-array loop in generated code.
  *
  * Bit-exact with the lambda form it replaces: each plane's dot folds
  * in ascending index order from 0.0 (the `zip_with`+`aggregate` fold
  * order, also DuckDB's `list_dot_product`), so every sign — and hence
  * every bucket — is identical on dense data. Null ELEMENTS contribute
  * 0.0 (graft_dot convention). A vector whose length ≠ `dim` RAISES
  * (graft_dot's corrupt-row discipline; the lambda form would zip-pad
  * with nulls and silently yield bucket 0). NULL vector → NULL
  * (standard unary null semantics; the old form returned 0L, but no
  * registered query feeds nullable vectors — the cast is upstream). */
case class HyperplaneSig(child: Expression, nBits: Int, dim: Int, seed: Long)
  extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in 1..64, got $nBits")
  require(dim >= 1, s"dim must be >= 1, got $dim")

  @transient private lazy val flatPlanes: Array[Double] = {
    val p = graft.operators.Hyperplanes.make(nBits, dim, seed)
    val out = new Array[Double](nBits * dim)
    var i = 0
    while (i < nBits) { System.arraycopy(p(i), 0, out, i * dim, dim); i += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override protected def nullSafeEval(a: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData], flatPlanes, nBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the plane table is one flat double[] shipped once per task via
      // the references array — not regenerated per row, not a codegen
      // literal (a 64×64 table would be 4096 doubles of source text)
      val planes = ctx.addReferenceObj("planes", flatPlanes, "double[]")
      s"${ev.value} = graft.functions.HyperplaneSig.compute($a, $planes, $nBits, $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Called from both the interpreted and the generated path — one
    * static call per row; the loop body is branch-light double math,
    * so inlining it into codegen buys nothing (the Shingles note). */
  def compute(v: ArrayData, planes: Array[Double], nBits: Int, dim: Int): Long = {
    if (v.numElements() != dim) lengthMismatch(v.numElements(), dim)
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) acc += v.getDouble(j) * planes(base + j)
        j += 1
      }
      if (acc >= 0.0) sig |= 1L << i
      i += 1
    }
    sig
  }

  def lengthMismatch(l: Int, d: Int): Nothing =
    throw new IllegalArgumentException(
      s"graft_hyperplane_sig: vector length $l != plane dim $d — embedding " +
        "columns must be dense and equal-length; a mismatch is a corrupt row")
}
