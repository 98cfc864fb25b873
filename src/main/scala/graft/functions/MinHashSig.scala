package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full 128-hash MinHash signature of
  * an in-row shingle array in ONE pass — `pmod(aⱼ·h + bⱼ, P)` folded
  * to a running minimum per hash function, where h = xxhash64(shingle)
  * (Spark's own seed-42 XXH64, so the signature is bit-identical to
  * the SQL formulation `min(pmod(aⱼ·pmod(xxhash64(s),P)+bⱼ, P))`).
  *
  * Why native (preference path (b)): the column formulation needs an
  * explode of the shingle stream plus a 128-column min-aggregate —
  * one full shuffle of (doc × shingle) rows just to build signatures.
  * As an expression the signature is a narrow per-row projection: the
  * generated code is two tight loops (elements × hash functions) over
  * primitive longs with no shuffle, no 128-column row, no boxing. The
  * LSH banding and bucket join downstream are unchanged.
  *
  * Empty/all-null arrays yield the sentinel signature (every slot =
  * [[MinHashSig.Prime]]); callers filter empty shingle sets first,
  * matching the explode formulation where such docs vanish.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    import MinHashSig._
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(NumHashes)(Prime)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val base = java.lang.Math.floorMod(
          XXH64.hashUTF8String(arr.getUTF8String(i), 42L), Prime)
        var j = 0
        while (j < NumHashes) {
          val v = java.lang.Math.floorMod(A(j) * base + B(j), Prime)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("minhashA", MinHashSig.A, "long[]")
      val b = ctx.addReferenceObj("minhashB", MinHashSig.B, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val k = MinHashSig.NumHashes
      val p = MinHashSig.Prime
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $base = java.lang.Math.floorMod(
         |      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |        $c.getUTF8String($i), 42L), ${p}L);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = java.lang.Math.floorMod($a[$j] * $base + $b[$j], ${p}L);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val NumHashes = 128
  final val Prime = 2147483647L // 2^31 − 1, universal-hash modulus

  /** The (a, b) universal-hash coefficients — THE canonical draw every
    * MinHash formulation in the engine shares (seeded, so signatures
    * agree across the native expression, the SQL columns, and reruns). */
  val (coeffA, coeffB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(NumHashes)(
      ((rnd.nextInt(Int.MaxValue - 1) + 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
    (ab.map(_._1), ab.map(_._2))
  }
  private[functions] def A: Array[Long] = coeffA
  private[functions] def B: Array[Long] = coeffB
}
