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

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.signatureOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      s"""
         |${MinHashSig.sigLoopCode(ctx, c, mins)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused MinHash signature → LSH band keys in ONE codegen pass: the
  * 128-slot signature of [[MinHashSig]] folded straight into the 32
  * band keys (`xxhash64(m₄ᵦ, m₄ᵦ₊₁, m₄ᵦ₊₂, m₄ᵦ₊₃)`, Spark's seed-42
  * XXH64 chain), so the banding stage never materializes the signature
  * array or evaluates 128 `element_at` + 32 `xxhash64` Catalyst nodes
  * per row — the generated code is the [[MinHashSig]] loops plus one
  * 32×4 fold over primitive longs. Bit-identical to
  * `xxhash64(element_at(sig, 4b+1) … element_at(sig, 4b+4))` over the
  * [[MinHashSig]] output (spec-pinned in DedupSpec).
  *
  * Empty/all-null shingle arrays yield every band =
  * [[MinHashSig.SentinelBand]] (the fold over the all-Prime sentinel
  * signature), which callers filter AFTER the band fan-out — a
  * generated-column filter stays above the Generate, so the optimizer
  * cannot push it below the projection and re-inline the whole
  * shingle pipeline into the Filter (the double-compute this
  * expression exists to delete). */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    import MinHashSig._
    val mins = signatureOf(input.asInstanceOf[ArrayData])
    val bands = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var h = 42L
      var k = 0
      while (k < BandRows) {
        h = XXH64.hashLong(mins(b * BandRows + k), h)
        k += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val bands = ctx.freshName("bands")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val nb = MinHashSig.NumBands
      val br = MinHashSig.BandRows
      s"""
         |${MinHashSig.sigLoopCode(ctx, c, mins)}
         |long[] $bands = new long[$nb];
         |for (int $b = 0; $b < $nb; $b++) {
         |  long $h = 42L;
         |  for (int $k = 0; $k < $br; $k++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $mins[$b * $br + $k], $h);
         |  }
         |  $bands[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashSig {
  final val NumHashes = 128
  final val Prime = 2147483647L // 2^31 − 1, universal-hash modulus
  final val BandRows = 4
  final val NumBands = NumHashes / BandRows // 32 → s-curve threshold ≈ 0.42

  /** Band key of the all-[[Prime]] sentinel signature (what an
    * empty/whitespace-only doc hashes to in EVERY band — the 4 folded
    * inputs are all Prime, so the 32 keys coincide). Band rows with
    * this key are dropped after the fan-out, which is exactly "docs
    * with ≥1 shingle participate in LSH" up to a 2⁻⁶⁴ xxhash64
    * collision — and the DuckDB oracle applies the SAME literal
    * filter, so even a collision cannot diverge the two engines. */
  val SentinelBand: Long = {
    var h = 42L
    var k = 0
    while (k < BandRows) { h = XXH64.hashLong(Prime, h); k += 1 }
    h
  }

  /** The ONE source of the min-signature fold (ADVICE r10: eval and
    * codegen in both [[MinHashSig]] and [[MinHashBands]] used to carry
    * verbatim copies a drive-by edit could silently desynchronize).
    * Interpreted form: the 128-slot running-min signature of a shingle
    * array. */
  private[functions] def signatureOf(arr: ArrayData): Array[Long] = {
    val mins = Array.fill(NumHashes)(Prime)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val base = java.lang.Math.floorMod(
          XXH64.hashUTF8String(arr.getUTF8String(i), 42L), Prime)
        var j = 0
        while (j < NumHashes) {
          val v = java.lang.Math.floorMod(coeffA(j) * base + coeffB(j), Prime)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Codegen twin of [[signatureOf]]: emits Java that leaves the
    * signature in a fresh `long[] <minsVar>`. Both expressions splice
    * this ONE snippet, so the fold logic cannot drift between them. */
  private[functions] def sigLoopCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      c: String, minsVar: String): String = {
    val a = ctx.addReferenceObj("minhashA", A, "long[]")
    val b = ctx.addReferenceObj("minhashB", B, "long[]")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val base = ctx.freshName("base")
    val v = ctx.freshName("v")
    s"""
       |long[] $minsVar = new long[$NumHashes];
       |java.util.Arrays.fill($minsVar, ${Prime}L);
       |for (int $i = 0; $i < $c.numElements(); $i++) {
       |  if (!$c.isNullAt($i)) {
       |    long $base = java.lang.Math.floorMod(
       |      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
       |        $c.getUTF8String($i), 42L), ${Prime}L);
       |    for (int $j = 0; $j < $NumHashes; $j++) {
       |      long $v = java.lang.Math.floorMod($a[$j] * $base + $b[$j], ${Prime}L);
       |      if ($v < $minsVar[$j]) $minsVar[$j] = $v;
       |    }
       |  }
       |}
     """.stripMargin.trim
  }

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
