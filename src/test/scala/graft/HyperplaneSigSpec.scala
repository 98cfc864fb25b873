package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.HyperplaneSig
import graft.operators.Hyperplanes

/** The native [[graft.functions.HyperplaneSig]] expression is
  * sign-exact with the lambda tower it replaced
  * (`aggregate(transform(planesLit, p -> when(zip_with-dot >= 0,
  * 1<<i)))`) on the real embeddings corpus for every (nBits, seed)
  * the engine uses, and its codegen, interpreted, and plain-driver
  * evaluations agree — the native-primitive triple pin. */
class HyperplaneSigSpec extends SparkSpec {

  /** The r11-era column formulation, kept verbatim as the reference. */
  private def lambdaForm(v: Column, planes: Array[Array[Double]]): Column =
    aggregate(
      transform(typedLit(planes.zipWithIndex.map { case (p, i) =>
        (p.toSeq, 1L << i)
      }.toSeq), pw =>
        when(aggregate(zip_with(v, pw("_1"), (x, c) => x * c),
          lit(0.0), (a, x) => a + x) >= 0, pw("_2")).otherwise(0L)),
      lit(0L), (a, x) => a + x)

  /** Straight-line driver re-implementation (no Spark types). */
  private def driverRef(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      var acc = 0.0
      var j = 0
      while (j < v.length) { acc += v(j) * planes(i)(j); j += 1 }
      if (acc >= 0.0) sig |= 1L << i
      i += 1
    }
    sig
  }

  private def corpus = Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("native sig == lambda column form on the corpus for every engine (nBits, seed)") {
    graft.Graft.registerFunctions(spark)
    // (8, 11) = ann_lsh; (24, 11) = emb_knn_graph_lsh; (64, 7) = dedup_embedding
    Seq((8, 11L), (24, 11L), (64, 7L)).foreach { case (nBits, seed) =>
      val planes = Hyperplanes.make(nBits, dim = 64, seed = seed)
      val diff = corpus.select(
        call_function("graft_hyperplane_sig",
          col("v"), lit(nBits), lit(64), lit(seed)).as("native"),
        lambdaForm(col("v"), planes).as("lambda"))
        .filter(col("native") =!= col("lambda")).count()
      assert(diff == 0L, s"sig mismatch on $diff rows at nBits=$nBits seed=$seed")
    }
  }

  test("codegen == interpreted == driver reference; nulls and corrupt rows") {
    val nBits = 24
    val seed = 11L
    val planes = Hyperplanes.make(nBits, dim = 64, seed = seed)
    val vecs = corpus.limit(64).collect()
      .map(_.getSeq[Double](1).toArray)
    val interpreted = HyperplaneSig(
      BoundReference(0, ArrayType(DoubleType), nullable = true), nBits, 64, seed)
    vecs.foreach { v =>
      val fromInterp = interpreted.eval(InternalRow(ArrayData.toArrayData(v)))
      assert(fromInterp == driverRef(v, planes), "interpreted != driver reference")
    }
    // whole-stage-codegen'd path over the same rows; snapshot ONCE
    // (limit-before-orderBy picks arbitrary rows per execution on
    // multi-partition input, so two executions could disagree)
    graft.Graft.registerFunctions(spark)
    val snapshot = corpus.orderBy("vec_id").limit(64).cache()
    try {
      val fromCodegen = snapshot
        .select(col("vec_id"), call_function("graft_hyperplane_sig",
          col("v"), lit(nBits), lit(64), lit(seed)).as("sig"))
        .orderBy("vec_id").collect().map(_.getLong(1))
      val expected = snapshot.orderBy("vec_id").collect()
        .map(r => driverRef(r.getSeq[Double](1).toArray, planes))
      assert(fromCodegen.toSeq == expected.toSeq, "codegen != driver reference")
    } finally snapshot.unpersist()
    // NULL vector -> NULL (unary null semantics)
    assert(interpreted.eval(InternalRow(null)) == null)
    // length mismatch RAISES (graft_dot corrupt-row discipline)
    val short = ArrayData.toArrayData(Array(1.0, 2.0))
    assertThrows[IllegalArgumentException] {
      interpreted.eval(InternalRow(short))
    }
  }

  test("derived band/cluster formulas: Spark expr == SQL == reference at sizes beyond the gate") {
    // dedup_embedding's w and dedup_semantic's k are derived in TWO
    // places each (the Spark plan / driver and the DuckDB oracle); the
    // oracle compare only exercises the gate floor (w=8, k=16), so a
    // formula drift at scale would be silent without this pin
    import spark.implicits._
    // independent references (straight bit math, no Spark functions)
    def refW(n: Long): Int =
      math.min(16, math.max(8, (63 - java.lang.Long.numberOfLeadingZeros(n)) - 3))
    // r14: cap 512 → 4096 (the SemDeDup k-cap raise; the oracle's nb
    // CTE carries the same literal via Similarity.MaxClusters)
    def refK(n: Long): Int = math.max(16L, math.min(4096L, n / 256L)).toInt
    val ns = Seq(40L, 200L, 2000L, 4096L, 4097L, 20000L, 60000L, 524288L, 10000000L)
    // the PRODUCTION column expression (shared with embeddingNearDup's plan)
    val viaSpark = ns.toDF("n")
      .select(col("n"), Hyperplanes.derivedWidth(col("n")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n =>
      assert(viaSpark(n) == refW(n), s"w drift at n=$n: spark=${viaSpark(n)} ref=${refW(n)}")
      // the PRODUCTION driver derivation (shared with semanticDedup)
      assert(graft.operators.Similarity.derivedClusters(n) == refK(n),
        s"k drift at n=$n: ${graft.operators.Similarity.derivedClusters(n)} ref=${refK(n)}")
      // the clamps floor exactly through the gate sizes (w first
      // leaves 8 at n = 4096, a power of two: ⌊log₂ 4096⌋ − 3 = 9)
      if (n <= 4095) assert(refW(n) == 8)
      if (n <= 4351) assert(refK(n) == 16)
    }
    // sanity at the documented 10x point
    assert(refW(20000) == 11 && refK(20000) == 78)
  }

  test("dedup_embedding table keys slice exactly from the packed sig at every derived width") {
    // (sig >> t*w) & (2^w - 1) must equal the per-table bit sum the
    // oracle computes from the bits array — including the table that
    // covers sign bit 63 (w=8 t=7, w=16 t=3)
    val planes = Hyperplanes.make(64, dim = 64, seed = 7)
    val v = corpus.limit(16).collect().map(_.getSeq[Double](1).toArray)
    v.foreach { vec =>
      val sig = driverRef(vec, planes)
      Seq(8, 11, 16).foreach { w =>
        (0 until 64 / w).foreach { t =>
          val fromSlice = (sig >> (t * w)) & ((1L << w) - 1)
          val fromBits = (0 until w).map { b =>
            val i = t * w + b
            (if ((sig & (1L << i)) != 0) 1L else 0L) << b
          }.sum
          assert(fromSlice == fromBits, s"w=$w table $t key mismatch")
        }
      }
    }
  }
}
