package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** ANN-assisted centroid assignment for SemDeDup (the FAISS-assign
  * analog, Abbas et al. 2023 §3): the k trained centroids are bucketed
  * OFFLINE (driver-side, k ≤ Similarity.MaxClusters — 2 MB of doubles
  * at the 4096 cap) into `nTables` random-hyperplane
  * band tables of `w` bits each, and per ROW the vector computes one
  * `nTables·w`-bit signature, probes its `nTables` buckets, and takes
  * exact cosines against only the gathered candidates — O(nTables·w +
  * nTables·occupancy) dim-length dot products per row instead of the
  * exact path's O(k). With the derived-k regime (k = n/256 ≈ √n) the
  * exact assign made `dedup_semantic` O(n^1.5) — measured 68× at 30×
  * data (BENCH_NOTES r12); this probe is O(n·64) worst case, linear.
  *
  * Returns the top-`nProbe` candidate cent_ids ordered by descending
  * (cosine, cent_id) — the exact [[graft.operators.Similarity]]
  * `topCents` tie-break — restricted to the probed candidate set. An
  * empty candidate set (no centroid shares any band; probability
  * ~(1−2^−w)^(k·nTables), ≪ 10⁻¹⁰ at the activation sizes) returns an
  * EMPTY array: the caller's explode/`get(…, 0)` drops the row, a
  * deterministic recall (never precision) loss — the exact cosine ≥ τ
  * verify downstream is unchanged, so false drops stay impossible.
  *
  * The hyperplane draw is `Hyperplanes.make(nTables·w, dim, seed)` —
  * the same single-sourced seeded draw as `graft_hyperplane_sig`, and
  * the signature is computed by the SAME [[HyperplaneSig.compute]]
  * static, so the two expressions cannot disagree on a sign. The
  * centroid table rides the plan as a constructor field (data-derived,
  * so it cannot be re-derived from a seed the way the planes are);
  * `Seq[Seq[Double]]` keeps case-class equality structural for plan
  * canonicalization (the HyperplaneSig array-identity lesson).
  *
  * Null vector → NULL (unary null semantics); null ELEMENTS contribute
  * 0.0 (graft_dot convention); length ≠ dim RAISES (corrupt-row
  * discipline). Whole-stage codegen'd: one static call per row, the
  * tables shipped once per task via the references array. */
case class CentAssign(child: Expression, cents: Seq[Seq[Double]],
    nProbe: Int, w: Int, nTables: Int, seed: Long)
  extends UnaryExpression {
  require(cents.nonEmpty, "cents must be non-empty")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  require(w >= 1 && w <= 16, s"w must be in 1..16, got $w")
  require(nTables >= 1 && w * nTables <= 64,
    s"w*nTables must be in 1..64, got ${w * nTables}")

  @transient private lazy val dim: Int = cents.head.length
  @transient private lazy val flatPlanes: Array[Double] = {
    val p = graft.operators.Hyperplanes.make(w * nTables, dim, seed)
    val out = new Array[Double](w * nTables * dim)
    var i = 0
    while (i < p.length) { System.arraycopy(p(i), 0, out, i * dim, dim); i += 1 }
    out
  }
  @transient private lazy val flatCents: Array[Double] = {
    val out = new Array[Double](cents.length * dim)
    var i = 0
    cents.foreach { c =>
      require(c.length == dim, s"centroid dim ${c.length} != $dim")
      c.foreach { x => out(i) = x; i += 1 }
    }
    out
  }
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))).toArray
  /** bucket table, indexed (t << w) | bandKey → cent ids (ascending). */
  @transient private lazy val buckets: Array[Array[Int]] = {
    val bufs = Array.fill(nTables << w)(List.newBuilder[Int])
    val mask = (1L << w) - 1
    var id = 0
    while (id < cents.length) {
      // centroid signature through the SAME static as the row side
      val sig = HyperplaneSig.compute(
        ArrayData.toArrayData(flatCents.slice(id * dim, (id + 1) * dim)),
        flatPlanes, w * nTables, dim)
      var t = 0
      while (t < nTables) {
        bufs((t << w) | ((sig >>> (t * w)) & mask).toInt) += id
        t += 1
      }
      id += 1
    }
    bufs.map(_.result().toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cent_assign"

  override protected def nullSafeEval(a: Any): Any =
    CentAssign.compute(a.asInstanceOf[ArrayData], flatPlanes, flatCents,
      centNorms, buckets, w, nTables, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("planes", flatPlanes, "double[]")
      val fc = ctx.addReferenceObj("flatCents", flatCents, "double[]")
      val cn = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      val bk = ctx.addReferenceObj("buckets", buckets, "int[][]")
      s"${ev.value} = graft.functions.CentAssign.compute(" +
        s"$a, $planes, $fc, $cn, $bk, $w, $nTables, $dim, $nProbe);"
    })

  override protected def withNewChildInternal(newChild: Expression): CentAssign =
    copy(child = newChild)
}

object CentAssign {
  /** One static call per row from both the interpreted and the
    * generated path (the HyperplaneSig discipline). Candidate gather
    * dedups via a k-wide seen bitmap; the top-`nProbe` selection is an
    * insertion pass ordered by (cosine desc, cent_id desc) — exactly
    * `topCents`' reversed struct sort, so below-guard and above-guard
    * runs rank any SHARED candidate identically. */
  def compute(v: ArrayData, planes: Array[Double], flatCents: Array[Double],
      centNorms: Array[Double], buckets: Array[Array[Int]],
      w: Int, nTables: Int, dim: Int, nProbe: Int): ArrayData = {
    val sig = HyperplaneSig.compute(v, planes, w * nTables, dim)
    // ||v|| with the same ascending fold as graft_dot(v, v)
    var nv = 0.0
    var j = 0
    while (j < dim) {
      if (!v.isNullAt(j)) { val x = v.getDouble(j); nv += x * x }
      j += 1
    }
    nv = math.sqrt(nv)
    val mask = (1L << w) - 1
    val seen = new Array[Boolean](centNorms.length)
    val topIds = new Array[Int](nProbe)
    val topCos = new Array[Double](nProbe)
    var filled = 0
    var t = 0
    while (t < nTables) {
      val bucket = buckets((t << w) | ((sig >>> (t * w)) & mask).toInt)
      var b = 0
      while (b < bucket.length) {
        val id = bucket(b)
        if (!seen(id)) {
          seen(id) = true
          var acc = 0.0
          val base = id * dim
          var i = 0
          while (i < dim) {
            if (!v.isNullAt(i)) acc += v.getDouble(i) * flatCents(base + i)
            i += 1
          }
          val cos = acc / (nv * centNorms(id))
          // insertion position: entries ranking at-or-before (cos
          // desc, id desc) stay; shift the rest down
          var pos = filled
          while (pos > 0 &&
            (topCos(pos - 1) < cos ||
              (topCos(pos - 1) == cos && topIds(pos - 1) < id))) pos -= 1
          if (pos < nProbe) {
            val last = math.min(filled, nProbe - 1)
            var m = last
            while (m > pos) {
              topCos(m) = topCos(m - 1); topIds(m) = topIds(m - 1); m -= 1
            }
            topCos(pos) = cos
            topIds(pos) = id
            if (filled < nProbe) filled += 1
          }
        }
        b += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topIds, filled))
  }
}
