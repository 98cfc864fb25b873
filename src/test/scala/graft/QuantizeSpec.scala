package graft

import java.nio.file.Files

import graft.operators.Similarity

/** INT8 scalar quantization and JL random projection: driver-side
  * recomputation pins codes/errors/projections exactly; statistical
  * properties pin the geometry. */
class QuantizeSpec extends SparkSpec {

  private def r0(x: Double): Double =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("emb_quantize_int8: codes, errors and checksum match a driver recompute") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sq8").toFile.getAbsolutePath
    val vecs = Seq(
      (1L, Seq(1.0f, -2.0f, 0.0f, 0.5f), 0),
      (2L, Seq(0.5f, 2.0f, 0.0f, -0.25f), 0),
      (3L, Seq(-1.0f, 0.3f, 0.0f, 0.1f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    // driver reference, same arithmetic
    val cols = vecs.map(_._2.map(_.toDouble))
    val amax = (0 until 4).map(i => cols.map(v => math.abs(v(i))).max)
    def ref(v: Seq[Double]) = {
      val codes = v.zipWithIndex.map { case (x, i) =>
        if (amax(i) > 0)
          math.max(-127L, math.min(127L, r0(x / amax(i) * 127.0).toLong))
        else 0L
      }
      val errs = v.zipWithIndex.map { case (x, i) =>
        r0((x - codes(i).toDouble * amax(i) / 127.0) * 1000000.0).toLong
      }
      val mse = BigDecimal(errs.map(e => BigDecimal(e) * BigDecimal(e)).sum.toDouble)
        .toDouble / (v.length.toDouble * 1.0e12)
      (v.length.toLong,
        BigDecimal(mse).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        errs.map(math.abs).max.toDouble / 1000000.0,
        codes.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum)
    }
    val got = Similarity.embQuantizeInt8(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got === vecs.map(v => v._1 -> ref(v._2.map(_.toDouble))).toMap)
    // exact-representable corners quantize losslessly
    assert(got(1L)._3 === 0.0)
  }

  test("emb_rp_project: exact driver recompute + norm preservation in expectation") {
    val signs = Similarity.rpSigns(64, 16)
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    val got = Similarity.embRpProject(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === vecs.size * 16)

    def proj(v: Seq[Double], j: Int): Double = {
      val qx = v.map(x => r0(x * 1000000.0))
      qx.indices.map(i => signs(j)(i) * qx(i)).sum / 1000000.0
    }
    vecs.take(5).foreach { case (id, v) =>
      (0 until 16).foreach { j =>
        assert(got((id, j.toLong)) === proj(v, j), s"vec $id dim $j")
      }
    }
    // E[||Px||^2] = outDim * ||x||^2 for ±1 rows — corpus mean ratio ≈ 1
    val ratios = vecs.map { case (id, v) =>
      val qx = v.map(x => r0(x * 1000000.0))
      val nx = qx.map(x => x * x).sum / 1.0e12
      val np = (0 until 16).map(j => math.pow(got((id, j.toLong)), 2)).sum
      np / (16.0 * nx)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    // deterministic across runs
    val again = Similarity.embRpProject(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(again === got)
  }
}
