package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  test("decode pipeline preserves every record and derives features from payload bytes") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = Multimodal.decodePipeline(spark, sf0001).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val n = docs(r.getAs[Long]("doc_id")).getBytes("UTF-8").length
      assert(r.getAs[Long]("n_bytes") === n.toLong)
      assert(r.getAs[Int]("width") === n % 256)
      assert(r.getAs[Int]("height") === (n / 256) % 256)
      assert(r.getAs[Int]("frames") === 1 + n % 4)
    }
  }

  test("chunk -> reassemble roundtrip is intact for every blob, including multi-chunk") {
    val out = Multimodal.reassemble(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .filter(_._2.getBytes("UTF-8").nonEmpty)
    assert(out.length === docs.length)
    out.foreach { r =>
      assert(r.getAs[String]("payload_md5") === r.getAs[String]("reassembled_md5"))
      assert(r.getAs[Int]("intact") === 1)
    }
    // the corpus must actually exercise the multi-chunk path
    assert(docs.count(_._2.getBytes("UTF-8").length > 256) > 0)
  }

  test("frame sampling emits every 2nd frame with correct offsets and witnesses") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = Multimodal.frameSample(spark, sf0001).collect()
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { r =>
      // frames are fixed-width slices of the decoded (character) stream
      val chars = docs(r.getAs[Long]("doc_id"))
      val frames = chars.length / 128
      assert(r.getAs[Int]("total_frames") === frames)
      val f = r.getAs[Int]("frame_no")
      assert(f % 2 === 0 && f < frames)
      assert(r.getAs[Int]("frame_offset") === f * 128)
      val slice = chars.substring(f * 128, math.min(f * 128 + 128, chars.length))
      val hex = md.digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("frame_md5") === hex)
    }
  }
}
