package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  test("decode pipeline: every doc decodes, stats recompute from the source bytes") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = Multimodal.decodePipeline(spark, sf0001).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val bytes = docs(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") === bytes.length + 44L)
      assert(r.getAs[Int]("sample_rate") === 8000)
      assert(r.getAs[Int]("channels") === 1)
      assert(r.getAs[Int]("bits") === 8)
      assert(r.getAs[Long]("n_samples") === bytes.length.toLong)
      assert(r.getAs[Long]("duration_ms") === bytes.length * 1000L / 8000)
      val vals = bytes.map(_ & 0xff)
      assert(r.getAs[Double]("mean_amp") === vals.map(_.toLong).sum.toDouble / vals.length)
      assert(r.getAs[Int]("peak_amp") === vals.max)
    }
  }

  test("WAV decoder is a generic RIFF parser, not a round-trip of the encoder") {
    def le(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def s(x: String) = x.getBytes("US-ASCII")
    // hand-built 16-bit STEREO 44.1 kHz WAV with an unknown LIST chunk
    // (odd-length, exercising word-alignment) BEFORE fmt/data — none of
    // which the column-space encoder ever produces
    val samples = Seq[Short](1000, -1000, 2000, -2000, 0, 32767)
    val data = samples.flatMap(v => le(v & 0xffff, 2)).toArray
    val listBody = s("INFOx") // 5 bytes: odd, needs a pad byte
    val fmt = le(1, 2) ++ le(2, 2) ++ le(44100, 4) ++ le(44100 * 4, 4) ++
      le(4, 2) ++ le(16, 2)
    val body = s("LIST") ++ le(listBody.length, 4) ++ listBody ++ Array(0.toByte) ++
      s("fmt ") ++ le(fmt.length, 4) ++ fmt ++
      s("data") ++ le(data.length, 4) ++ data
    val wav = s("RIFF") ++ le(body.length + 4, 4) ++ s("WAVE") ++ body
    val dec = Multimodal.decodeWav(wav).get
    assert(dec.sample_rate === 44100 && dec.channels === 2 && dec.bits === 16)
    assert(dec.n_samples === 3)          // 6 values / 2 channels
    assert(dec.duration_ms === 0L)
    assert(dec.mean_amp === samples.map(_.toLong).sum.toDouble / 6)
    assert(dec.peak_amp === 32767)
    // non-WAV, truncated, and non-PCM payloads are all rejected
    assert(Multimodal.decodeWav("not a riff file".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav.dropRight(3)).isEmpty)
    val nonPcm = wav.clone(); nonPcm(wav.indexOfSlice(s("fmt ")) + 8) = 3
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("column-space WAV container is byte-valid and decoder-consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val txt = "hello wav"
    val payload = Seq(txt).toDF("t")
      .select(Multimodal.wavColumn(encode(col("t"), "utf-8")))
      .collect()(0).getAs[Array[Byte]](0)
    assert(payload.length === txt.length + 44)
    val dec = Multimodal.decodeWav(payload).get
    assert(dec.n_samples === txt.length.toLong)
    assert(dec.peak_amp === txt.getBytes.map(_ & 0xff).max)
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
