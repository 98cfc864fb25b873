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

  test("BMP decoder handles padding, bottom-up vs top-down rows, and rejects non-BMPs") {
    def le(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    // hand-built 2x2 24-bit BMP: width 2 → 6-byte rows PADDED to 8
    // (the column-space encoder only emits pad-free 16-px rows, so this
    // exercises the decoder's stride handling independently)
    // image pixels (B,G,R): top row (1,2,3) (4,5,6); bottom (7,8,9) (10,11,12)
    val topRow = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0)
    val bottomRow = Array[Byte](7, 8, 9, 10, 11, 12, 0, 0)
    def bmp(height: Int, rows: Array[Byte]): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le(54 + rows.length, 4) ++ le(0, 4) ++ le(54, 4) ++
        le(40, 4) ++ le(2, 4) ++ le(height, 4) ++ le(1, 2) ++ le(24, 2) ++
        le(0, 4) ++ le(rows.length, 4) ++ le(0, 16) ++ rows
    val bottomUp = bmp(2, bottomRow ++ topRow)       // positive height
    val topDown = bmp(-2, topRow ++ bottomRow)       // negative height
    for (b <- Seq(bottomUp, topDown)) {
      val d = Multimodal.decodeBmp(b).get
      assert((d.width, d.height, d.bpp, d.n_pixels) === ((2, 2, 24, 4L)))
      assert(d.mean_b === (1 + 4 + 7 + 10) / 4.0)
      assert(d.mean_g === (2 + 5 + 8 + 11) / 4.0)
      assert(d.mean_r === (3 + 6 + 9 + 12) / 4.0)
    }
    // rejections: bad magic, truncated pixel array, unsupported depth
    assert(Multimodal.decodeBmp("XX".getBytes ++ bottomUp.drop(2)).isEmpty)
    assert(Multimodal.decodeBmp(bottomUp.dropRight(1)).isEmpty)
    val bpp8 = bottomUp.clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).isEmpty)
  }

  test("resize: 4x4 block means in display orientation, both row orders, floor edges") {
    def le(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    // 4x5 image, width 4 → 12-byte rows padded to 12 (already aligned);
    // pixel (display r, x) has B=r*10+x, G=B+100, R=x  (values < 128)
    val w = 4; val h = 5
    def dispRow(r: Int): Array[Byte] =
      (0 until w).flatMap(x => Seq((r * 10 + x).toByte, (r * 10 + x + 100).toByte, x.toByte)).toArray
    def bmp(height: Int, rows: Array[Byte]): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le(54 + rows.length, 4) ++ le(0, 4) ++ le(54, 4) ++
        le(40, 4) ++ le(w, 4) ++ le(height, 4) ++ le(1, 2) ++ le(24, 2) ++
        le(0, 4) ++ le(rows.length, 4) ++ le(0, 16) ++ rows
    val bottomUp = bmp(h, (h - 1 to 0 by -1).flatMap(dispRow).toArray)
    val topDown = bmp(-h, (0 until h).flatMap(dispRow).toArray)
    for (b <- Seq(bottomUp, topDown)) {
      val px = Multimodal.resizeBmp(b, 7L)
      // thumb is 1x1 (5 display rows floor to one 4-row block); display
      // rows 0-3, all 4 columns: B mean = mean(r*10+x) = 15+1.5
      assert(px === Seq(Multimodal.ThumbPixel(7L, 0L, 0L, 16.5, 116.5, 1.5)))
    }
    // rejection mirrors the decoder
    assert(Multimodal.resizeBmp("XX".getBytes ++ bottomUp.drop(2), 1L).isEmpty)
  }

  test("audio resample: block means, loudest block, floor edge, 16-bit path") {
    // 8-bit mono: 10 samples -> 2 blocks of 4, samples 9-10 dropped
    def le(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def wav8(samples: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le(samples.length + 36, 4) ++ "WAVEfmt ".getBytes ++
        le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(8000, 4) ++ le(8000, 4) ++
        le(1, 2) ++ le(8, 2) ++ "data".getBytes ++ le(samples.length, 4) ++ samples
    val b = wav8(Array[Byte](10, 20, 30, 40, 1, 2, 3, 94, 99, 99))
    val r = Multimodal.resampleWav(b, 5L).get
    assert(r.sr_out === 2000)
    assert(r.n_out === 2L)
    assert(r.peak_block === 100 / 4.0)            // both blocks sum 100
    assert(r.mean_amp === 200 / 8.0)              // first 8 samples only
    // 16-bit signed: negative samples sign-extend through the blocks
    def wav16(samples: Array[Int], channels: Int = 1): Array[Byte] =
      "RIFF".getBytes ++ le(samples.length * 2 + 36, 4) ++ "WAVEfmt ".getBytes ++
        le(16, 4) ++ le(1, 2) ++ le(channels, 2) ++ le(8000, 4) ++
        le(8000 * 2 * channels, 4) ++ le(2 * channels, 2) ++ le(16, 2) ++
        "data".getBytes ++ le(samples.length * 2, 4) ++
        samples.flatMap(v => le(v, 2))
    val r16 = Multimodal.resampleWav(wav16(Array(-100, -100, -100, -100, 400, 0, 0, 0)), 6L).get
    assert(r16.n_out === 2L)
    assert(r16.mean_amp === 0.0)
    assert(r16.peak_block === 100.0)
    // stereo: a block is 4 FRAMES = 8 values (downmix), sr_out counts frames;
    // 6 stereo frames = 12 values -> ONE full 4-frame block, 2 frames dropped
    val rs = Multimodal.resampleWav(
      wav16(Array(8, -8, 8, -8, 8, -8, 8, -8, 99, 99, 99, 99), channels = 2), 7L).get
    assert(rs.sr_out === 2000)
    assert(rs.n_out === 1L)
    assert(rs.mean_amp === 0.0)   // L/R cancel inside the downmix block
    assert(rs.peak_block === 0.0)
    // rejection mirrors the decoder
    assert(Multimodal.resampleWav("XX".getBytes ++ b.drop(2), 1L).isEmpty)
  }

  test("image decode pipeline: dimensions and channel means recompute from source bytes") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = Multimodal.imageDecodePipeline(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bytes = docs(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      val h = bytes.length / 48
      val data = bytes.take(h * 48).map(_ & 0xff)
      assert(r.getAs[Int]("width") === 16)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("n_pixels") === 16L * h)
      def mean(ch: Int) =
        data.zipWithIndex.collect { case (v, i) if i % 3 == ch => v.toLong }
          .sum.toDouble / (16L * h)
      assert(r.getAs[Double]("mean_b") === mean(0))
      assert(r.getAs[Double]("mean_g") === mean(1))
      assert(r.getAs[Double]("mean_r") === mean(2))
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

  test("scene cut: planted frame jump detected, uniform doc silent, driver recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-scut").toFile.getAbsolutePath
    val jump = "a" * 128 + "z" * 128 + "z" * 128   // cut at frame 1 only
    val flat = "m" * 384                            // no cuts
    val short = "q" * 100                           // < 2 frames: excluded
    Seq((1L, jump, "en", "s", 1L), (2L, flat, "en", "s", 1L), (3L, short, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Multimodal.sceneCut(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, ('z' - 'a').toLong * 128)))

    // real corpus: every emitted cut matches a from-scratch recompute
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def refCuts(text: String): Seq[(Long, Long)] = {
      val n = text.length / 128
      if (n < 2) Seq.empty
      else {
        val sums = (0 until n).map(f =>
          text.substring(f * 128, f * 128 + 128).map(_.toLong).sum)
        (1 until n).map(f => (f.toLong, sums(f) - sums(f - 1)))
          .filter { case (_, dl) => math.abs(dl) > 300 }
      }
    }
    val want = docs.toSeq.flatMap { case (id, t) =>
      refCuts(t).map { case (f, dl) => (id, f, dl) }
    }.sorted
    val real = Multimodal.sceneCut(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(real === want && real.nonEmpty)
  }

  test("video container: AVI parse indexes real offsets, fused cut selector, rejects corrupt files") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-avi").toFile.getAbsolutePath
    val jump = "a" * 128 + "z" * 128 + "z" * 128 + "z" * 128 // cut at frame 1
    val flat = "m" * 384                                     // even frames only
    val one = "q" * 130                                      // single frame
    Seq((1L, jump, "en", "s", 1L), (2L, flat, "en", "s", 1L), (3L, one, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Multimodal.videoContainer(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    // jump: frames 0,2 by stride, frame 1 by the fused cut rule
    // flat: frames 0,2; one-frame doc: frame 0
    assert(got.toSeq === Seq(
      (1L, 4, 0, 108L, 0), (1L, 4, 1, 244L, 1), (1L, 4, 2, 380L, 0),
      (2L, 3, 0, 108L, 0), (2L, 3, 2, 380L, 0),
      (3L, 1, 0, 108L, 0)))

    // the indexed byte_offset must point at the REAL frame bytes
    // inside the container (the range-read contract)
    val blob = Tables.documents(spark, d).filter(col("doc_id") === 1)
      .withColumn("frames", expr("CAST(length(text) div 128 AS INT)"))
      .select(Multimodal.aviColumn(encode(col("text"), "utf-8"), col("frames")))
      .head().getAs[Array[Byte]](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    Multimodal.videoContainer(spark, d).filter(col("doc_id") === 1).collect()
      .foreach { r =>
        val off = r.getLong(3).toInt
        val slice = blob.slice(off, off + 128)
        assert(new String(slice, "US-ASCII") ===
          jump.substring(r.getInt(2) * 128, r.getInt(2) * 128 + 128))
        assert(md.digest(slice).map("%02x".format(_)).mkString ===
          r.getString(5), "frame_md5 is the md5 of the bytes at byte_offset")
      }

    // parser is a real validator, not a round-trip: corruptions reject
    assert(Multimodal.parseAvi(blob).isDefined)
    val badMagic = blob.clone(); badMagic(9) = 'X'.toByte
    assert(Multimodal.parseAvi(badMagic).isEmpty, "broken AVI fourcc")
    val badLen = blob.clone()
    // inflate the first movi frame chunk's length field past the file
    badLen(105) = 0x7f.toByte
    assert(Multimodal.parseAvi(badLen).isEmpty, "truncated chunk")
    val badCount = blob.clone()
    badCount(12 + 8 + 4 + 8 + 16) = 9 // dwTotalFrames != indexed frames
    assert(Multimodal.parseAvi(badCount).isEmpty, "header/index frame-count mismatch")

    // real corpus smoke: nonempty, even-or-cut rule holds everywhere
    val corpus = Multimodal.videoContainer(spark, sf0001).collect()
    assert(corpus.nonEmpty)
    corpus.foreach(r =>
      assert(r.getInt(2) % 2 == 0 || r.getInt(4) == 1, "even frame or cut"))
  }
}
