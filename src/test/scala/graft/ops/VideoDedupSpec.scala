package graft.ops

import graft.SparkSpec

class VideoDedupSpec extends SparkSpec {
  import Multimodal._

  private def row(id: Long, payload: Array[Byte]): MediaRow =
    MediaRow(id, "video", payload.length.toLong, payload)

  /** Spec-side Y4M writer with a configurable chroma tag — the
    * re-encode fixture (same rasters, different container params).
    */
  private def y4mWith(melody: Long, brightness: Int, cs: String,
                      header: String = ""): Array[Byte] = {
    val w = 32; val h = 32
    val pat = melodyPattern(melody)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F30:1$header C$cs\n".getBytes("US-ASCII"))
    val chromaLen = cs match {
      case "420" => 2 * (w / 2) * (h / 2)
      case "444" => 2 * w * h
      case "mono" => 0
    }
    val chroma = new Array[Byte](chromaLen)
    java.util.Arrays.fill(chroma, 128.toByte)
    for (f <- 0 until 16) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      val y = new Array[Byte](w * h)
      for (yy <- 0 until h; xx <- 0 until w) {
        val cell = f * 4 + (if (yy * 2 >= h) 2 else 0) + (if (xx * 2 >= w) 1 else 0)
        y(yy * w + xx) =
          (110 + brightness + (if (((pat >>> cell) & 1L) == 1L) 40 else -40)).toByte
      }
      out.write(y); out.write(chroma)
    }
    out.toByteArray
  }

  private def fp(payloads: (Long, Array[Byte])*): Map[Long, VideoHash] = {
    val ds = spark.createDataset(payloads.map { case (id, p) => row(id, p) })(
      org.apache.spark.sql.Encoders.product[MediaRow])
    videoFingerprint(ds).collect().map(v => v.media_id -> v).toMap
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("Y4M decode recovers the planted spatio-temporal pattern exactly") {
    val m = fp(1L -> syntheticY4m(melody = 3))
    assert(m(1L).real, "Y4M payload must take the REAL decode path")
    assert(m(1L).vhash == melodyPattern(3),
      "fingerprint must equal the encoded pattern bit for bit")
  }

  test("uniform brightness shift is EXACTLY invariant (different bytes, hamming 0)") {
    val a = syntheticY4m(melody = 5, brightness = 0)
    val b = syntheticY4m(melody = 5, brightness = 48)
    assert(!java.util.Arrays.equals(a, b), "shifted payloads must differ")
    val m = fp(1L -> a, 2L -> b)
    assert(m(1L).vhash == m(2L).vhash)
  }

  test("positive gain scale flips no bits (cells scale with their mean)") {
    val base = syntheticY4m(melody = 2)
    // scale every luma byte by 1.25 in place (frame layout: header line,
    // then per frame "FRAME\n" + Y(32*32) + U,V(16*16 each))
    val scaled = base.clone()
    var i = 0
    while (scaled(i) != '\n') i += 1
    var p = i + 1
    while (p < scaled.length) {
      p += 6 // "FRAME\n"
      for (j <- 0 until 32 * 32)
        scaled(p + j) = math.min(255, math.round((scaled(p + j) & 0xFF) * 1.25)).toByte
      p += 32 * 32 + 2 * 16 * 16
    }
    val m = fp(1L -> base, 2L -> scaled)
    assert(m(2L).real)
    assert(ham(m(1L).vhash, m(2L).vhash) == 0)
  }

  test("re-encode across chroma formats (C420/C444/mono) is bit-identical") {
    val m = fp(
      1L -> y4mWith(4, 10, "420"),
      2L -> y4mWith(4, 10, "444"),
      3L -> y4mWith(4, 10, "mono"),
      4L -> y4mWith(4, 10, "420", header = " Ip A1:1"))
    assert(Seq(1L, 2L, 3L, 4L).forall(m(_).real))
    assert(Set(m(1L).vhash, m(2L).vhash, m(3L).vhash, m(4L).vhash).size == 1)
  }

  test("distinct melodies stay far apart; planted patterns pairwise hamming > 20") {
    val pats = (0L until 7L).map(melodyPattern)
    for (a <- pats.indices; b <- a + 1 until pats.size)
      assert(ham(pats(a), pats(b)) > 20, s"melodies $a/$b too close")
    val m = fp(1L -> syntheticY4m(0), 2L -> syntheticY4m(1))
    assert(ham(m(1L).vhash, m(2L).vhash) > 20)
  }

  test("animated GIF takes the real decode path too") {
    // two-frame uniform-gray GIF via the JDK's gif writer
    def gif(l0: Int, l1: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (l <- Seq(l0, l1)) {
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 16; x <- 0 until 16)
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    val m = fp(1L -> gif(40, 200), 2L -> gif(40, 200), 3L -> gif(200, 40))
    assert(m(1L).real && m(3L).real)
    assert(m(1L).vhash == m(2L).vhash, "same rasters ⇒ same fingerprint")
    assert(ham(m(1L).vhash, m(3L).vhash) > 8, "reversed clip must differ")
  }

  test("corrupt/truncated Y4M and non-video bytes fall back deterministically") {
    val truncated = syntheticY4m(0).take(100).toArray
    val m = fp(1L -> truncated, 2L -> "just text".getBytes("UTF-8"),
      3L -> "just text".getBytes("UTF-8"))
    assert(!m(1L).real && !m(2L).real)
    assert(m(2L).vhash == m(3L).vhash, "FNV fallback is content-deterministic")
  }

  test("videoMetadata: Y4M header truth across chroma variants, GIF, corrupt") {
    def gif1(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val img = new java.awt.image.BufferedImage(
        9, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
      javax.imageio.ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    val rows = Seq(
      row(1L, syntheticY4m(0, 0, w = 24, h = 16)),
      row(2L, y4mWith(1, 0, "444")),
      row(3L, y4mWith(1, 0, "mono")),
      row(4L, gif1()),
      row(5L, syntheticY4m(0).take(50).toArray),
      row(6L, "plain text".getBytes))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val m = videoMetadata(ds).collect().map(v => v.media_id -> v).toMap
    assert(m(1L) == VideoMeta(1L, true, Some("y4m"), Some(24), Some(16),
      Some(25), Some(1), Some(16)))
    assert(m(2L).container.contains("y4m") && m(2L).n_frames.contains(16) &&
      m(2L).fps_num.contains(30))
    assert(m(3L).width.contains(32) && m(3L).n_frames.contains(16))
    assert(m(4L) == VideoMeta(4L, true, Some("gif"), Some(9), Some(7),
      None, None, Some(1)))
    assert(m(5L) == VideoMeta(5L, false, None, None, None, None, None, None),
      "truncated Y4M must degrade to the total-null row")
    assert(!m(6L).is_video)
  }

  test("syntheticWav decodes to its planted rate/channels/frames and exact RMS") {
    val rows = Seq(
      MediaRow(1L, "audio", 0L, syntheticWav(16000f, 2, 120)),
      MediaRow(2L, "audio", 0L, syntheticWav(8000f, 1, 80, value = 16384)))
      .map(m => m.copy(byte_len = m.payload.length.toLong))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val m = decodeAudio(ds).collect().map(a => a.media_id -> a).toMap
    assert(m(1L).real && m(1L).sample_rate == 16000f && m(1L).channels == 2 &&
      m(1L).n_frames == 120L)
    assert(math.abs(m(1L).rms - 12000.0 / 32768) < 1e-9)
    // 16384/32768 = 0.5 exactly
    assert(math.abs(m(2L).rms - 0.5) < 1e-9 && m(2L).n_frames == 80L)
  }

  test("videoDupPairs: exact dups, brightness-shifted near-dups, text fallback") {
    val clipA0 = syntheticY4m(melody = 0, brightness = 0)
    val clipA1 = syntheticY4m(melody = 0, brightness = 24) // near-dup of A0
    val clipB = syntheticY4m(melody = 1)
    val rows = Seq(
      row(1L, clipA0), row(2L, clipA1), row(3L, clipA0.clone()), // 3 = exact dup of 1
      row(4L, clipB),
      row(5L, "same text".getBytes), row(6L, "same text".getBytes),
      row(7L, "other text".getBytes))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val pairs = videoDupPairs(ds, maxHamming = 4, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0), (5L, 6L, 0)),
      s"got $pairs")
  }
}
