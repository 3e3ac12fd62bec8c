package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The external-decoder seam (r14): a fake transcoder proves the
  * PLUMBING — codec payloads route through toY4m/toWav into the
  * existing pure-JDK raster/PCM paths, real=true, and the pair joins
  * see the perceptual hash, not the FNV fallback. The ffmpeg
  * implementation itself is host-dependent and exercised only where
  * a binary exists (never in CI — FfmpegTranscoder.ifAvailable
  * resolves None here).
  */
class TranscodeSpec extends SparkSpec {
  import Multimodal._
  import spark.implicits._

  /** "Codec" fixture: payloads tagged FAKEVID<melody>/FAKEAUD<value>
    * "decode" (via the seam) to the deterministic synthetic Y4M/WAV
    * the pure-JDK specs already pin down.
    */
  private object FakeTranscoder extends MediaTranscoder {
    override def toY4m(payload: Array[Byte]): Option[Array[Byte]] = {
      val s = new String(payload, "US-ASCII")
      if (s.startsWith("FAKEVID")) Some(syntheticY4m(melody = s.drop(7).toLong))
      else None
    }
    override def toWav(payload: Array[Byte]): Option[Array[Byte]] = {
      val s = new String(payload, "US-ASCII")
      if (s.startsWith("FAKEAUD"))
        Some(syntheticWav(16000f, 1, 160, value = s.drop(7).toShort))
      else None
    }
  }

  private def vrow(id: Long, payload: Array[Byte]): MediaRow =
    MediaRow(id, "video", payload.length.toLong, payload)

  test("video seam: transcoded payload fingerprints real=true, equal to the direct Y4M hash") {
    val direct = vrow(1L, syntheticY4m(melody = 3L))
    val viaCodec = vrow(2L, "FAKEVID3".getBytes("US-ASCII"))
    val declined = vrow(3L, "not a video".getBytes("US-ASCII"))
    val out = videoFingerprint(
        Seq(direct, viaCodec, declined).toDS(), transcoder = FakeTranscoder)
      .collect().map(v => v.media_id -> v).toMap
    assert(out(1L).real && out(2L).real && !out(3L).real)
    assert(out(1L).vhash == out(2L).vhash,
      "the seam must feed the SAME raster walk as the direct Y4M path")
    // without the seam the codec payload keeps the honest FNV fallback
    val plain = videoFingerprint(Seq(viaCodec).toDS()).collect().head
    assert(!plain.real && plain.vhash != out(2L).vhash)
  }

  test("video seam: dup pairs match a codec twin to its Y4M original at hamming 0") {
    val rows = Seq(
      vrow(10L, syntheticY4m(melody = 5L)),
      vrow(11L, "FAKEVID5".getBytes("US-ASCII")), // same clip, codec container
      vrow(12L, syntheticY4m(melody = 1L)))       // different clip
    val pairs = videoDupPairs(rows.toDS(), maxHamming = 4, bands = 8,
        transcoder = FakeTranscoder)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((10L, 11L, 0)),
      s"expected exactly the cross-container twin pair, got ${pairs.toSeq}")
  }

  test("audio seam: transcoded payload decodes real=true with the WAV arithmetic") {
    val viaCodec = MediaRow(1L, "audio", 12L, "FAKEAUD12000".getBytes("US-ASCII"))
    val out = decodeAudio(Seq(viaCodec).toDS(), transcoder = FakeTranscoder)
      .collect().head
    assert(out.real && out.sample_rate == 16000f && out.channels == 1)
    assert(math.abs(out.rms - 12000.0 / 32768) < 1e-9)
    val fp = audioFingerprint(Seq(viaCodec).toDS(), transcoder = FakeTranscoder)
      .collect().head
    assert(fp.real, "the fingerprint path must route through the seam too")
  }

  test("NoTranscoder declines everything; ffmpeg detection is a clean Option") {
    assert(NoTranscoder.toY4m("FAKEVID1".getBytes).isEmpty)
    assert(NoTranscoder.toWav("FAKEAUD1".getBytes).isEmpty)
    // host-dependent: just must not throw, and orNone is always usable
    val t = FfmpegTranscoder.orNone
    assert(t.toY4m("garbage".getBytes).isEmpty,
      "garbage bytes must decline on any host")
  }

  test("fallback hashes never pair at perceptual distances (the banded-join guard)") {
    // feed the shared pair kernel synthetic hashes: fallback (real =
    // false) hashes one bit apart must NOT pair (FNV proximity is
    // noise — the r13 advice's spurious-pair hazard), while the same
    // distance between REAL perceptual hashes must; real/fallback
    // never mix even at hamming 0, and equal fallback hashes pair at
    // the identity distance 0.
    val hashes = Seq(
      (1L, 0L, false), (2L, 1L, false),   // fallback, hamming 1 → no pair
      (3L, 0L, true), (4L, 1L, true),     // real, hamming 1 → pair
      (5L, 0L, false),                    // equals 1's hash → identity pair
      (6L, 2L, true)                      // real at hamming 1 from id=4
    ).toDF("id", "h", "real")
    val got = Multimodal.bandedHammingPairs(hashes, maxHamming = 8, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (3L, 4L, 1), (4L, 6L, 2), (3L, 6L, 1), // real pairs by true hamming
      (1L, 5L, 0)),                          // fallback identity only
      s"got $got")
  }
}
