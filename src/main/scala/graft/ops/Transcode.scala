package graft.ops

/** Pluggable EXTERNAL-decoder seam for codec containers a pure JDK
  * cannot read (MP4/H.264, MP3, AAC, WebM, …) — the r13 verdict's
  * "codec breadth" gap. The seam is a transcode-to-open-container
  * contract: an implementation turns an arbitrary payload into Y4M
  * bytes (video) or WAV bytes (audio), and everything downstream —
  * [[Multimodal.videoFingerprint]]'s Y4M raster walk,
  * [[Multimodal.decodeAudio]]/[[Multimodal.audioFingerprint]]'s
  * javax.sound WAV decode, the banded-hamming pair joins — is the
  * existing, spec-covered pure-JDK machinery. Swapping decoders
  * changes ONLY the per-payload byte transform, never the Spark
  * plumbing (schema, batching, partitioning, pair joins).
  *
  * Two implementations:
  *   - [[FfmpegTranscoder]]: a bounded `ffmpeg` subprocess when the
  *     binary is present on this host (production posture — media
  *     clusters ship decode tools on the image). Detected, never
  *     required.
  *   - [[NoTranscoder]]: the default; every payload declines, so
  *     non-JDK codecs keep the deterministic FNV fallback and CI
  *     stays pure-JDK and byte-reproducible.
  *
  * Implementations must be Serializable: they ride `mapPartitions`
  * closures to the executors, so they hold only small config (a
  * binary path), never process state.
  */
trait MediaTranscoder extends Serializable {

  /** Transcode `payload` to YUV4MPEG2 bytes, or None when this
    * transcoder declines (unrecognized container, decode failure,
    * resource cap hit). Must never throw.
    */
  def toY4m(payload: Array[Byte]): Option[Array[Byte]]

  /** Transcode `payload` to RIFF/WAVE (16-bit PCM) bytes, or None. */
  def toWav(payload: Array[Byte]): Option[Array[Byte]]
}

/** The default seam: decline everything, keep the pure-JDK paths. */
object NoTranscoder extends MediaTranscoder {
  override def toY4m(payload: Array[Byte]): Option[Array[Byte]] = None
  override def toWav(payload: Array[Byte]): Option[Array[Byte]] = None
}

/** `ffmpeg`-subprocess transcoder: the payload is spooled to a
  * bounded temp file and passed as a SEEKABLE `-i` argument — typical
  * MP4s store the moov atom at the END of the container, so ffmpeg
  * cannot probe them from a non-seekable `pipe:0` and a stdin feed
  * would silently decline exactly the headline codec (H.264/MP4) back
  * to the FNV fallback. Output stays a stdout pipe. A wall-clock kill
  * switch and an output size cap ensure one adversarial payload can't
  * wedge an executor core or balloon its memory. Fingerprinting needs
  * only coarse rasters, so video is downscaled to 32×32 and capped at
  * `maxFrames` before the spatio-temporal hash's own 16-frame
  * sampling.
  *
  * Container sniffing is deliberately loose (ffmpeg probes better
  * than magic bytes): any payload the JDK paths declined may be
  * offered; a decline here (non-zero exit, empty output, timeout)
  * degrades to the caller's FNV fallback, the total-function
  * contract of every decode path in [[Multimodal]].
  */
final class FfmpegTranscoder(
    binary: String = "ffmpeg",
    timeoutMs: Long = 30000L,
    maxOutputBytes: Int = 64 << 20,
    maxFrames: Int = 64) extends MediaTranscoder {

  override def toY4m(payload: Array[Byte]): Option[Array[Byte]] =
    run(payload, Seq("-vf", "scale=32:32",
      "-frames:v", maxFrames.toString, "-pix_fmt", "yuv420p",
      "-f", "yuv4mpegpipe", "pipe:1"))
      .filter(Multimodal.looksLikeY4m)

  override def toWav(payload: Array[Byte]): Option[Array[Byte]] =
    run(payload, Seq("-ac", "1", "-ar", "16000",
      "-c:a", "pcm_s16le", "-f", "wav", "pipe:1"))
      .filter(Multimodal.looksLikeWav)

  /** One bounded subprocess round trip; None on any failure. The
    * payload (already an in-memory Array[Byte], so bounded by the
    * column it came from) is spooled to a per-call temp file — ffmpeg
    * needs seekable input to probe end-of-file indexes (MP4 moov,
    * MOV, some AVI) — and deleted when the run ends on ANY path.
    */
  private def run(payload: Array[Byte],
                  outArgs: Seq[String]): Option[Array[Byte]] = {
    var spool: java.nio.file.Path = null
    try {
      spool = java.nio.file.Files.createTempFile("graft_av_", ".bin")
      java.nio.file.Files.write(spool, payload)
      val cmd = (Seq(binary, "-hide_banner", "-loglevel", "error",
        "-nostdin", "-i", spool.toString) ++ outArgs).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      val p = pb.start()
      // no stdin feed: input is the seekable spool file
      try p.getOutputStream.close()
      catch { case _: java.io.IOException => () }
      val drainer = new Thread(() => {
        try { while (p.getErrorStream.read() >= 0) () }
        catch { case _: java.io.IOException => () }
      })
      drainer.setDaemon(true)
      drainer.start()
      // hard watchdog: a decoder that produces NO output would block
      // the reader in in.read() forever if the deadline were only
      // checked between reads — destroying the process closes its
      // pipes, so every blocked read wakes with EOF/IOException
      val watchdog = new Thread(() => {
        try {
          if (!p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
            p.destroyForcibly()
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      val in = p.getInputStream
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var n = in.read(buf)
      var overflow = false
      while (n >= 0 && !overflow) {
        bos.write(buf, 0, n)
        if (bos.size() > maxOutputBytes || System.nanoTime() > deadline)
          overflow = true
        else n = in.read(buf)
      }
      if (overflow) { p.destroyForcibly(); None }
      else if (!p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        p.destroyForcibly(); None
      } else if (p.exitValue() != 0 || bos.size() == 0) None
      else Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (spool != null) {
      try java.nio.file.Files.deleteIfExists(spool)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

object FfmpegTranscoder {

  /** The host's ffmpeg, if any — PATH probe, cached per JVM. Resolved
    * on whichever JVM first calls it; for per-EXECUTOR semantics use
    * [[orNone]], which defers the probe into the task.
    */
  @transient lazy val ifAvailable: Option[MediaTranscoder] = {
    val paths = Option(System.getenv("PATH")).getOrElse("")
      .split(java.io.File.pathSeparator)
    val found = paths.exists { d =>
      val f = new java.io.File(d, "ffmpeg")
      f.isFile && f.canExecute
    }
    if (found) Some(new FfmpegTranscoder()) else None
  }

  /** Per-JVM auto-detecting transcoder: serializes as config only and
    * re-probes PATH lazily on whatever JVM runs it — so on a cluster
    * each EXECUTOR decides from its own image (decode capability is a
    * property of the host), not from what the driver happened to
    * have.
    */
  private final class AutoTranscoder extends MediaTranscoder {
    @transient private lazy val inner: MediaTranscoder =
      ifAvailable.getOrElse(NoTranscoder)
    override def toY4m(payload: Array[Byte]): Option[Array[Byte]] =
      inner.toY4m(payload)
    override def toWav(payload: Array[Byte]): Option[Array[Byte]] =
      inner.toWav(payload)
  }

  /** The production default: ffmpeg when the RUNNING host has it,
    * decline otherwise — probed per JVM at first use (see
    * [[AutoTranscoder]]).
    */
  def orNone: MediaTranscoder = new AutoTranscoder
}
