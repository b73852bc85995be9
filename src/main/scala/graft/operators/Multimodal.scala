package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque BINARY
  * columns with typed metadata, processed in partition-batched map
  * operators.
  *
  * IMAGE and AUDIO decode are REAL, in-JVM: javax.imageio (PNG, JPEG,
  * BMP, GIF, WBMP) gives actual pixel dimensions, a genuine 8-bin
  * luminance histogram, and a real Graphics2D [[resize]] with PNG
  * re-encode; javax.sound.sampled (WAV, AIFF, AU) gives channel
  * count, sample rate, and an 8-bin RMS-energy envelope. VIDEO:
  * MJPEG-in-AVI decodes for REAL too (each frame is a JPEG —
  * [[parseAviMjpeg]] walks the RIFF container, javax.imageio decodes
  * the frames: true dimensions, first-frame histogram, cadence-exact
  * timestamps in [[sampleFrames]]); MP4/MOV get real container
  * metadata (ISO BMFF box walk) with frame decode stubbed.
  * Compressed codecs (H.264, mp3/ogg) are genuinely absent in-JVM,
  * so those payloads fall back to [[decodeStub]], a deterministic
  * byte-derived fake, loudly documented as the production replacement
  * point (JNI/ffmpeg). The operator shapes — schema, batch form,
  * partitioning — are identical either way. For features,
  * `width`/`height` carry pixel dims for images/video and
  * (channels, sample rate) for audio.
  *
  * Scale: media blobs never shuffle — every operator here is a
  * scan-side mapPartitions; only extracted features (small, fixed-width)
  * flow downstream. Partitioning is by file, with
  * `spark.sql.files.maxPartitionBytes` sizing batches so a partition of
  * blobs fits executor memory.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float],      // luminance histogram (real) or stub embedding
      width: Option[Int] = None,  // image: pixels; audio: channels; video: pixels
      height: Option[Int] = None, // image: pixels; audio: sample rate; video: pixels
      duration_ms: Option[Long] = None, // audio/video container duration
      n_tracks: Option[Int] = None)     // video container track count

  final case class MediaFrame(
      media_id: Long,
      frame_no: Int,
      t_ms: Long,
      frame: Array[Byte])

  final case class MediaTrack(
      media_id: Long,
      track_no: Int,
      handler: String,   // vide | soun | ... (mdia/hdlr handler type)
      codec: String,     // first stsd sample-entry fourcc: avc1, mp4a, ...
      timescale: Long,   // track-local mdhd timescale
      duration_ms: Long)

  private def checksumOf(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // deterministic FNV-ish rolling checksum
    bytes.foreach(b => h = h * 31 + (b & 0xff))
    h
  }

  /** STUB decode: deterministic byte-derived pseudo-features standing in
    * for the codecs the JVM lacks (audio/video). Replace body for
    * production (JNI/ffmpeg). */
  private[operators] def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
    val feat = Array.tabulate(8) { i =>
      // fake "feature extraction": windowed byte averages
      val slice = bytes.drop(i * math.max(1, bytes.length / 8))
        .take(math.max(1, bytes.length / 8))
      if (slice.isEmpty) 0f
      else slice.map(b => (b & 0xff).toFloat).sum / slice.length / 255f
    }
    MediaFeatures(r.media_id, r.kind, bytes.length.toLong, checksumOf(bytes), feat)
  }

  /** Normalized 8-bin luminance histogram (Rec. 601 weights) of a
    * decoded image — the shared feature for still images and decoded
    * video frames. */
  private[operators] def luminanceHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val bins = new Array[Long](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 +
          ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        bins(math.min(7, lum >> 5)) += 1
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    bins.map(_.toFloat / n)
  }

  /** REAL image decode via javax.imageio: actual pixel dimensions and a
    * normalized 8-bin luminance histogram. Returns None when the
    * payload is not a decodable image. */
  private[operators] def decodeImage(r: MediaRow): Option[MediaFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else
        Some(MediaFeatures(
          r.media_id, r.kind, r.payload.length.toLong, checksumOf(r.payload),
          luminanceHistogram(img),
          Some(img.getWidth), Some(img.getHeight)))
    } catch { case _: Exception => None }

  /** REAL audio decode via javax.sound.sampled (WAV/AIFF/AU ship with
    * the JDK): frame count → duration, and an 8-bin RMS-energy envelope
    * over equal time slices (a real, if simple, audio feature). Width
    * carries the channel count, height the sample rate. Returns None
    * for containers the JVM cannot parse (mp3/ogg — those need the
    * external-codec stub). */
  private[operators] def decodeAudio(r: MediaRow): Option[MediaFeatures] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val srcFmt = raw.getFormat
        // normalize EVERYTHING through the JDK's converters to signed
        // 16-bit PCM in the container's endianness — this is what makes
        // 8-bit AIFF (signed), 8-bit WAV (unsigned), mu-law/a-law AU,
        // and 24/32-bit PCM all decode correctly instead of being
        // byte-peeked as if they were 16-bit linear PCM
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, srcFmt.isBigEndian)
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, raw)
        try {
          val fmt = in.getFormat
          val frameSize = fmt.getFrameSize
          val bytes = in.readAllBytes()
          val n = if (frameSize > 0) bytes.length / frameSize else 0
          if (n <= 0) None
          else {
            val bins = new Array[Double](8)
            val counts = new Array[Long](8)
            var f = 0
            while (f < n) {
              // first channel of the frame, signed 16-bit
              val off = f * frameSize
              val (b0, b1) =
                if (fmt.isBigEndian) (bytes(off), bytes(off + 1))
                else (bytes(off + 1), bytes(off))
              val v = ((b0 << 8) | (b1 & 0xff)).toShort / 32768.0
              // long arithmetic: f*8 overflows Int past 2^28 frames
              val bin = math.min(7L, f.toLong * 8 / n).toInt
              bins(bin) += v * v
              counts(bin) += 1
              f += 1
            }
            val feat = Array.tabulate(8)(i =>
              if (counts(i) == 0) 0f else math.sqrt(bins(i) / counts(i)).toFloat)
            Some(MediaFeatures(
              r.media_id, r.kind, r.payload.length.toLong, checksumOf(r.payload),
              feat,
              width = Some(fmt.getChannels),
              height = Some(fmt.getSampleRate.toInt),
              duration_ms = Some(
                (n.toLong * 1000 / fmt.getSampleRate.toLong).max(0L))))
          }
        } finally in.close()
      } finally raw.close()
    } catch { case _: Exception => None }

  /** ISO BMFF sibling walk shared by every MP4/MOV parser here:
    * returns (fourcc, contentStart, contentEnd) per box in [from, to).
    * Handles the two special header sizes real files use (ISO 14496-12
    * §4.2): size==1 → 64-bit `largesize` follows the fourcc (streaming
    * writers put a >4 GiB `mdat` BEFORE `moov`, so aborting on it hides
    * every track); size==0 → box extends to the end of the enclosing
    * container (last-box shorthand). A malformed size skips nothing
    * after it can't — the walk stops there rather than misparse. */
  private[operators] def bmffChildren(
      payload: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(payload) // big-endian per spec
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = from
    var done = false
    while (!done && off + 8 <= to) {
      val size32 = bb.getInt(off)
      val tpe = new String(payload, off + 4, 4, "ISO-8859-1")
      val (contentStart, boxEnd) =
        if (size32 == 1 && off + 16 <= to) {
          val large = bb.getLong(off + 8)
          // content starts after the 16-byte extended header; an
          // out-of-range largesize is malformed → stop
          if (large < 16 || large > (to - off).toLong) (off + 16, -1)
          else (off + 16, off + large.toInt)
        } else if (size32 == 0) (off + 8, to) // extends to container end
        else if (size32 < 8 || off.toLong + size32 > to) (off + 8, -1)
        else (off + 8, off + size32)
      if (boxEnd < 0) done = true
      else {
        buf += ((tpe, contentStart, boxEnd))
        off = boxEnd
      }
    }
    buf.toSeq
  }

  private def bmffChild(
      payload: Array[Byte], from: Int, to: Int, want: String): Option[(Int, Int)] =
    bmffChildren(payload, from, to).collectFirst { case (t, s, e) if t == want => (s, e) }

  /** Millisecond duration from a BMFF timescale + duration pair without
    * Long overflow: a 64-bit v1 duration × 1000 wraps for values past
    * 2^53; split the division so only the sub-timescale remainder is
    * scaled. Unsigned-range durations (top bit set) saturate. */
  private def bmffDurMs(timescale: Long, duration: Long): Long =
    if (timescale <= 0) 0L
    else if (duration < 0) Long.MaxValue // 2^63..2^64-1 ticks: saturate
    else (duration / timescale) * 1000 + (duration % timescale) * 1000 / timescale

  /** REAL MP4/MOV container metadata (no codec needed — plain ISO BMFF
    * box walking): duration from mvhd, track count and the first video
    * track's pixel dimensions from trak/tkhd. Frame DECODE stays
    * stubbed (that genuinely needs external codecs); the returned
    * features carry real metadata around the stub feature vector.
    * Returns None for non-ISO-BMFF payloads. */
  private[operators] def videoContainerMeta(
      payload: Array[Byte]): Option[(Long, Int, Option[(Int, Int)])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload) // big-endian per spec
      bmffChild(payload, 0, payload.length, "moov").flatMap { case (ms, me) =>
        bmffChild(payload, ms, me, "mvhd").map { case (hs, _) =>
          val version = payload(hs) & 0xff
          val (timescale, duration) =
            if (version == 1) (bb.getInt(hs + 20).toLong, bb.getLong(hs + 24))
            else (bb.getInt(hs + 12).toLong, (bb.getInt(hs + 16).toLong & 0xffffffffL))
          val durMs = bmffDurMs(timescale, duration)
          // count trak children of moov; first with nonzero tkhd dims
          var nTracks = 0
          var dims: Option[(Int, Int)] = None
          bmffChildren(payload, ms, me).foreach {
            case ("trak", ts, te) =>
              nTracks += 1
              if (dims.isEmpty)
                dims = bmffChild(payload, ts, te, "tkhd").flatMap { case (_, the) =>
                  // width/height are the LAST 8 bytes, 16.16 fixed point
                  val w = bb.getInt(the - 8) >>> 16
                  val h = bb.getInt(the - 4) >>> 16
                  if (w > 0 && h > 0) Some((w, h)) else None
                }
            case _ => ()
          }
          (durMs, nTracks, dims)
        }
      }
    } catch { case _: Exception => None }

  /** Parsed MJPEG-AVI: frame cadence, the (offset, length) of every
    * JPEG frame chunk in the `movi` list, and the container's stream
    * count (one `strh` header per track — audio streams included). */
  private[operators] final case class AviMjpeg(
      usPerFrame: Long,
      frames: IndexedSeq[(Int, Int)],
      nStreams: Int = 1) {
    def durationMs: Long = usPerFrame * frames.length / 1000
    def frameTimeMs(i: Int): Long = usPerFrame * i / 1000
  }

  /** REAL video frame access for MJPEG-in-AVI — the one video codec the
    * JVM can genuinely decode, because each frame IS a JPEG and
    * javax.imageio does JPEG. Plain RIFF walking (all little-endian):
    * `RIFF…AVI `, `LIST hdrl → avih` for µs/frame, `LIST movi` for the
    * `00dc`/`00db` stream-0 frame chunks (chunks pad to even offsets).
    * Compressed codecs (H.264 & co) still need the external-codec
    * stub — this parser returns None for them since their frame chunks
    * are not JPEG. */
  private[operators] def parseAviMjpeg(payload: Array[Byte]): Option[AviMjpeg] =
    try {
      if (payload.length < 12) return None
      def fourcc(off: Int) = new String(payload, off, 4, "ISO-8859-1")
      def u32le(off: Int): Long =
        ((payload(off) & 0xffL)) | ((payload(off + 1) & 0xffL) << 8) |
          ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var usPerFrame = 0L
      var nStreams = 0
      val frames = IndexedSeq.newBuilder[(Int, Int)]
      def walkChunks(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourcc(off)
          val size = u32le(off + 4)
          val dataStart = off + 8
          val dataEnd = dataStart + size.toInt
          if (size < 0 || size > Int.MaxValue || dataEnd > to) return
          id match {
            case "LIST" if size >= 4 =>
              walkChunks(dataStart + 4, dataEnd) // skip listType, recurse
            case "avih" if size >= 4 =>
              usPerFrame = u32le(dataStart)
            case "strh" =>
              nStreams += 1 // one stream header per track (video + audio)
            case "00dc" | "00db" if size >= 2 =>
              // a JPEG frame starts FF D8; anything else = not MJPEG
              if ((payload(dataStart) & 0xff) == 0xff &&
                (payload(dataStart + 1) & 0xff) == 0xd8) {
                frames += ((dataStart, size.toInt))
              }
            case _ => ()
          }
          off = dataEnd + (size.toInt & 1) // chunks pad to even
        }
      }
      walkChunks(12, payload.length)
      val fs = frames.result()
      if (fs.isEmpty) None
      else Some(AviMjpeg(usPerFrame, fs, math.max(1, nStreams)))
    } catch { case _: Exception => None }

  /** Decode one MJPEG frame chunk to an image. */
  private[operators] def decodeAviFrame(
      payload: Array[Byte], frame: (Int, Int)): Option[java.awt.image.BufferedImage] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, frame._1, frame._2)))
    } catch { case _: Exception => None }

  /** Per-track MP4/MOV metadata (pure box walk, no codec): for each
    * `moov/trak` the `mdia/mdhd` track-local timescale + duration, the
    * `mdia/hdlr` handler type (`vide`/`soun`/…), and the codec fourcc
    * from the first `stbl/stsd` sample entry (`avc1`, `mp4a`, `hvc1`,
    * …) — the fields a corpus datasheet needs to slice media by codec
    * without decoding a frame. Returns (handler, codec, timescale,
    * duration_ms) per track, empty for non-BMFF payloads. */
  private[operators] def mp4Tracks(
      payload: Array[Byte]): Seq[(String, String, Long, Long)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
      def child(from: Int, to: Int, want: String): Option[(Int, Int)] =
        bmffChild(payload, from, to, want)
      child(0, payload.length, "moov").toSeq.flatMap { case (ms, me) =>
        bmffChildren(payload, ms, me).filter(_._1 == "trak").flatMap { case (_, ts, te) =>
          child(ts, te, "mdia").map { case (ds, de) =>
            val (timescale, durMs) = child(ds, de, "mdhd").map { case (hs, _) =>
              val v = payload(hs) & 0xff
              val (tsc, dur) = // same v0/v1 layout split as mvhd
                if (v == 1) (bb.getInt(hs + 20).toLong, bb.getLong(hs + 24))
                else (bb.getInt(hs + 12).toLong, bb.getInt(hs + 16).toLong & 0xffffffffL)
              (tsc, bmffDurMs(tsc, dur))
            }.getOrElse((0L, 0L))
            val handler = child(ds, de, "hdlr")
              .filter { case (hs, he) => he - hs >= 12 }
              .map { case (hs, _) => new String(payload, hs + 8, 4, "ISO-8859-1") }
              .getOrElse("")
            val codec = (for {
              (ns, ne) <- child(ds, de, "minf")
              (bs, be) <- child(ns, ne, "stbl")
              (ss, se) <- child(bs, be, "stsd")
              if se - ss >= 16 && bb.getInt(ss + 8) >= 8 // first entry present
            } yield new String(payload, ss + 12, 4, "ISO-8859-1")).getOrElse("")
            (handler, codec, timescale, durMs)
          }
        }
      }
    } catch { case _: Exception => Seq.empty }

  /** One row per MP4/MOV track: the explode-shaped twin of
    * [[extractFeatures]] for container-level analytics (codec mix,
    * per-track durations). Partition-batched scan-side flatMap — blobs
    * never shuffle, only the fixed-width track rows flow downstream. */
  def describeTracks(media: Dataset[MediaRow]): Dataset[MediaTrack] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.payload == null) Seq.empty[MediaTrack]
      else mp4Tracks(r.payload).zipWithIndex.map {
        case ((handler, codec, tsc, durMs), i) =>
          MediaTrack(r.media_id, i, handler, codec, tsc, durMs)
      }
    }
  }

  /** AudioFileReader SPI providers visible to this JVM. [[decodeAudio]]
    * goes through AudioSystem, which consults this registry — dropping
    * a public FLAC/Vorbis reader jar on the classpath lights those
    * formats up with NO code change here. The stock JDK ships WAV,
    * AIFF, and AU readers only; MultimodalSpec records the probe so the
    * claimed-real format list stays honest per environment. */
  def audioReaderProviders(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.map(_.getClass.getName).toSeq
  }

  /** MJPEG-AVI: REAL frame decode — dimensions and luminance histogram
    * from the first frame, duration from the µs/frame cadence. */
  private[operators] def decodeAviVideo(r: MediaRow): Option[MediaFeatures] =
    for {
      avi <- parseAviMjpeg(r.payload)
      img <- decodeAviFrame(r.payload, avi.frames.head)
    } yield MediaFeatures(
      r.media_id, r.kind, r.payload.length.toLong, checksumOf(r.payload),
      luminanceHistogram(img),
      width = Some(img.getWidth), height = Some(img.getHeight),
      duration_ms = Some(avi.durationMs),
      n_tracks = Some(avi.nStreams))

  private[operators] def decodeVideo(r: MediaRow): Option[MediaFeatures] =
    decodeAviVideo(r).orElse {
      videoContainerMeta(r.payload).map { case (durMs, nTracks, dims) =>
        val stub = decodeStub(r) // compressed-codec frame decode needs ffmpeg
        stub.copy(
          width = dims.map(_._1), height = dims.map(_._2),
          duration_ms = Some(durMs), n_tracks = Some(nTracks))
      }
    }

  /** Kind dispatch: real image + audio decode and real video container
    * metadata (all in-JVM), stub for payloads the JVM cannot parse and
    * for video FRAME decode. */
  private[operators] def decode(r: MediaRow): MediaFeatures =
    if (r.payload == null) decodeStub(r)
    else r.kind match {
      case "image" => decodeImage(r).getOrElse(decodeStub(r))
      case "audio" => decodeAudio(r).getOrElse(decodeStub(r))
      case "video" => decodeVideo(r).getOrElse(decodeStub(r))
      case _       => decodeStub(r)
    }

  /** Batched feature extraction: the mapPartitions shape a real decoder
    * needs (amortize codec init per partition, stream rows). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // heavier codecs would initialize ONCE here, then stream
      rows.map(decode)
    }
  }

  /** Resize. Images: REAL decode → Graphics2D bilinear rescale → PNG
    * re-encode. Other kinds (and undecodable payloads) keep the stub
    * truncate/pad so the operator contract — (row, targetW, targetH) →
    * row with updated payload + metadata, batched per partition — is
    * uniform across kinds. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val real =
          if (r.kind == "image" && r.payload != null) resizeImage(r, w, h)
          else None
        real.getOrElse {
          val target = math.max(1, w * h)
          val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
          val out =
            if (bytes.isEmpty) new Array[Byte](target) // zero-fill, no modulo-by-zero
            else Array.tabulate(target)(i => bytes(i % bytes.length))
          r.copy(payload = out, width = Some(w), height = Some(h))
        }
      }
    }
  }

  private[operators] def resizeImage(r: MediaRow, w: Int, h: Int): Option[MediaRow] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      if (img == null) None
      else {
        val scaled = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaled, "png", bos)
        Some(r.copy(payload = bos.toByteArray, mime = "image/png",
          width = Some(w), height = Some(h)))
      }
    } catch { case _: Exception => None }

  /** Frame sampling: a video row explodes into ≤`n` frame rows. For
    * MJPEG-AVI payloads the frames are REAL — `n` evenly-spaced JPEG
    * frame chunks with their true timestamps (the chunk bytes ARE the
    * frame images; any JPEG decoder downstream reads them directly).
    * Other containers fall back to the stub payload slices. Either
    * way the shape is what matters at scale: one input row → n output
    * rows, partition-batched, frames never shuffled. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
      parseAviMjpeg(bytes) match {
        case Some(avi) =>
          val total = avi.frames.length
          val picks =
            if (n >= total) 0 until total
            else (0 until n).map(i => i * (total - 1) / math.max(1, n - 1))
          picks.zipWithIndex.map { case (fi, outIdx) =>
            val (off, len) = avi.frames(fi)
            MediaFrame(r.media_id, outIdx, avi.frameTimeMs(fi),
              java.util.Arrays.copyOfRange(bytes, off, off + len))
          }
        case None =>
          val dur = r.duration_ms.getOrElse(0L)
          (0 until n).map { i =>
            val tMs = if (n <= 1) 0L else dur * i / (n - 1)
            val sliceLen = math.max(1, bytes.length / n)
            val off = math.min(bytes.length, i * sliceLen)
            MediaFrame(r.media_id, i, tMs,
              bytes.slice(off, math.min(bytes.length, off + sliceLen)))
          }
      }
    }
  }

  /** Read a directory of binary files as a media table — Spark's
    * binaryFile source gives (path, modificationTime, length, content)
    * with pushed-down path glob filtering. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // 64-bit identity hash: a 32-bit hash birthday-collides above
        // ~77k files, silently merging distinct media downstream
        xxhash64(col("path")).as("media_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("content"))

  type Q = (SparkSession, String) => DataFrame

  /** q_binary_magic — the multimodal family's oracle-backed leg:
    * format sniffing over a BINARY column. Payloads derive
    * deterministically in-query (magic prefix by doc_id residue +
    * 32 md5 bytes — the fixtures carry no blobs), and the ENGINE path
    * exercises the real binary machinery end to end: `unhex` →
    * BinaryType, `substring` ON BYTES for the 4-byte magic and the
    * first payload byte, `hex` back out, byte-exact `length`. The
    * DuckDB twin never touches a blob — pure hex-string algebra — so
    * hash equality proves the byte semantics of the binary path
    * (offsets, lengths, case) rather than assuming them. Scan-side
    * only; the single shuffle is the 4-group format rollup, the
    * blobs themselves never move — the [[mediaFrame]] contract in
    * oracle-checkable form. */
  val qBinaryMagic: Q = (s, d) => {
    import org.apache.spark.sql.types.LongType
    val magics = array(lit("89504E47"), lit("FFD8FFE0"),
      lit("52494646"), lit("00000018"))
    val bodyHex = upper(concat(
      md5(concat(lit("m1|"), col("doc_id").cast("string"))),
      md5(concat(lit("m2|"), col("doc_id").cast("string")))))
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        unhex(concat(
          element_at(magics, (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          bodyHex)).as("payload"))
      .select(
        upper(hex(substring(col("payload"), 1, 4))).as("magic_hex"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        conv(hex(substring(col("payload"), 5, 1)), 16, 10).cast(LongType)
          .as("first_byte"))
      .withColumn("format",
        when(col("magic_hex") === "89504E47", "png")
          .when(col("magic_hex") === "FFD8FFE0", "jpeg")
          .when(col("magic_hex") === "52494646", "riff")
          .otherwise("bmff"))
      .groupBy("magic_hex", "format")
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        sum(col("first_byte")).cast(LongType).as("sum_first_byte"))
      .orderBy("magic_hex")
  }

  /** 64-bit average hash (aHash) of a decoded image — the classic
    * perceptual near-dup signature (resize to 8×8 grayscale, threshold
    * each cell by the mean): re-encodes, format conversions, and
    * pixel-exact rescales of the same picture hash IDENTICALLY, while
    * a different picture differs in many bits. Implemented as integer
    * BOX SAMPLING (each cell averages the Rec. 601 luminance of the
    * pixel block it covers, integer division throughout) instead of a
    * Graphics2D rescale — interpolation is renderer-dependent; the box
    * sum is bit-deterministic on every JVM. Strict `> mean` threshold
    * (stated; an all-flat image hashes to 0). */
  private[operators] def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val lums = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
        val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
        var s = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            n += 1; x += 1
          }
          y += 1
        }
        lums(cy * 8 + cx) = s / math.max(n, 1L)
        cx += 1
      }
      cy += 1
    }
    val mean = lums.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (lums(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** (media_id, ahash) for every decodable image in the set — blobs
    * never shuffle; only the 8-byte hash flows downstream. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.kind != "image" || r.payload == null) Iterator.empty
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
            Iterator.empty
          else Iterator.single((r.media_id, aHashOf(img)))
        } catch { case _: Exception => Iterator.empty }
      }
    }.toDF("media_id", "ahash")
  }

  /** Perceptual image near-dup pairs: aHash hamming ≤ `maxHamming`
    * (default 3) via the PIGEONHOLE blocking of the SimHash family
    * (Dedup X126): 4 disjoint 16-bit bands of the hash — two hashes
    * within hamming 3 must agree on at least one whole band, so the
    * band equi-join is provably LOSSLESS at the threshold and the
    * join is never all-pairs. Hamming rides the codegen'd
    * bit_count(a XOR b). The multimodal twin of the text dedup spine:
    * decode map-side, shuffle 8 bytes per image, bucket-join. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole is lossless only to hamming 3")
    val hashes = imageHashes(media).localCheckpoint() // both join sides
    val keys = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("ahash"), b * 16)
            .bitwiseAND(lit(0xffffL)).as("bkey"))): _*)).as("k"))
      .select(col("media_id"), col("ahash"),
        col("k.band").as("band"), col("k.bkey").as("bkey"))
    keys.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  val queries: Map[String, Q] = Map("q_binary_magic" -> qBinaryMagic)

  val oracle: Map[String, String] = Map(
    "q_binary_magic" ->
      // pure hex-STRING algebra on purpose: proves the engine's
      // BinaryType path (unhex/byte-substring/hex/length) byte-exact
      """WITH p AS (
        |  SELECT doc_id,
        |    (['89504E47','FFD8FFE0','52494646','00000018'])
        |      [CAST(doc_id % 4 AS INT) + 1] AS magic,
        |    upper(md5('m1|' || CAST(doc_id AS VARCHAR))
        |      || md5('m2|' || CAST(doc_id AS VARCHAR))) AS body
        |  FROM documents),
        |b AS (
        |  SELECT magic AS magic_hex,
        |    CAST(4 + length(body) // 2 AS BIGINT) AS n_bytes,
        |    CAST('0x' || substr(body, 1, 2) AS BIGINT) AS first_byte
        |  FROM p)
        |SELECT magic_hex,
        |  CASE magic_hex WHEN '89504E47' THEN 'png'
        |    WHEN 'FFD8FFE0' THEN 'jpeg'
        |    WHEN '52494646' THEN 'riff' ELSE 'bmff' END AS format,
        |  CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(first_byte) AS BIGINT) AS sum_first_byte
        |FROM b GROUP BY 1, 2 ORDER BY magic_hex""".stripMargin)
}
