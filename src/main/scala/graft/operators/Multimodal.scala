package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque BINARY
  * columns with typed metadata, processed in partition-batched map
  * operators.
  *
  * The Spark-side plumbing — schema, batch shape, partitioning — is
  * real and tested; the codec step is STUBBED (media libraries are not
  * in this container) behind [[decodeStub]], a deterministic fake that
  * derives "features" from the bytes so tests have stable oracles. In
  * production the stub body is the only thing to replace (JNI/ffmpeg/
  * javax.imageio), the operator shape does not change.
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
      feature: Array[Float]) // stub embedding

  final case class MediaFrame(
      media_id: Long,
      frame_no: Int,
      t_ms: Long,
      frame: Array[Byte])

  /** STUB decode: deterministic byte-derived pseudo-features standing in
    * for a real image/audio decoder. Replace body for production. */
  private[operators] def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
    var h = 1125899906842597L // deterministic FNV-ish rolling checksum
    bytes.foreach(b => h = h * 31 + (b & 0xff))
    val feat = Array.tabulate(8) { i =>
      // fake "feature extraction": windowed byte averages
      val slice = bytes.drop(i * math.max(1, bytes.length / 8))
        .take(math.max(1, bytes.length / 8))
      if (slice.isEmpty) 0f
      else slice.map(b => (b & 0xff).toFloat).sum / slice.length / 255f
    }
    MediaFeatures(r.media_id, r.kind, bytes.length.toLong, h, feat)
  }

  /** Batched feature extraction: the mapPartitions shape a real decoder
    * needs (amortize codec init per partition, stream rows). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // production: initialize the codec ONCE here, then stream
      rows.map(decodeStub)
    }
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes;
    * the stub deterministically truncates/pads the payload to the
    * target "pixel count" so tests have stable oracles. The operator
    * contract — (row, targetW, targetH) → row with updated payload and
    * metadata, batched per partition — is the real part. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // production: codec init once per partition here
      rows.map { r =>
        val target = math.max(1, w * h)
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        val out = Array.tabulate(target)(i => bytes(i % math.max(1, bytes.length)))
        r.copy(payload = out, width = Some(w), height = Some(h))
      }
    }
  }

  /** STUB frame sampling: a video row explodes into ~`n` frame rows
    * (payload slices standing in for decoded frames). The row-explosion
    * shape — one input row → n output rows, still partition-batched,
    * frames never shuffled — is what matters at scale. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
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
}
