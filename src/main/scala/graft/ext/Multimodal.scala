package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in that derives
  * "metadata" and "features" from the bytes. Everything Spark-side — schema,
  * batching, partitioning, the typed `mapPartitions` pipeline shape — is real
  * and is exactly what a production decode (JNI/FFI to a codec) would plug
  * into: one partition = one batch of byte payloads through a native library.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-metadata + an 8-dim byte-histogram
    * feature from the payload. A real implementation replaces ONLY this
    * object; the Spark plumbing stays identical.
    */
  object FakeCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val b = r.payload
      val h = b.foldLeft(0xcbf29ce484222325L)((acc, x) => acc * 1099511628211L + (x & 0xffL))
      val hist = new Array[Float](8)
      b.foreach(x => hist((x & 0xff) % 8) += 1.0f)
      val n = math.max(b.length, 1).toFloat
      MediaMeta(r.media_id, r.kind, b.length.toLong,
        width = 16 + (math.floorMod(h, 64L)).toInt,
        height = 16 + (math.floorMod(h >> 8, 64L)).toInt,
        n_frames = if (r.kind == "video") 1 + (math.floorMod(h >> 16, 30L)).toInt else 1,
        feature = hist.map(_ / n))
    }
  }

  /** Batch decode via typed `mapPartitions`: the per-partition iterator is the
    * batch boundary (≙ `mapInPandas` batch shape), so a native codec is
    * initialized once per partition, not once per row.
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: acquire codec handle here, release after the iterator
      it.map(FakeCodec.decode)
    }
  }

  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte],
      frame_feature: Array[Float])

  /** Frame sampling: split a (fake-)video payload into `n` evenly-spaced
    * byte windows and feature-extract each — the Spark shape of video frame
    * sampling (generator-style fan-out; a real codec plugs into the slice
    * step). Images/audio yield a single frame.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = if (r.kind == "video") n else 1
      val len = math.max(r.payload.length / math.max(frames, 1), 1)
      (0 until frames).map { i =>
        val from = math.min(i * len, math.max(r.payload.length - 1, 0))
        val slice = r.payload.slice(from, math.min(from + len, r.payload.length))
        val hist = new Array[Float](8)
        slice.foreach(x => hist((x & 0xff) % 8) += 1.0f)
        val total = math.max(slice.length, 1).toFloat
        MediaFrame(r.media_id, i, slice, hist.map(_ / total))
      }
    }
  }

  /** Build a media table from the documents fixture: payload = UTF-8 bytes of
    * the text (the opaque-binary contract is what's under test, not pixels).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload")
    ).as[MediaRecord]
  }

  /** Metadata + features as a DataFrame (flattened, analytics-ready). */
  def decodedTable(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAll(mediaFromDocuments(spark, docs)).toDF()
}
