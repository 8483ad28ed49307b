package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches (the
  * Scala analogue of `mapInPandas` — an iterator-of-rows contract that a
  * vectorized decoder drops into without changing the plan shape).
  *
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] derives deterministic fake metadata from
  * the raw bytes. The Spark-side contract — schema, partitioning, batch
  * iteration, typed output — is real and tested; swap [[StubDecoder]] for
  * a JNI/FFI decoder at deployment.
  */
object Multimodal {

  /** One media object. `content` is the opaque payload. */
  final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  /** =========== STUB — replace with a real decoder ===========
    * Deterministic fake "decode": metadata is a pure function of the
    * payload bytes so tests and oracles can reproduce it.
    *   width  = 64 + (byte0 mod 64)·8, height = 64 + (byte1 mod 64)·6,
    *   frames = 1 + n_bytes mod 16, checksum = md5 (computed plan-side). */
  object StubDecoder {
    def decode(rec: MediaRecord): (Int, Int, Int) = {
      val b = rec.content
      val b0 = if (b.nonEmpty) b(0) & 0xff else 0
      val b1 = if (b.length > 1) b(1) & 0xff else 0
      val width = 64 + (b0 % 64) * 8
      val height = 64 + (b1 % 64) * 6
      val frames = 1 + (b.length % 16)
      (width, height, frames)
    }
  }

  /** Decode metadata per partition (batch contract: one decoder init per
    * partition, streaming iterator — no per-row setup, no driver collect). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoders initialize native context here, once per partition
      it.map { rec =>
        val (w, h, f) = StubDecoder.decode(rec)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(rec.content).map("%02x".format(_)).mkString
        MediaMeta(rec.media_id, rec.kind, rec.content.length.toLong, w, h, f, md5hex)
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: every `stride`-th
    * byte offset becomes a frame handle (stub for real frame extraction;
    * plan shape — explode to one row per frame — is the real contract). */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    val m = meta.toDF()
    m.select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"))
  }

  /** Build a deterministic media table from the `documents` test table
    * (text bytes as payload) — the fixture used by tests and the oracle. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")).as("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaRecord]
  }
}
