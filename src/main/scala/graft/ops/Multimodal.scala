package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches (the
  * Scala analogue of `mapInPandas` — an iterator-of-rows contract that a
  * vectorized decoder drops into without changing the plan shape).
  *
  * IMAGE decoding is REAL: payloads whose magic bytes identify PNG or
  * JPEG go through `javax.imageio` (ships in the JRE — no native libs
  * needed) and yield actual decoded width/height/channel-count. Other
  * payloads (audio/video, formats ImageIO lacks) fall back to
  * [[StubDecoder]]'s deterministic fake metadata — an honest stub kept
  * inside the same batch contract, to be swapped for a JNI/FFI decoder
  * at deployment.
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
      /** decoded color components (3=RGB, 4=ARGB, 1=gray); 0 for payloads
        * that went through the stub (no real decode happened) */
      channels: Int,
      checksum: String)

  /** Real image codec over `javax.imageio`: magic-byte sniffing + decode.
    * Executor-side only; ImageIO's reader registry is JVM-global, so the
    * per-partition init cost is one lookup. */
  object ImageCodec {
    def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    def isJpeg(b: Array[Byte]): Boolean =
      b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
    def isImage(b: Array[Byte]): Boolean = isPng(b) || isJpeg(b)

    /** Decode → (width, height, channels). Throws on corrupt payloads —
      * a payload that *claims* PNG/JPEG and fails to decode is data
      * corruption worth surfacing, not stubbing over. */
    def decode(b: Array[Byte]): (Int, Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null, "ImageIO could not decode payload with image magic bytes")
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }

    /** Deterministic PNG/JPEG encode for fixtures and tests: pixel(x,y) =
      * (x*31 + y*17 + seed) mod 256 on every band. `imgType` is a
      * BufferedImage.TYPE_* constant. */
    def encode(width: Int, height: Int, imgType: Int, seed: Long,
        format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height, imgType)
      val gray = img.getRaster.getNumBands == 1
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = ((x * 31 + y * 17 + seed) % 256).toInt
          // gray: raw raster sample (setRGB would sRGB-convert the value);
          // RGB/ARGB: packed pixel with opaque alpha
          if (gray) img.getRaster.setSample(x, y, 0, v)
          else img.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, format, bos),
        s"no ImageIO writer for format $format")
      bos.toByteArray
    }
  }

  /** =========== STUB — replace with a real decoder ===========
    * Deterministic fake "decode" for non-image payloads: metadata is a
    * pure function of the payload bytes so tests and oracles can
    * reproduce it.
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
    * partition, streaming iterator — no per-row setup, no driver collect).
    * PNG/JPEG payloads decode through [[ImageCodec]] (real dimensions and
    * channel count, n_frames=1); everything else through [[StubDecoder]]
    * (channels=0 marks the fake). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoders initialize native context here, once per partition
      it.map { rec =>
        val (w, h, f, ch) =
          if (ImageCodec.isImage(rec.content)) {
            val (w0, h0, c0) = ImageCodec.decode(rec.content)
            (w0, h0, 1, c0)
          } else {
            val (w0, h0, f0) = StubDecoder.decode(rec)
            (w0, h0, f0, 0)
          }
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(rec.content).map("%02x".format(_)).mkString
        MediaMeta(rec.media_id, rec.kind, rec.content.length.toLong, w, h, f, ch, md5hex)
      }
    }
  }

  /** Deterministic real-image table from `documents`: one PNG or JPEG per
    * doc, dimensions and color type derived from doc_id (so a SQL oracle
    * can state the expected decode output without seeing the bytes):
    * width = 8 + id%32, height = 8 + (id*7)%32; id%3 = 0 → JPEG RGB,
    * 1 → PNG ARGB, 2 → PNG gray. Encoding runs in the same mapPartitions
    * batch shape as decoding. */
  def imagesFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    import java.awt.image.BufferedImage
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 32).toInt
        val h = (8 + (id * 7) % 32).toInt
        val (tpe, fmt) = (id % 3) match {
          case 0 => (BufferedImage.TYPE_INT_RGB, "jpg")
          case 1 => (BufferedImage.TYPE_INT_ARGB, "png")
          case _ => (BufferedImage.TYPE_BYTE_GRAY, "png")
        }
        MediaRecord(id, "image", ImageCodec.encode(w, h, tpe, id, fmt))
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

  /** Batch image RESIZE (real): ImageIO decode → area-averaging scale →
    * PNG re-encode, one decoder/encoder per partition batch — the
    * thumbnailing / model-input-normalization step of a multimodal
    * pipeline. Output records are TYPE_INT_RGB PNGs of exactly (w, h);
    * non-image payloads are dropped (a resize of undecodable bytes has
    * no defensible output). Scan-shaped: no shuffle, no driver data. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(rec => ImageCodec.isImage(rec.content)).map { rec =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.content))
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.drawImage(src.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
          0, 0, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        MediaRecord(rec.media_id, "image", bos.toByteArray)
      }
    }
  }

  /** 64-bit average-hash perceptual fingerprint (the classic aHash):
    * decode, 8×8 block-mean gray pooling, bit j = block j brighter than
    * the image mean. Brightness-shift-tolerant, byte-exact deterministic
    * (block means are integer-summed, no float pooling, no Graphics2D
    * resampling in the loop). Non-image payloads are dropped. */
  def aHash64(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(rec => ImageCodec.isImage(rec.content)).map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.content))
        val (iw, ih) = (img.getWidth, img.getHeight)
        val means = new Array[Long](64)
        var b = 0
        while (b < 64) {
          val bx = b % 8; val by = b / 8
          val x0 = bx * iw / 8; val x1 = math.max(x0 + 1, (bx + 1) * iw / 8)
          val y0 = by * ih / 8; val y1 = math.max(y0 + 1, (by + 1) * ih / 8)
          var sum = 0L; var n = 0L
          var y = y0
          while (y < ih && y < y1) {
            var x = x0
            while (x < iw && x < x1) {
              val p = img.getRGB(x, y)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          means(b) = if (n == 0) 0L else sum / n
          b += 1
        }
        val overall = means.sum / 64
        var hash = 0L; b = 0
        while (b < 64) { if (means(b) > overall) hash |= (1L << b); b += 1 }
        (rec.media_id, hash)
      }
    }.toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs by perceptual hash: the 64-bit aHash is
    * banded into 4 × 16-bit chunks — two hashes within Hamming distance
    * ≤ 3 MUST agree on at least one chunk (pigeonhole), so the candidate
    * join is 4 small equi-joins on (chunk, key), never all-pairs; the
    * exact `bit_count(xor)` predicate verifies inside the bucket. The
    * image analogue of the SimHash text path, sharing its scale
    * contract: candidates ∝ colliding buckets, not n². */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits guarantee recall only to distance 3")
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("band"), shiftright(col("ahash"), c * 16)
          .bitwiseAND(0xffff).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("ahash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"),
      col("media_id").as("id_a"), col("ahash").as("h_a"))
    val b = banded.select(col("band"), col("key"),
      col("media_id").as("id_b"), col("ahash").as("h_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b") &&
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxHamming)
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Deterministic NOISE-image table with planted duplicate groups:
    * every doc with the same `id mod groups` gets a byte-identical PNG
    * (dims and pixels derive from the group seed alone; pixel =
    * xor-mixed hash of (x, y, seed), so DIFFERENT groups differ in ~32
    * of 64 aHash bits — gradient fixtures would not, aHash being
    * brightness-shift-invariant by design). */
  def noiseImagesGrouped(docs: DataFrame, groups: Int): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    import java.awt.image.BufferedImage
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val seed = id % groups
        val w = (16 + seed % 16).toInt
        val h = (16 + (seed * 5) % 16).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // full-avalanche mix — a plain xor of products reduces to a
            // per-image constant-byte xor, which aHash (brightness-shift
            // tolerant) cannot distinguish across groups
            val m0 = x * 73856093L + y * 19349663L + seed * 83492791L
            val m1 = (m0 ^ (m0 >>> 33)) * 0x9E3779B97F4A7C15L
            val v = ((m1 ^ (m1 >>> 29)) >>> 56).toInt & 0xff
            img.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", bos.toByteArray)
      }
    }
  }

  /** Deterministic s16le PCM audio table from `documents`: per doc,
    * 64 + id%128 samples with sample(i) = ((id·31 + i·7919) mod 65536) −
    * 32768, serialized little-endian — closed-form from doc_id so a SQL
    * oracle can state every decoded sample without seeing the bytes (the
    * mm03 pattern: a wrong-endian or wrong-sign decode cannot pass). */
  def audioFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 128).toInt
        val buf = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          buf.putShort((((id * 31 + i * 7919L) % 65536L) - 32768L).toShort)
          i += 1
        }
        MediaRecord(id, "audio", buf.array())
      }
    }
  }

  /** REAL PCM frame analysis: decode s16le bytes back to samples (one
    * ByteBuffer view per record, inside the per-partition batch — the
    * same executor-side contract as the image codecs), window into
    * `frameLen`-sample frames, and aggregate per-frame sample count +
    * absolute amplitude sum. Integer arithmetic end to end, so the
    * result is exactly restatable by an oracle. The per-sample explode
    * shuffles (media, frame) pair aggregates only — map-side combined.
    *
    * Output: (media_id, frame_idx, n_samples, sum_abs). */
  def audioFrames(media: Dataset[MediaRecord], frameLen: Int): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val buf = java.nio.ByteBuffer.wrap(rec.content)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = rec.content.length / 2
        (0 until n).iterator.map { i =>
          (rec.media_id, i / frameLen, math.abs(buf.getShort(i * 2).toLong))
        }
      }
    }.toDF("media_id", "frame_idx", "abs_s")
      .groupBy(col("media_id"), col("frame_idx"))
      .agg(count(lit(1)).as("n_samples"), sum(col("abs_s")).as("sum_abs"))
  }

  /** Segment-change (onset) detection over [[audioFrames]] output: frames
    * whose absolute-amplitude sum jumps by more than `threshold` against
    * the previous frame of the same media — the keyframe/segmentation
    * primitive (scene cuts for video frame metrics, onsets for audio).
    * One media-keyed window over the already frame-sized table (rows ∝
    * frames, never samples); integer arithmetic end to end, so an oracle
    * can restate every jump exactly. First frames have no predecessor
    * and never fire. Output: (media_id, frame_idx, jump). */
  def audioOnsets(frames: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold >= 0, "threshold must be >= 0")
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("jump", col("sum_abs") - lag(col("sum_abs"), 1).over(w))
      .filter(abs(col("jump")) > threshold)
      .select(col("media_id"), col("frame_idx"), col("jump"))
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
