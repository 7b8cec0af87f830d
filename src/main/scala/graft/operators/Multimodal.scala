package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset: opaque binary payload + typed metadata. The binary
  * column is never interpreted by Spark — only by the (stubbed) decode
  * stage — so the plan stays columnar and prunable end to end. */
case class MediaRecord(
    media_id: Long,
    media_type: String,      // image | audio | video
    content: Array[Byte],    // opaque payload
    width: Int, height: Int, duration_ms: Int)

case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    digest: Long,            // deterministic content digest
    frames_sampled: Int,
    // REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP ship with the
    // JDK): filled when the payload actually decodes, zeroed otherwise
    decoded: Boolean = false,
    px_width: Int = 0,
    px_height: Int = 0,
    channels: Int = 0,
    px_sum: Long = 0L)       // sum of R+G+B over all pixels

/** Multimodal-column plumbing (SURVEY §2.7): schema, partitioning and
  * batch shape are real; the decode kernel is a clearly-marked
  * deterministic STUB (no image/audio codecs in this environment).
  *
  * In PySpark this stage is `mapInPandas` (arrow batches into a decode
  * UDF); the Scala-native equivalent is `mapPartitions` over a typed
  * Dataset with explicit micro-batching, which is what we do here: the
  * executor-side iterator is chunked into fixed-size batches exactly as an
  * arrow batch would be, so a real decoder (JNI/FFI) slots into
  * `decodeBatch` without touching the plan.
  */
object Multimodal {

  /** Real media ingestion: read a directory of media files through
    * Spark's binaryFile source into the MediaRecord schema. Type derives
    * from the extension; intrinsic dimensions/duration are unknown until
    * decode, so they enter as 0 and the (stubbed) decode stage fills
    * them. Partition parallelism, pushdown of path filters and the
    * maxBytesPerTrigger-style batching all come from the source. */
  def mediaFromFiles(spark: SparkSession, dir: String): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val mediaType = when(ext.isin("jpg", "jpeg", "png", "gif", "bmp", "webp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg", "aac"), "audio")
      .when(ext.isin("mp4", "avi", "mkv", "webm", "mov"), "video")
      .otherwise("unknown")
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        mediaType.as("media_type"),
        col("content"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("duration_ms"))
  }

  /** Synthesize a deterministic media table from the documents table:
    * text bytes become the opaque payload, media_type round-robins by id.
    * Same schema as [[mediaFromFiles]], derived from testdata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"),
      (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
      (pmod(col("doc_id"), lit(90000)) + 1000).cast("int").as("duration_ms"))

  /** REAL image decode via the JDK's own codecs (javax.imageio — PNG,
    * JPEG, GIF, BMP, no external libraries): dimensions, channel count
    * and an exact R+G+B pixel sum. Returns None for payloads no
    * installed reader recognizes (including truncated/corrupt files) —
    * the caller falls back to byte-level features, never fails the
    * batch. Runs entirely on the executor holding the bytes. */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val ch = img.getColorModel.getNumComponents
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, ch, s))
      }
    } catch { case _: Exception => None }

  /** Deterministic PNG encoder (tests + the `mm_decode` oracle): a solid
    * `rgb`-colored width x height image, losslessly round-trippable
    * through [[decodeImage]]. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-batch decode: images go through the REAL [[decodeImage]] path
    * (decoded=true + pixel stats when the bytes parse); audio/video
    * remain a deterministic STUB (no JDK codecs for them in this
    * environment — a real decoder slots in here without touching the
    * plan). The byte digest is computed for every asset either way. */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val bytes = if (m.content == null) Array.emptyByteArray else m.content
      var d = 1125899906842597L
      var i = 0
      while (i < bytes.length) { d = d * 31 + bytes(i); i += 1 }
      val frames = m.media_type match {
        case "video" => math.max(1, m.duration_ms / 1000)
        case "audio" => math.max(1, m.duration_ms / 5000)
        case _ => 1
      }
      val dec = if (m.media_type == "image") decodeImage(bytes) else None
      dec match {
        case Some((w, h, ch, s)) =>
          MediaFeatures(m.media_id, m.media_type, bytes.length.toLong, d, frames,
            decoded = true, px_width = w, px_height = h, channels = ch, px_sum = s)
        case None =>
          MediaFeatures(m.media_id, m.media_type, bytes.length.toLong, d, frames)
      }
    }

  /** Feature extraction over micro-batches of `batchSize` records per
    * call — the arrow-batch shape. Runs fully parallel per partition; no
    * driver involvement. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq))
    }
  }

  /** Resize stage (STUB): pure metadata transform preserving the
    * binary payload untouched — the real kernel would re-encode bytes. */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxW && m.height <= maxH) m
      else {
        val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
        m.copy(width = math.max(1, (m.width * scale).toInt),
               height = math.max(1, (m.height * scale).toInt))
      }
    }
  }

  /** Frame-sampling plan: one row per (video, frame offset) work unit —
    * the distributed decode plan a real frame extractor consumes. Pure
    * metadata expansion (sequence explode), so the binary payloads never
    * move until the decode stage joins back on media_id. */
  def frameSample(media: DataFrame, intervalMs: Int = 1000): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          floor((col("duration_ms").cast("long") - 1L) / intervalMs).cast("long"))).as("frame_no"))
      .withColumn("offset_ms", col("frame_no") * intervalMs)

  /** Media manifest: per-type size/count stats — the catalog-facing
    * summary a 100 TB media lake maintains per partition. */
  def manifest(media: DataFrame): DataFrame =
    media.groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("content"))).cast("long").as("total_bytes"),
        max(length(col("content"))).cast("long").as("max_bytes"))
}
