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
    px_sum: Long = 0L,       // sum of R+G+B over all pixels
    // REAL audio decode (javax.sound.sampled — WAV/AIFF/AU ship with the
    // JDK): filled when the payload decodes, zeroed otherwise. All
    // integer arithmetic over the 16-bit PCM samples so an ANSI oracle
    // recomputes the stats bit-exactly.
    sample_rate: Int = 0,
    audio_channels: Int = 0,
    n_frames: Long = 0L,       // sample frames per channel
    audio_ms: Long = 0L,       // floor(n_frames * 1000 / sample_rate)
    sample_sum_abs: Long = 0L, // Σ |sample| over all channels
    sample_peak: Int = 0,      // max |sample|
    // REAL video decode for MJPEG-in-AVI (RIFF parsed natively, frames
    // decoded by javax.imageio — camera/capture MJPEG needs no external
    // codec): filled when the container parses AND a frame decodes
    video_frames: Long = 0L,   // actual movi frame-chunk count
    video_ms: Long = 0L)       // floor(frames * microSecPerFrame / 1000)

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

  /** REAL audio decode via the JDK's own codecs (javax.sound.sampled —
    * WAV, AIFF, AU, no external libraries): sample rate, channel count,
    * frame count, and exact integer sample stats (Σ|s| and peak over the
    * 16-bit PCM samples). Non-16-bit or compressed encodings (ULAW/ALAW,
    * 8/24-bit PCM) are converted to 16-bit signed PCM through the JDK's
    * own converter first, so the stats are always in 16-bit units.
    * Returns None for payloads no installed reader recognizes (including
    * truncated/corrupt files) — the caller falls back to byte-level
    * features, never fails the batch. Runs entirely on the executor
    * holding the bytes. */
  private def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Int)] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      // magic-byte gate BEFORE the codec: the JDK readers cover exactly
      // WAV (RIFF/WAVE), AIFF/AIFC (FORM) and AU (.snd) — anything else
      // would throw inside AudioSystem after an expensive reader probe,
      // and at corpus scale most "audio"-typed payloads are not audio
      def cc(off: Int) =
        if (bytes.length < off + 4) "" else new String(bytes, off, 4, "US-ASCII")
      val known = (cc(0) == "RIFF" && cc(8) == "WAVE") ||
        (cc(0) == "FORM" && (cc(8) == "AIFF" || cc(8) == "AIFC")) ||
        cc(0) == ".snd"
      if (!known) return None
      val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val f0 = raw.getFormat
      val ais =
        if (f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f0.getSampleSizeInBits == 16) raw
        else AudioSystem.getAudioInputStream(new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, f0.getSampleRate, 16,
          f0.getChannels, 2 * f0.getChannels, f0.getSampleRate,
          f0.isBigEndian), raw)
      val fmt = ais.getFormat
      val ch = fmt.getChannels
      val rate = math.round(fmt.getSampleRate)
      val big = fmt.isBigEndian
      val data = ais.readAllBytes()
      val nSamples = data.length / 2
      var sum = 0L
      var peak = 0
      var i = 0
      while (i + 1 < data.length) {
        val s =
          if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
          else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
        val a = math.abs(s)
        sum += a
        if (a > peak) peak = a
        i += 2
      }
      val frames = nSamples.toLong / ch
      Some((rate, ch, frames, sum, peak))
    } catch { case _: Exception => None }

  /** Deterministic 16-bit PCM WAV encoder (tests + the `mm_audio`
    * oracle): interleaved samples at `rate` Hz / `channels`, losslessly
    * round-trippable through [[decodeAudio]]. */
  def encodeWav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // WAV PCM is little-endian
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat, 16,
      channels, 2 * channels, rate.toFloat, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt,
      (samples.length / channels).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Minimal RIFF/AVI walk shared by the MJPEG encoder and decoder. RIFF
    * is fourcc(4) + size(4, little-endian) + payload (padded to even);
    * LIST payloads start with a list type then nest sub-chunks. */
  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Deterministic solid-color JPEG encoder (frames for
    * [[encodeAviMjpeg]]). JPEG is lossy, so pixel values round-trip only
    * approximately — the video oracle pins structural fields (dims,
    * frame count, duration), which are exact. */
  def encodeJpeg(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-AVI muxer (tests + the `mm_video` oracle):
    * each frame is an independent JPEG (what capture cards and webcams
    * emit), so the demuxed stream decodes with the JDK's own JPEG
    * reader. `fps` enters the header as floor(1e6/fps) µs per frame —
    * the integer arithmetic the decoder (and an ANSI oracle) reads back.
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty, "encodeAviMjpeg needs fps > 0 and frames")
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length % 2
      cc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        Array.fill[Byte](pad)(0)
    }
    def list(tpe: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ inner)
    val uspf = 1000000 / fps
    val maxBytes = frames.map(_.length).max
    val avih = le32(uspf) ++ le32(maxBytes * fps) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxBytes) ++
      le32(width) ++ le32(height) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(maxBytes) ++ le32(-1) ++ le32(0) ++
      Array.fill[Byte](8)(0)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      le32(width * height * 3) ++ Array.fill[Byte](16)(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** REAL video decode for MJPEG-in-AVI: parse the RIFF container
    * natively (avih header + movi frame chunks — ~60 lines, no codec),
    * decode the FIRST frame with javax.imageio for true pixel
    * dimensions, count the actual frame chunks, and derive the duration
    * from the header's µs-per-frame. Returns None when the container
    * does not parse or no frame decodes (corrupt/truncated/non-MJPEG
    * codecs — those genuinely need external libraries). Sampling only
    * the first frame keeps the cost O(1) per asset; a full-frame stat
    * pass would ride [[frameSample]]'s work plan instead. */
  private def decodeVideo(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      if (bytes.length < 24 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") return None
      var uspf = 0L
      var frames = 0L
      var firstFrame: Option[(Int, Int)] = None
      def walk(off0: Int, end: Int): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val cc = fourcc(bytes, off)
          val size = rdLe32(bytes, off + 4)
          if (size < 0 || off + 8 + size > end) return
          if (cc == "LIST") walk(off + 12, off + 8 + size)
          else if (cc == "avih" && size >= 8) uspf = rdLe32(bytes, off + 8).toLong & 0xffffffffL
          else if (cc == "00dc" || cc == "00db") {
            frames += 1
            if (firstFrame.isEmpty) {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, off + 8, size))
              if (img != null) firstFrame = Some((img.getWidth, img.getHeight))
            }
          }
          off += 8 + size + (size % 2)
        }
      }
      walk(12, bytes.length)
      firstFrame.map { case (w, h) => (w, h, frames, frames * uspf / 1000L) }
    } catch { case _: Exception => None }

  /** Per-batch decode: images go through the REAL [[decodeImage]] path,
    * audio through the REAL [[decodeAudio]] path, and MJPEG-AVI video
    * through the REAL [[decodeVideo]] path (decoded=true + stats when
    * the bytes parse); other video codecs fall back to byte features
    * (they genuinely need external decoders, which slot in here without
    * touching the plan). The byte digest is computed for every asset
    * either way. */
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
      val base = MediaFeatures(m.media_id, m.media_type, bytes.length.toLong, d, frames)
      m.media_type match {
        case "image" => decodeImage(bytes) match {
          case Some((w, h, ch, s)) => base.copy(
            decoded = true, px_width = w, px_height = h, channels = ch, px_sum = s)
          case None => base
        }
        case "audio" => decodeAudio(bytes) match {
          case Some((rate, ch, fr, sum, peak)) => base.copy(
            decoded = true, sample_rate = rate, audio_channels = ch,
            n_frames = fr, audio_ms = if (rate > 0) fr * 1000L / rate else 0L,
            sample_sum_abs = sum, sample_peak = peak)
          case None => base
        }
        case "video" => decodeVideo(bytes) match {
          case Some((w, h, fr, ms)) => base.copy(
            decoded = true, px_width = w, px_height = h,
            video_frames = fr, video_ms = ms)
          case None => base
        }
        case _ => base
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
