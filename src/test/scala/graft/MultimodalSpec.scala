package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, MediaRecord}

/** Oracle for the multimodal plumbing: schema/batching/partitioning are
  * real; the decode kernel is a deterministic stub whose digest formula is
  * recomputed here (SURVEY §2.7). */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkRecord(id: Long, tpe: String, payload: String,
      w: Int = 64, h: Int = 48, dur: Int = 10000): MediaRecord =
    MediaRecord(id, tpe, payload.getBytes("UTF-8"), w, h, dur)

  private lazy val media = Seq(
    mkRecord(1, "image", "img-bytes-a"),
    mkRecord(2, "audio", "audio-bytes-bb", dur = 25000),
    mkRecord(3, "video", "video-bytes-ccc", dur = 7500),
    mkRecord(4, "image", ""),
    mkRecord(5, "video", "x", dur = 500))

  private def digest(bytes: Array[Byte]): Long = {
    var d = 1125899906842597L
    var i = 0
    while (i < bytes.length) { d = d * 31 + bytes(i); i += 1 }
    d
  }

  test("extractFeatures: digest, byte counts and frame sampling match the stub contract") {
    val got = Multimodal.extractFeatures(media.toDS().repartition(3), batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(got.size == media.size, "no records lost across partitions/batches")
    media.foreach { m =>
      val f = got(m.media_id)
      assert(f.n_bytes == m.content.length.toLong)
      assert(f.digest == digest(m.content), s"media ${m.media_id} digest")
      val expFrames = m.media_type match {
        case "video" => math.max(1, m.duration_ms / 1000)
        case "audio" => math.max(1, m.duration_ms / 5000)
        case _ => 1
      }
      assert(f.frames_sampled == expFrames)
    }
  }

  test("real javax.imageio decode: a planted PNG yields true dimensions and pixel stats") {
    // 17x11 solid color (r=200, g=30, b=7) — exact, lossless round-trip
    val png = Multimodal.encodePng(17, 11, (200 << 16) | (30 << 8) | 7)
    // plant it as a FILE and ingest through the binaryFile source (the
    // production path), not just an in-memory record
    val dir = java.nio.file.Files.createTempDirectory("graft-png")
    java.nio.file.Files.write(dir.resolve("real.png"), png)
    java.nio.file.Files.write(dir.resolve("fake.jpg"), "not-an-image".getBytes("UTF-8"))
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromFiles(spark, dir.toString).as[MediaRecord])
      .collect().map(f => f.n_bytes -> f).toMap
    val real = feats(png.length.toLong)
    assert(real.decoded, "planted PNG must decode")
    assert(real.px_width == 17 && real.px_height == 11)
    assert(real.channels == 3)
    assert(real.px_sum == 17L * 11L * (200 + 30 + 7), "exact R+G+B sum")
    val fake = feats(12L)
    assert(!fake.decoded && fake.px_width == 0 && fake.px_sum == 0L,
      "non-image bytes fall back to byte features, never fail the batch")
    // text payloads (mediaFromDocuments) must never spuriously decode
    val docFeats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(30)).as[MediaRecord])
    assert(docFeats.filter(_.decoded).isEmpty)
  }

  test("real javax.sound decode: a planted WAV yields true rate/channels/sample stats") {
    // stereo 8kHz, 100 frames: interleaved samples k -> (k*37 % 401) - 200
    val samples = Array.tabulate[Short](200)(k => ((k * 37 % 401) - 200).toShort)
    val wav = Multimodal.encodeWav(8000, 2, samples)
    val dir = java.nio.file.Files.createTempDirectory("graft-wav")
    java.nio.file.Files.write(dir.resolve("real.wav"), wav)
    java.nio.file.Files.write(dir.resolve("corrupt.wav"), "not-audio-at-all".getBytes("UTF-8"))
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromFiles(spark, dir.toString).as[MediaRecord])
      .collect().map(f => f.n_bytes -> f).toMap
    val real = feats(wav.length.toLong)
    assert(real.decoded, "planted WAV must decode")
    assert(real.sample_rate == 8000 && real.audio_channels == 2)
    assert(real.n_frames == 100L)
    assert(real.audio_ms == 100L * 1000L / 8000L)
    assert(real.sample_sum_abs == samples.map(s => math.abs(s.toInt).toLong).sum,
      "exact integer sum of |sample|")
    assert(real.sample_peak == samples.map(s => math.abs(s.toInt)).max)
    val bad = feats(16L)
    assert(!bad.decoded && bad.sample_rate == 0 && bad.sample_sum_abs == 0L,
      "non-audio bytes fall back to byte features, never fail the batch")
    // text payloads (mediaFromDocuments marks 1/3 of docs 'audio') must
    // never spuriously decode as audio either
    val docFeats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(30)).as[MediaRecord])
    assert(docFeats.filter(_.decoded).isEmpty)
  }

  test("real MJPEG-AVI decode: a planted AVI yields true dims/frames/duration") {
    // 3 solid-color JPEG frames, 24x16 @ 10 fps
    val frames = (0 until 3).map(f => Multimodal.encodeJpeg(24, 16, 0x204060 + f))
    val avi = Multimodal.encodeAviMjpeg(24, 16, 10, frames)
    val dir = java.nio.file.Files.createTempDirectory("graft-avi")
    java.nio.file.Files.write(dir.resolve("real.avi"), avi)
    java.nio.file.Files.write(dir.resolve("corrupt.mp4"), "not-a-video".getBytes("UTF-8"))
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromFiles(spark, dir.toString).as[MediaRecord])
      .collect().map(f => f.n_bytes -> f).toMap
    val real = feats(avi.length.toLong)
    assert(real.decoded, "planted MJPEG-AVI must decode")
    assert(real.px_width == 24 && real.px_height == 16,
      "pixel dims come from the DECODED first frame, not just the header")
    assert(real.video_frames == 3L)
    assert(real.video_ms == 3L * (1000000L / 10L) / 1000L)
    val bad = feats(11L)
    assert(!bad.decoded && bad.video_frames == 0L,
      "non-AVI bytes fall back to byte features, never fail the batch")
    // the first JPEG frame round-trips its solid color approximately
    // (JPEG is lossy; structural fields above are the exact oracle)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames.head))
    val rgb = img.getRGB(12, 8)
    def ch(v: Int, s: Int) = (v >> s) & 0xff
    assert(math.abs(ch(rgb, 16) - 0x20) < 16 && math.abs(ch(rgb, 8) - 0x40) < 16 &&
      math.abs(ch(rgb, 0) - 0x60) < 16, f"frame color drifted: $rgb%06x")
  }

  test("resize preserves aspect ratio and never upscales") {
    val big = mkRecord(1, "image", "p", w = 1920, h = 1080)
    val small = mkRecord(2, "image", "p", w = 100, h = 80)
    val out = Multimodal.resize(Seq(big, small).toDS(), 640, 480)
      .collect().map(m => m.media_id -> m).toMap
    assert(out(2L).width == 100 && out(2L).height == 80, "small asset untouched")
    assert(out(1L).width <= 640 && out(1L).height <= 480)
    val ratioIn = big.width.toDouble / big.height
    val ratioOut = out(1L).width.toDouble / out(1L).height
    assert(math.abs(ratioIn - ratioOut) < 0.02, "aspect preserved")
    assert(out(1L).content.sameElements(big.content), "payload untouched by metadata resize")
  }

  test("mediaFromFiles ingests a binary drop directory with typed records") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.jpg", Array[Byte](1, 2, 3))
    put("b.WAV", Array[Byte](4, 5))
    put("c.mp4", Array[Byte](6))
    put("d.bin", Array[Byte](7, 8, 9, 9))

    val media = Multimodal.mediaFromFiles(spark, dir.toString)
    val byType = media.collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]]("content").length).toMap
    assert(byType == Map("image" -> 3, "audio" -> 2, "video" -> 1, "unknown" -> 4))
    // ids are stable across re-reads (derived from path, not read order)
    val ids1 = media.select("media_id").collect().map(_.getLong(0)).sorted
    val ids2 = Multimodal.mediaFromFiles(spark, dir.toString)
      .select("media_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    // flows into the feature stage unchanged
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media.as[MediaRecord], batchSize = 2).collect()
    assert(feats.length == 4)
    assert(feats.map(_.n_bytes).sum == 10)
  }

  test("mediaFromDocuments manifest partitions every doc into exactly one type") {
    val docs = Tables.documents(spark, sfDir)
    val m = Multimodal.manifest(Multimodal.mediaFromDocuments(docs))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == Set("image", "audio", "video"))
    assert(m.values.map(_._1).sum == docs.count())
    val totalBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
    assert(m.values.map(_._2).sum == totalBytes)
  }
}
