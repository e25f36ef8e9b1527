package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashParity

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The decode step tries a REAL container parse first — PNG/JPEG
  * dims ([[graft.functions.ImagePackedDims]]), RIFF/WAV PCM
  * ([[graft.functions.WavInfo]]), RIFF/AVI ([[graft.functions
  * .AviWalk]]) — and every modality's corpus rows carry real
  * container bytes, so the real path fires across the board. Blobs
  * no JVM-native parser recognizes fall back to a clearly-marked
  * STUB that derives deterministic dimensions from the blob's md5
  * (unit-tested directly). Everything around the decode — the schema, the
  * `Dataset[MediaRecord]` batch shape, partition-wise batched
  * processing (the Scala analog of `mapInPandas`), and the
  * frame-sample explode — is real Spark plumbing and tested.
  *
  * `mapPartitions` is used deliberately (SURVEY preference (d)):
  * opaque binary decode is genuinely imperative per-record work that
  * no Catalyst expression can express (the pixel-plane twin,
  * [[graft.functions.MediaExprs.pngRgb]], covers the expressible
  * single-format case).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)

  case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int)

  /** Synthesize a media table from documents: modality assigned
    * round-robin, EVERY modality carrying real container bytes —
    * IMAGE rows a real PNG from the pixel corpus, AUDIO rows a real
    * WAV, VIDEO rows a real MJPG AVI (broadcast-joined on a doc_id
    * modulus — each blob is a pure function of doc_id, so the oracle
    * replays length and dims from the same corpus files via
    * read_blob). */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // the blobs ride along in-memory (broadcast), but the oracle
    // re-reads the same bytes from disk — keep the corpora materialized
    graft.sources.MediaCorpus.ensurePixels()
    graft.sources.MediaCorpus.ensureWavs()
    graft.sources.MediaCorpus.ensureAvis()
    val pngs = (0 until graft.sources.MediaCorpus.NumPixelPng)
      .map(k => (k.toLong, graft.sources.MediaCorpus.pngPixelBytes(k)))
      .toDF("px_k", "png")
    val wavs = (0 until graft.sources.MediaCorpus.NumWav)
      .map(k => (k.toLong, graft.sources.MediaCorpus.wavBytes(k)))
      .toDF("wv_k", "wav")
    val avis = (0 until graft.sources.MediaCorpus.NumAvi)
      .map(k => (k.toLong, graft.sources.MediaCorpus.aviBytes(k)))
      .toDF("av_k", "avi")
    graft.core.Par.widen(docs)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        pmod(col("doc_id"),
          lit(graft.sources.MediaCorpus.NumPixelPng.toLong)).as("px_k"),
        pmod(col("doc_id"),
          lit(graft.sources.MediaCorpus.NumWav.toLong)).as("wv_k"),
        pmod(col("doc_id"),
          lit(graft.sources.MediaCorpus.NumAvi.toLong)).as("av_k"))
      .join(broadcast(pngs), Seq("px_k"), "left")
      .join(broadcast(wavs), Seq("wv_k"), "left")
      .join(broadcast(avis), Seq("av_k"), "left")
      .select(
        col("doc_id"),
        when(col("media_type") === "image", col("png"))
          .when(col("media_type") === "audio", col("wav"))
          .otherwise(col("avi")).as("media"),
        col("media_type"))
  }

  /** REAL decode attempt: parse the blob's container bytes — PNG/JPEG
    * dims; else RIFF/WAV (feature triple = (sample rate, channels,
    * PCM frames per channel)); else RIFF/AVI (dims + total frames
    * from the headers). None when no JVM-native parser recognizes
    * the bytes. */
  private def decodeReal(r: MediaRecord): Option[MediaFeatures] = {
    def feat(w: Int, h: Int, n: Int) = MediaFeatures(
      doc_id = r.doc_id, media_type = r.media_type,
      byte_len = r.media.length.toLong,
      width = w, height = h, n_frames = n)
    val p = graft.functions.ImagePackedDims.packed(r.media)
    if (p >= 0L)
      return Some(feat((p >>> 32).toInt, (p & 0xffffffffL).toInt, 1))
    val w = graft.functions.WavInfo.parse(r.media)
    if (w != null) {
      val a = w.toLongArray()
      return Some(feat(a(0).toInt, a(1).toInt, a(3).toInt))
    }
    val v = graft.functions.AviWalk.meta(r.media)
    if (v == null) None
    else {
      val a = v.toLongArray()
      Some(feat(a(0).toInt, a(1).toInt, a(2).toInt))
    }
  }

  /** STUB decode of one media blob — the fallback for modalities with
    * no decoder in this container (audio/video): dimensions are a
    * deterministic function of the bytes, three 28-bit slices of the
    * blob's md5 ([[graft.functions.HashParity]]) — replayable as pure
    * SQL (`md5(text)` substring arithmetic), so even the stub path is
    * oracle-checked. The signature — bytes in, typed features out —
    * is the real contract. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val hex = HashParity.md5Hex(r.media)
    def h(off: Int): Long = java.lang.Long.parseLong(hex.slice(off, off + 7), 16)
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      byte_len = r.media.length.toLong,
      width = (h(0) % 1920 + 1).toInt,
      height = (h(7) % 1080 + 1).toInt,
      n_frames = if (r.media_type == "video") (h(14) % 240 + 1).toInt else 1)
  }

  /** Partition-wise batched decode: records are processed in batches
    * of `batchSize` (the Arrow-batch shape a Python `mapInPandas`
    * would see), one partition per task, no driver involvement.
    * Real parse first, stub fallback. */
  def decodeBatch(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map(r => decodeReal(r).getOrElse(decodeStub(r)))
      }
    }
  }

  /** End-to-end: documents -> media -> features DataFrame. */
  def features(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    decodeBatch(mediaFromDocuments(docs).as[MediaRecord]).toDF()
  }

  /** Aspect-preserving resize plan: the (out_w, out_h) a real resize
    * step would emit for a `maxW`x`maxH` box — never upscales, keeps
    * the binding edge exact and floors the other by integer
    * cross-multiplication (no float ratios, so the plan replays
    * bit-for-bit in SQL). The arithmetic IS the production logic;
    * only the pixel work belongs to the (stubbed) decoder. */
  def resizePlan(features: DataFrame, maxW: Int = 336, maxH: Int = 336): DataFrame = {
    require(maxW > 0 && maxH > 0, "resize box must be positive")
    features
      .withColumn("out_w",
        when(col("width") <= maxW && col("height") <= maxH, col("width"))
          .when(expr(s"width * $maxH >= height * $maxW"), lit(maxW))
          .otherwise(greatest(lit(1), expr(s"width * $maxH DIV height"))))
      .withColumn("out_h",
        when(col("width") <= maxW && col("height") <= maxH, col("height"))
          .when(expr(s"width * $maxH >= height * $maxW"),
            greatest(lit(1), expr(s"height * $maxW DIV width")))
          .otherwise(lit(maxH)))
  }

  /** Frame sampling: one row per sampled frame index (every `everyN`
    * frames), all feature columns carried — the explode pattern a
    * video pipeline fans out with (non-video rows drop). */
  def frameSample(features: DataFrame, everyN: Int = 24): DataFrame =
    features.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
}
