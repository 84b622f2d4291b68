package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded via iterator-to-iterator mapPartitions
  * (north-star requirement; no SNOWAV analog).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake (fixed-size byte chunks as
  * "frames", bytes→float features). Everything Spark-side is real and
  * tested: schema, Encoders, batch shape (lazy iterators, no
  * per-partition materialization), partition-preserving decode, and the
  * join back to metadata.
  *
  * Why typed `mapPartitions` rather than `mapInPandas`: the two are the
  * same physical contract — a per-partition batch iterator in, an
  * iterator of schema'd rows out, decode library called inside — but this
  * container is JVM-only (no pyspark/pandas available to executors). A
  * Python decode stack would swap `decodeAll` for
  * `df.mapInPandas(decode_fn, schema)` with byte-identical plumbing
  * semantics; nothing else in the pipeline changes.
  *
  * Scale notes (100 TB of media): bytes stay in one column of a columnar
  * scan — never collected; decode is narrow (no shuffle), so it pipelines
  * with the scan; frame rows explode size ~32×, so downstream aggs happen
  * before any wide operation; repartition only if frame skew demands it.
  */
object Media {

  case class MediaMeta(kind: String, lang: String, source: String)
  case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int,
      feature: Array[Float], frame_hash: String)

  val FRAME_BYTES = 32

  /** STUB decoder — deterministic fake standing in for a real image/video
    * codec: chunks the payload into FRAME_BYTES "frames", features =
    * byte values scaled to [0,1], hash = md5 of the chunk. Replace with a
    * real codec binding in production; the signature (bytes → lazy frame
    * iterator) is the real contract. */
  def decodeFramesStub(mediaId: Long, bytes: Array[Byte]): Iterator[Frame] =
    bytes.grouped(FRAME_BYTES).zipWithIndex.map { case (chunk, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(chunk).map("%02x".format(_)).mkString
      Frame(mediaId, i, chunk.length,
        chunk.map(b => (b & 0xff) / 255.0f), hash)
    }

  /** documents → typed media rows (text bytes stand in for media blobs). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"),
        struct(lit("text").as("kind"), col("lang"), col("source")).as("meta"))
      .as[MediaRow]
  }

  /** Distributed decode: iterator-to-iterator mapPartitions — frames are
    * produced lazily, so a partition never materializes all its frames. */
  def decodeAll(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(m => decodeFramesStub(m.media_id, m.bytes)))
  }

  /** Frame sampling: keep every `everyN`-th frame (frame_idx % n == 0) —
    * the video frame-sample op. A narrow filter: no shuffle, pipelines
    * with decode. */
  def sampleFrames(frames: Dataset[Frame], everyN: Int): Dataset[Frame] =
    frames.filter(f => f.frame_idx % everyN == 0)

  /** "Resize" stub: average-pool a feature vector to `targetDim` buckets —
    * deterministic stand-in for image resampling with the real contract
    * (fixed output dimensionality regardless of input frame size). */
  def resizeFeature(feature: Array[Float], targetDim: Int): Array[Float] = {
    val out = new Array[Float](targetDim)
    if (feature.isEmpty) return out
    val counts = new Array[Int](targetDim)
    var i = 0
    while (i < feature.length) {
      val b = math.min(targetDim - 1, i * targetDim / feature.length)
      out(b) += feature(i); counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < targetDim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
    out
  }

  case class ResizedFrame(media_id: Long, frame_idx: Int, feature: Array[Float])

  /** Sample every `everyN`-th frame then resize features to `targetDim` —
    * the decode → frame-sample → resize pipeline, all narrow ops. */
  def sampledResized(spark: SparkSession, media: Dataset[MediaRow],
      everyN: Int, targetDim: Int): Dataset[ResizedFrame] = {
    import spark.implicits._
    sampleFrames(decodeAll(spark, media), everyN)
      .map(f => ResizedFrame(f.media_id, f.frame_idx,
        resizeFeature(f.feature, targetDim)))
  }

  /** End-to-end: decode + per-media frame stats joined back to metadata.
    * Oracle-checkable (q_multimodal_frames): the stub decoder chunks ASCII
    * text bytes, so DuckDB reproduces it with substr + generate_series —
    * the mapPartitions decode path gets a full hash-match, not just a
    * rows-only check. */
  def frameStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    // NOT repartitioned: an exchange here ships the binary payloads and
    // costs more than the single-task decode saves at this row count
    // (measured 0.82s → 0.95s); at real scale the scan's own row-group
    // splits parallelize the decode for free
    val media = mediaFromDocuments(spark, docs)
    val frames = decodeAll(spark, media)
    frames.groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("frame_hash")).as("min_frame_hash"))
      .join(media.select(col("media_id"), col("meta.lang").as("lang")), "media_id")
      .orderBy("media_id")
  }
}
