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

  /** End-to-end: decode + per-media frame stats joined back to metadata. */
  def frameStats(spark: SparkSession, docs: DataFrame): DataFrame = {
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
