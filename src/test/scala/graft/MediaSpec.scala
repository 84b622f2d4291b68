package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing: schema, lazy decode, determinism. */
class MediaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("frameStats: n_frames == ceil(n_chars/32) per doc, metadata joined") {
    val docs = Tables.t(spark, TestSpark.SF, "documents")
    val stats = Media.frameStats(spark, docs)
    val joined = stats.join(docs.select("doc_id", "n_chars"),
      stats("media_id") === docs("doc_id"))
      .select(col("media_id"), col("n_frames"), col("total_bytes"),
        col("n_chars"), col("lang"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val frames = r.getAs[Long]("n_frames")
      val total = r.getAs[Long]("total_bytes")
      val chars = r.getAs[Long]("n_chars")
      assert(frames == (chars + Media.FRAME_BYTES - 1) / Media.FRAME_BYTES,
        s"doc ${r.getLong(0)}: $frames frames for $chars bytes")
      assert(total == chars)
      assert(r.getAs[String]("lang") != null)
    }
  }

  test("decode stub: deterministic features in [0,1], stable hashes") {
    val bytes = "hello world, thirty-two-byte frame!".getBytes("UTF-8")
    val f1 = Media.decodeFramesStub(7L, bytes).toVector
    val f2 = Media.decodeFramesStub(7L, bytes).toVector
    assert(f1.map(_.frame_hash) == f2.map(_.frame_hash))
    assert(f1.head.feature.forall(v => v >= 0f && v <= 1f))
    assert(f1.map(_.n_bytes).sum == bytes.length)
  }
}
