package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing: schema, lazy decode, determinism. */
class MediaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sampleFrames keeps exactly every Nth frame; resize pools to fixed dim") {
    val docs = Tables.t(spark, TestSpark.SF, "documents")
    val media = Media.mediaFromDocuments(spark, docs)
    val all = Media.decodeAll(spark, media)
    val sampled = Media.sampleFrames(all, 2)
    val expected = all.filter(col("frame_idx") % 2 === 0).count()
    assert(sampled.count() == expected && expected > 0)
    // resize: fixed output dim regardless of input frame size (the last
    // chunk of each doc is shorter than FRAME_BYTES)
    val resized = Media.sampledResized(spark, media, 2, 8).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.feature.length == 8))
    // deterministic: same input → same features
    val again = Media.sampledResized(spark, media, 2, 8).collect()
    assert(resized.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
    // pooling preserves the mean (each input element lands in exactly one bucket)
    val f = Array(0.0f, 0.25f, 0.5f, 1.0f)
    val r = Media.resizeFeature(f, 2)
    assert(math.abs(r(0) - 0.125f) < 1e-6 && math.abs(r(1) - 0.75f) < 1e-6)
  }

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
