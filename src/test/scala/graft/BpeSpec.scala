package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer semantics — the sequential merge loop no single oracle
  * query can express (q_text_bpe_pairs pins the pair statistics to the
  * DuckDB oracle; everything here builds on that checked base). */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def docs = Tables.t(spark, sf, "documents")

  private val N_MERGES = 10
  private lazy val merges = Bpe.train(docs, N_MERGES)

  test("first learned merge is the oracle-checked top pair") {
    val top = SparkEntry.queries("q_text_bpe_pairs")(spark, sf)
      .orderBy(desc("cnt"), col("pair")).limit(1).collect()(0).getString(0)
    assert(merges.nonEmpty)
    assert(merges.head == { val Array(a, b) = top.split(" ", 2); (a, b) })
  }

  test("training is deterministic") {
    assert(Bpe.train(docs, N_MERGES) == merges)
  }

  test("merges strictly shrink the vocabulary's symbol count and leave no learned pair adjacent") {
    val v0 = Bpe.initVocab(docs)
    val vN = v0.select(col("w"), Bpe.applyMerges(col("sym"), merges).as("sym"), col("wc"))
    val s0 = v0.agg(sum(size(col("sym")))).collect()(0).getLong(0)
    val sN = vN.agg(sum(size(col("sym")))).collect()(0).getLong(0)
    assert(sN < s0, s"merges applied nowhere: $s0 -> $sN")
    // after applying the full ordered list, no adjacent pair may equal a
    // learned merge: merging never creates NEW adjacency of two existing
    // symbols, so each learned pair is gone for good once applied
    val mergeSet = merges.map { case (a, b) => s"$a $b" }.toSet
    val leftover = Bpe.pairCounts(vN)
      .where(col("pair").isin(mergeSet.toSeq: _*)).count()
    assert(leftover == 0, s"$leftover learned pairs still adjacent")
  }

  test("q_text_bpe_encode pieces reconstruct their words; merges actually applied") {
    val rows = SparkEntry.queries("q_text_bpe_encode")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (w, n, pieces) = (r.getString(0), r.getInt(2), r.getString(3))
      assert(pieces.replace(" ", "") == w, s"pieces of '$w' don't reconstruct it")
      assert(pieces.split(" ").length == n)
    }
    // the trained merges must have fused something in the top words
    assert(rows.exists(r => r.getString(3).split(" ").exists(_.length > 1)),
      "no multi-char piece in the top-30 — merge list not applied")
  }

  test("train == an independently-written strict-sequential reference loop") {
    // Bpe.train delegates to trainBatched(…, 1), so comparing the two
    // would be tautological (review r10). This loop re-implements the
    // sequential argmax-apply contract directly from the primitives: ONE
    // pair ranked and applied per iteration, limit(1), no batching code.
    var vocab = Bpe.initVocab(docs)
    val ref = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (ref.size < N_MERGES) {
      val top = Bpe.pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair").asc).limit(1).collect()
      assert(top.nonEmpty, "corpus fully merged before N_MERGES")
      val Array(a, b) = top(0).getString(0).split(" ", 2)
      ref += ((a, b))
      vocab = vocab.select(col("w"),
        Bpe.mergeAdjacent(col("sym"), a, b).as("sym"), col("wc"))
    }
    assert(merges == ref.toSeq,
      s"train diverged from the sequential reference:\n$merges\nvs\n$ref")
  }

  test("batched training: argmax-first, deterministic, lossless at 50 merges") {
    val batched = Bpe.trainBatched(docs, 50, 16)
    // the first acceptance of the first batch is the true argmax — the
    // strict trainer's first merge
    assert(batched.head == merges.head)
    assert(batched.size > N_MERGES, s"only ${batched.size} merges learned")
    assert(Bpe.trainBatched(docs, 50, 16) == batched, "batched training not deterministic")
    // batch members are symbol-disjoint within each ranking round, so the
    // one-pass application must still reconstruct every word exactly
    val broken = Bpe.initVocab(docs)
      .select(col("w"), Bpe.applyMerges(col("sym"), batched).as("sym"))
      .where(concat_ws("", col("sym")) =!= col("w")).count()
    assert(broken == 0, s"$broken words not reconstructed under batched merges")
    // and no learned pair survives adjacent anywhere in the vocabulary
    val vN = Bpe.initVocab(docs)
      .select(col("w"), Bpe.applyMerges(col("sym"), batched).as("sym"), col("wc"))
    val mergeSet = batched.map { case (a, b) => s"$a $b" }.toSet
    val leftover = Bpe.pairCounts(vN)
      .where(col("pair").isin(mergeSet.toSeq: _*)).count()
    assert(leftover == 0, s"$leftover learned pairs still adjacent")
  }

  test("left-to-right non-overlapping merge convention; segmentation is lossless") {
    val tripleA = Bpe.mergeAdjacent(typedLit(Seq("a", "a", "a")), "a", "a")
    assert(spark.range(1).select(tripleA).collect()(0).getSeq[String](0) == Seq("aa", "a"))
    // concatenating any word's tokens reconstructs the word exactly
    val broken = Bpe.initVocab(docs)
      .select(col("w"), Bpe.applyMerges(col("sym"), merges).as("sym"))
      .where(concat_ws("", col("sym")) =!= col("w")).count()
    assert(broken == 0, s"$broken words not reconstructed by their tokens")
  }
}
