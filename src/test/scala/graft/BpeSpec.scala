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

  test("corpus pair-universe exhaustion terminates training cleanly") {
    // the synthetic documents corpus has 30 distinct words at EVERY sf —
    // its total merge capacity is Σ_distinct(len−1) ≈ 89; asking for far
    // more must drain the universe and stop, not loop or throw
    val all = Bpe.trainBatched(docs, 500, 32)
    assert(all.size < 150 && all.nonEmpty, s"${all.size} merges from a 30-word corpus")
    val leftover = Bpe.pairCounts(
      Bpe.initVocab(docs).select(col("w"),
        Bpe.applyMerges(col("sym"), all).as("sym"), col("wc"))).count()
    assert(leftover == 0, s"training stopped with $leftover pairs still mergeable")
  }

  test("production merge count: 500 merges at batch 32, lossless, bounded driver actions", SlowTest) {
    // VERDICT r10 item 5 — the 50-merge proof says nothing about whether
    // the driver loop dominates at a real vocabulary size, and the
    // 30-word synthetic corpus exhausts at ~89 merges, so the 500-merge
    // evidence needs a REAL vocabulary: a deterministic md5-derived
    // corpus (16-letter alphabet, ~4.8k distinct words, ~25k-merge
    // capacity) — the Zipf-bounded distinct-word table shape the trainer
    // is built for. Sized so the interpreted fold evaluation (cost ∝
    // distinct words × merges, the real per-batch execution cost) keeps
    // the test inside the suite budget; wall time and actions/merge land
    // in DESIGN.md.
    val rich = spark.range(600).select(
      concat_ws(" ", (0 until 8).map(i =>
        translate(md5(concat(col("id").cast("string"), lit(s":$i"))),
          "0123456789", "ghijklmnop")): _*).as("text"))
    val t0 = System.nanoTime()
    val m500 = Bpe.trainBatched(rich, 500, 32)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m500.size == 500, s"only ${m500.size} merges learned")
    assert(m500.distinct.size == m500.size, "duplicate merge learned")
    // lossless segmentation after the full 500-merge vocabulary, applied
    // through the batched tokenizer (a single 500-deep fold expression is
    // the Catalyst stall applyMergesBatched exists to avoid)
    val broken500 = Bpe.applyMergesBatched(Bpe.initVocab(rich), m500)
      .where(concat_ws("", col("sym")) =!= col("w")).count()
    assert(broken500 == 0, s"$broken500 words not reconstructed at 500 merges")
    val batches = math.ceil(m500.size / 32.0)
    info(f"${m500.size} merges in $secs%.1f s — ${2 * batches + 1}%.0f actions, " +
      f"${(2 * batches + 1) / m500.size}%.3f actions/merge")
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
