package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over the document corpus — the
  * tokenizer-construction step of a training-data pipeline. No SNOWAV
  * analog (SURVEY.md §0 [U] scheme); extends the §3B #45 text family.
  *
  * Scale shape (100 TB): the ONLY corpus-scale operation is the word-count
  * `groupBy` in [[wordCounts]] — one map-side-combinable shuffle over the
  * tokenized corpus. Every subsequent step (pair statistics, the merge
  * loop) runs on the DISTINCT-WORD table weighted by frequency, which Zipf
  * bounds far below corpus size (web text: ~10⁷–10⁸ distinct words vs
  * ~10¹³ tokens), exactly how production distributed BPE trainers
  * decompose the problem. Each merge iteration is one aggregation over
  * that table plus a 1-row argmax brought to the driver — the merge
  * DECISION is inherently sequential (merge i+1's statistics depend on
  * merge i having been applied); the per-iteration work stays distributed.
  *
  * Conventions (mirrored exactly by the oracle SQL and the spec):
  * - words = maximal `[a-z]+` runs of the lowercased text, length ≥ 2;
  * - pair statistics count every adjacent occurrence (overlaps included:
  *   "aaa" contributes (a,a) twice), ties broken by pair string ascending;
  * - a merge applies left-to-right non-overlapping ("a a a" → ["aa","a"]).
  */
object Bpe {

  /** Distinct words with frequencies — the one corpus-scale shuffle. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Character-split via substr over a sequence — avoids `split(w, "")`
    * whose zero-width-match edge behavior differs across engines. */
  def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Initial symbol table: (w, sym: array<string> of chars, wc). */
  def initVocab(docs: DataFrame): DataFrame =
    wordCounts(docs).select(col("w"), chars(col("w")).as("sym"), col("wc"))

  /** Frequency of every adjacent symbol pair, weighted by word count.
    * Pair rendered as "left right" (space-joined; symbols are letter-only
    * so the delimiter is unambiguous). */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val n = size(col("sym"))
    vocab
      .select(explode(zip_with(slice(col("sym"), lit(1), n - 1),
          slice(col("sym"), lit(2), n - 1),
          (x, y) => concat_ws(" ", x, y))).as("pair"),
        col("wc"))
      .groupBy("pair").agg(sum(col("wc")).as("cnt"))
  }

  /** Merge adjacent (a, b) → a+b, left-to-right non-overlapping, as a fold
    * over the symbol array: the accumulator's last element merges with the
    * current one iff they are exactly (a, b) — a freshly merged symbol is
    * the concatenation and can never re-match `a`, which yields the
    * standard greedy semantics ("a a a" → ["aa", "a"]). */
  def mergeAdjacent(sym: Column, a: String, b: String): Column =
    aggregate(sym, typedLit(Seq.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply an ordered merge list to a symbol array (tokenize a word with a
    * trained vocabulary). Builds one fold per merge — fine for bounded
    * merge lists; a production tokenizer with thousands of merges applies
    * them in rank batches with intermediate materialization
    * ([[applyMergesBatched]]). */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) => mergeAdjacent(c, a, b) }

  /** Apply a LONG merge list to a (w, sym, wc) vocabulary in rank batches
    * with intermediate materialization — the production tokenizer shape
    * [[applyMerges]]'s scaladoc promises. A single expression of n nested
    * folds costs Catalyst O(n²)-ish analysis/codegen (measured: a 500-deep
    * chain stalls the driver for minutes; 32-deep compiles in seconds), so
    * each batch is one bounded expression and `localCheckpoint` truncates
    * the logical plan between batches — analyzer cost stays O(batch) per
    * step instead of O(total applied so far). */
  def applyMergesBatched(vocab: DataFrame, merges: Seq[(String, String)],
      batch: Int = 32): DataFrame =
    merges.grouped(batch).foldLeft(vocab) { (v, g) =>
      v.select(col("w"), applyMerges(col("sym"), g).as("sym"), col("wc"))
        .localCheckpoint(true)
    }

  /** Train `nMerges` strict-sequential BPE merges. Deterministic: argmax
    * by (count DESC, pair ASC). Stops early when no pair remains (fully
    * merged corpus). Equals [[trainBatched]] at batch size 1 (asserted
    * in BpeSpec). */
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String)] =
    trainBatched(docs, nMerges, 1)

  /** Batched BPE training — the scale dial for the per-merge latency wall
    * (VERDICT r9: sequential training is 2 Spark actions PER MERGE; fine
    * at 10 merges, untenable at production merge counts). Each iteration
    * ranks pair counts once and greedily accepts up to `batch` merges
    * from the top of the ranking, requiring each accepted pair to be
    * SYMBOL-DISJOINT from every earlier acceptance in the batch
    * (including its concatenation): merging (a,b) only destroys
    * occurrences of pairs touching a or b and only creates pairs
    * touching the new symbol ab, so disjoint pairs' counts — and a
    * disjoint merge's left-to-right application — are invariant across
    * the batch, making the batch rewrite ONE vocabulary pass
    * (confluent; applied in rank order). All accepted merges then apply
    * in one fold ⇒ 2 actions per BATCH, amortizing the driver round-trip
    * ~batch×.
    *
    * Contract vs strict-sequential BPE: the batch argmax (rank 1) is
    * always the true next merge; later batch members are the standard
    * frequency-batched approximation (a pair CREATED by an earlier batch
    * merge could, under strict recounting, outrank them — its count is
    * bounded by its creator's, so only ties-to-slightly-lower ranks can
    * reorder). batch = 1 recovers the exact sequential trainer; the
    * lossless-segmentation and no-leftover-pair invariants hold for any
    * batch (BpeSpec). The 2-row-per-action collects are bounded driver
    * artifacts: ≤ 4·batch ranked pairs per iteration. */
  def trainBatched(docs: DataFrame, nMerges: Int, batch: Int): Seq[(String, String)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    // localCheckpoint (eager), not persist: persist truncates EXECUTION
    // but the logical plan still accumulates one batch-deep fold chain
    // per iteration, so analyzer/codegen cost grows quadratically with
    // merges learned — at 500 merges the driver stalls for minutes in
    // analysis (measured r11). Checkpointing caps the plan at one batch.
    // The checkpointed RDDs (one distinct-word table per batch) free on
    // GC; a production run at thousands of merges would interleave
    // explicit parquet materialization (Tables.memoizedOnDisk shape).
    var vocab = initVocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val want = math.min(batch, nMerges - merges.size)
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(4 * want).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val it = top.iterator
        while (sel.size < want && it.hasNext) {
          val Array(a, b) = it.next().getString(0).split(" ", 2)
          if (!used(a) && !used(b) && !used(a + b)) {
            sel += ((a, b))
            // reserve both constituents AND the merged symbol: a later
            // batch member touching any of them would see stale counts
            used += a; used += b; used += (a + b)
          }
        }
        merges ++= sel
        vocab = vocab
          .select(col("w"), applyMerges(col("sym"), sel.toSeq).as("sym"), col("wc"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }
}
