package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Text-mining operators over the document corpus: retrieval-window
  * chunking, token-entropy quality scoring, and PMI collocation mining.
  * No SNOWAV analog (upstream has no text ops; SURVEY.md §0 [U] scheme) —
  * these extend the §3B #45 text-analysis family with the remaining ops a
  * training-data pipeline runs between cleaning and embedding.
  *
  * Scale notes (100 TB):
  * - q_text_chunk: pure narrow op — sequence/explode/substr per row, zero
  *   shuffles, fully pipelined inside whole-stage codegen. Chunking 100 TB
  *   is exactly a full scan plus ~n_chars/STRIDE output rows per doc; the
  *   presentation ORDER BY is the only exchange and exists for the oracle
  *   compare, not the op.
  * - q_text_entropy: two map-side-combinable aggs ((doc_id,tok) then
  *   doc_id). Entropy is recomposed from INTEGER token counts —
  *   H = ln(n) − Σc·ln(c)/n — so partitioning/order cannot change the
  *   pre-rounding value beyond float-sum ulps (rounded to 4dp like every
  *   float in the suite).
  * - q_text_pmi: bigram and unigram counts are map-side combinable; the
  *   two unigram joins are size-gated broadcasts (vocabulary-bounded, not
  *   corpus-bounded — but at web scale "vocabulary" includes typos, so the
  *   gate matters); the corpus totals are 1-row aggs (forced broadcast is
  *   safe at any scale). PMI is pure arithmetic over counts in log space —
  *   ln(c_xy)+2·ln(N_uni)−ln(N_big)−ln(c1)−ln(c2) — which never forms the
  *   overflow-prone integer product c_xy·N_uni².
  */
object TextMining extends QueryPack {

  /** Chunk window (chars) and stride: 50-char overlap between windows. */
  private val CHUNK = 200

  /** Feature-hashing dimensionality (q_feature_hash). */
  private val FH_DIM = 64
  private val STRIDE = 150

  /** Collocation support floor: bigrams rarer than this carry no stable
    * PMI signal (and make the estimate high-variance). */
  private val PMI_MIN_PAIR = 20

  /** Memoized persisted corpus count tables, shared by q_text_pmi and
    * q_text_ppl (and read multiple times per Bench pass) — the shared
    * [[Tables.memoized]] store. */
  private def cached(s: SparkSession, d: String, stage: String)(mk: => DataFrame): DataFrame =
    Tables.memoized(s, d, stage)(mk)

  /** Tokenized docs: (doc_id, tk). */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), LlmPipeline.toks(col("text")).as("tk"))

  /** Corpus bigram counts (bigram, c_xy) — NON-distinct bigrams. */
  private def bigramCounts(s: SparkSession, d: String): DataFrame =
    cached(s, d, "bigram_counts") {
      tokenized(s, d).select(explode(Curation.bigramsAll(col("tk"))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
    }

  /** Corpus unigram counts (tok, c). */
  private def uniCounts(s: SparkSession, d: String): DataFrame =
    cached(s, d, "uni_counts") {
      tokenized(s, d).select(explode(col("tk")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
    }

  /** Merge-list size for the persisted BPE tokenizer artifact — 50 in
    * round 10 to exercise the batched trainer at a real merge count
    * (the sequential loop's 2-actions-per-merge latency made >10
    * untenable; see [[Bpe.trainBatched]]). */
  private val BPE_MERGES = 50

  /** Merges accepted per ranking round-trip: actions per merge drop from
    * 2 to 2/BPE_BATCH (~16× at this setting). */
  private val BPE_BATCH = 16

  /** Trained BPE merges, persisted like every index artifact: the
    * batched training loop ([[Bpe.trainBatched]]) runs ONCE per corpus
    * and its (rank, a, b) rows publish to parquet; later sessions load
    * them back. The `collect()` is a bounded artifact load — BPE_MERGES
    * rows — not a data collect. */
  private def trainedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    Tables.memoizedOnDisk(s, d, s"bpe_merges_b${BPE_BATCH}_n$BPE_MERGES") {
      import s.implicits._
      Bpe.trainBatched(t(s, d, "documents"), BPE_MERGES, BPE_BATCH).zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }.toDF("rank", "a", "b")
    }.orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** BM25 parameters (Robertson's defaults) and the fixed retrieval
    * query. The +1 idf variant (`ln(1 + (N−df+0.5)/(df+0.5))`) keeps
    * scores positive for terms in >half the corpus — which in this
    * synthetic 30-word vocabulary is every term. */
  private val BM25_K1 = 1.2
  private val BM25_B = 0.75
  private val BM25_TERMS = Seq("vector", "stream", "hash")

  def queries: Seq[(String, Fn)] = Seq(

    // BM25 retrieval: rank the corpus against a fixed term query — the
    // lexical-retrieval step a curation pipeline runs to pull eval-set
    // neighbors or topic slices out of a 100 TB corpus.
    //
    // Plan shape: ZERO corpus shuffles. Pass 1 projects per-doc term
    // frequencies (size(filter(tk, _ == term)) — narrow, codegen'd) and
    // collapses to ONE stats row (N, Σdl, per-term df) that broadcasts
    // back; pass 2 recomputes the projection, scores with pure
    // arithmetic, and TakeOrderedAndProject keeps the top 20 — the only
    // exchange is the top-k gather. An exploded (doc,term) formulation
    // would shuffle a posting list the size of the corpus.
    "q_text_bm25" -> ((s, d) => {
      def tfdoc(df: DataFrame): DataFrame = {
        val tk = LlmPipeline.toks(col("text"))
        df.select(
          col("doc_id") +: size(tk).cast(LongType).as("dl") +:
            BM25_TERMS.zipWithIndex.map { case (term, i) =>
              size(filter(tk, x => x === term)).cast(LongType).as(s"tf$i")
            }: _*)
      }
      val docs = tfdoc(t(s, d, "documents"))
      // 1-row corpus stats: forced broadcast is safe at any scale
      val statCols = sum(col("dl")).as("sum_dl") +:
        BM25_TERMS.indices.map(i => count_if(col(s"tf$i") > 0).as(s"df$i"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), statCols: _*)
      val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
      val score = BM25_TERMS.indices.map { i =>
        val idf = log(lit(1.0) +
          (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
        val tf = col(s"tf$i").cast(DoubleType)
        idf * (tf * (BM25_K1 + 1)) /
          (tf + lit(BM25_K1) * (lit(1 - BM25_B) + lit(BM25_B) * col("dl") / avgdl))
      }.reduce(_ + _)
      tfdoc(t(s, d, "documents")).crossJoin(broadcast(stats))
        .select(col("doc_id"), col("dl").as("n_tokens"), r4(score).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(20)
    }),

    // Tokenize the corpus vocabulary with the TRAINED merge list — the
    // apply side of the BPE trainer, against the persisted tokenizer
    // artifact. Work runs over the Zipf-bounded distinct-word table
    // (same decomposition as training); per-doc token streams are this
    // joined back to words, so the corpus-scale cost is one broadcast
    // join. Rows-only driver check BY DESIGN: the sequential trainer is
    // not single-query SQL — its statistics are oracle-pinned via
    // q_text_bpe_pairs and its semantics via BpeSpec (losslessness,
    // left-to-right convention, determinism).
    "q_text_bpe_encode" -> ((s, d) => {
      val merges = trainedMerges(s, d)
      Bpe.initVocab(t(s, d, "documents"))
        .select(col("w"), Bpe.applyMerges(col("sym"), merges).as("sym"), col("wc"))
        .select(col("w"), col("wc").as("n_occurrences"),
          size(col("sym")).as("n_pieces"), array_join(col("sym"), " ").as("pieces"))
        .orderBy(desc("n_occurrences"), col("w")).limit(30)
    }),

    // Overlapping fixed-width character windows with provenance offsets —
    // the doc→chunk step every embedding/retrieval pipeline runs. Window i
    // covers [i·STRIDE, i·STRIDE+CHUNK); the last window is short. A doc
    // always yields ≥1 chunk (greatest guard: Spark's sequence(0,-1) would
    // count DOWN, not return empty).
    "q_text_chunk" -> ((s, d) => {
      // repartition: single-row-group testdata file → parallelize the
      // explode (no-op at real scale where the scan has row-group splits)
      val docs = t(s, d, "documents").repartition(col("doc_id"))
      val nChunks = greatest(ceil(col("n_chars") / lit(STRIDE.toDouble)).cast(IntegerType), lit(1))
      docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id").cast(LongType) * STRIDE).as("chunk_start"),
          col("text").substr(col("chunk_id") * STRIDE + 1, lit(CHUNK)).as("chunk"))
        .withColumn("chunk_len", length(col("chunk")))
        .orderBy("doc_id", "chunk_id")
    }),

    // Token Shannon entropy (nats) per doc — the distribution-shape
    // quality signal (low entropy = repetitive/templated text) that
    // complements q_quality_repetition's bigram top-share. Recomposed from
    // integer counts: H = ln(n) − (Σ c·ln c)/n.
    //
    // Fully NARROW: a per-doc statistic must never shuffle the corpus, so
    // the token counts come from a run-length fold over the doc's own
    // sorted token array (O(n log n) per row, constant accumulator) —
    // zero exchanges, zero aggs, the whole op pipelines inside the scan
    // stage. The groupBy((doc_id,tok))→groupBy(doc_id) formulation would
    // shuffle the full token stream twice for a value each row can
    // compute alone.
    "q_text_entropy" -> ((s, d) => {
      val docs = t(s, d, "documents").repartition(col("doc_id"))
      // fold state: (prev token|null, current run length, Σ run·ln(run)
      // over CLOSED runs, #closed runs). null init never equals a token,
      // so the first element always opens a run.
      val zero = struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
        lit(0.0).as("slc"), lit(0L).as("types"))
      val closed = (run: Column, slc: Column) =>
        slc + when(run > 0, run.cast(DoubleType) * log(run)).otherwise(0.0)
      val folded = aggregate(
        array_sort(col("tk")), zero,
        (acc, x) => when(x === acc.getField("prev"),
          struct(x.as("prev"), (acc.getField("run") + 1).as("run"),
            acc.getField("slc").as("slc"), acc.getField("types").as("types")))
          .otherwise(
            struct(x.as("prev"), lit(1L).as("run"),
              closed(acc.getField("run"), acc.getField("slc")).as("slc"),
              (acc.getField("types") + 1).as("types"))),
        acc => struct(closed(acc.getField("run"), acc.getField("slc")).as("slc"),
          acc.getField("types").as("types")))
      docs
        // tokens hoisted into their own projection (re-split pitfall — see
        // LlmPipeline.shingles)
        .select(col("doc_id"), LlmPipeline.toks(col("text")).as("tk"))
        .select(col("doc_id"), size(col("tk")).cast(LongType).as("n_toks"),
          folded.as("f"))
        .select(col("doc_id"), col("n_toks"),
          col("f.types").as("n_types"),
          r4(log(col("n_toks")) - col("f.slc") / col("n_toks")).as("entropy"))
        .orderBy("doc_id")
    }),

    // Pointwise mutual information of adjacent-token pairs over the whole
    // corpus: which co-occurrences are more frequent than independence
    // predicts. Top-30 by PMI among bigrams with support ≥ PMI_MIN_PAIR.
    "q_text_pmi" -> ((s, d) => {
      val bc = bigramCounts(s, d)
      val uni = uniCounts(s, d)
      // 1-row corpus totals: forced broadcast is provably bounded
      val nUni = uni.agg(sum("c").as("n_uni"))
      val nBig = bc.agg(sum("c_xy").as("n_big"))
      bc.where(col("c_xy") >= PMI_MIN_PAIR)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(maybeBroadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))), "w1")
        .join(maybeBroadcast(uni.select(col("tok").as("w2"), col("c").as("c2"))), "w2")
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
        .select(col("bigram"), col("c_xy"),
          r4(log(col("c_xy")) + lit(2.0) * log(col("n_uni"))
            - log(col("n_big")) - log(col("c1")) - log(col("c2"))).as("pmi"))
        .orderBy(desc("pmi"), col("bigram")).limit(30)
    }),

    // LM-perplexity quality filter: score each doc under an add-1-smoothed
    // corpus bigram model — p(y|x) = (c_xy + 1)/(c_x + V) — and emit the
    // average negative log-likelihood per bigram (monotone in perplexity:
    // ppl = exp(avg_nll)). The standard "does this doc look like the
    // corpus" filter that catches gibberish exact-dedup and heuristic
    // ratios miss. Shape at 100 TB: corpus model tables are
    // vocabulary-sized (size-gated broadcasts), V is a 1-row agg, and the
    // per-doc scoring is one exploded join + one map-side-combinable agg.
    "q_text_ppl" -> ((s, d) => {
      val bc = bigramCounts(s, d)
      val uni = uniCounts(s, d)
      val vocab = uni.agg(count(lit(1)).as("v"))
      val docBigrams = tokenized(s, d)
        .select(col("doc_id"), explode(Curation.bigramsAll(col("tk"))).as("bigram"))
      docBigrams
        .join(maybeBroadcast(bc), "bigram")
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .join(maybeBroadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))), "w1")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          (log(col("c1") + col("v")) - log(col("c_xy") + 1)).as("nll"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), r4(avg(col("nll"))).as("avg_nll"))
        .orderBy("doc_id")
    }),

    // BPE merge statistics — the first decision of tokenizer training:
    // adjacent character-pair frequencies over the DISTINCT-WORD table
    // weighted by word count (the Zipf compression that makes distributed
    // BPE feasible: the corpus-scale shuffle is the word groupBy; the
    // pair explode runs over the vocabulary only). Top-1 here IS the first
    // merge [[Bpe.train]] learns — asserted in BpeSpec; the full
    // sequential merge loop lives in [[Bpe]] (scalatest-covered, a loop of
    // queries can't be one oracle query).
    "q_text_bpe_pairs" -> ((s, d) =>
      Bpe.pairCounts(Bpe.initVocab(t(s, d, "documents")))
        .select(col("pair"), col("cnt"))
        .orderBy(desc("cnt"), col("pair")).limit(20)),

    // Hashing-trick featurization: each token lands in a fixed
    // FH_DIM-bucket sparse vector via the portable 60-bit md5 hash —
    // dimensionality is corpus-independent (no vocabulary build, no OOV
    // path), the standard feature-engineering step before a linear model
    // or a bucketed neighbor probe. Both aggregates are map-side
    // combinable and nothing scales with vocabulary size; the sparse
    // vector is serialized "bucket:count" (sorted in-row) because raw
    // arrays can't cross the oracle bridge.
    "q_feature_hash" -> ((s, d) => {
      val buck = t(s, d, "documents")
        .select(col("doc_id"), explode(LlmPipeline.toks(col("text"))).as("tok"))
        .select(col("doc_id"), (h60(col("tok")) % FH_DIM).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      buck.groupBy("doc_id")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("b"), col("c")))),
            x => concat_ws(":", x.getField("b"), x.getField("c"))), " ").as("features"),
          count(lit(1)).as("n_dims"))
        .orderBy("doc_id")
    }),

    // Fuzzy self-join via FastSS deletion-neighborhood blocking: two
    // names match when levenshtein ≤ 1. Every string emits its len+1
    // single-deletion variants plus itself — LINEAR ×(len+2) blowup — and
    // candidates are pairs sharing a variant key, versus the quadratic
    // all-pairs scan the oracle runs. Recall is exact: a substitution
    // pair shares the variant deleting the differing position, an
    // insert/delete pair shares the shorter string itself. Sharing a
    // variant bounds true distance at 2, so the exact levenshtein ≤ 1
    // confirm on the (already narrow) candidates restores precision.
    // The %10 universe cap exists ONLY to keep the oracle's O(n²) side
    // tractable at bench scale — the blocked plan needs no cap.
    "q_join_fuzzy" -> ((s, d) =>
      fuzzySelfJoin(t(s, d, "customer").where(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("k"), col("c_name").as("nm")))
        .orderBy("k_a", "k_b")),

    // Multinomial Naive Bayes, trained AND applied distributed: class =
    // lang, features = tokens, add-1 smoothing over the corpus vocab;
    // output is the resubstitution confusion matrix (class separability
    // of the corpus under a count-based model — the trained counterpart
    // of q_text_langid's fixed heuristic). The absent-token trick makes
    // the scoring join INNER: log((cnt+1)/(tot+V)) splits into
    // ln(cnt+1) − ln(tot+V), and ln(0+1) = 0, so tokens a class never
    // saw contribute only the −dl·ln(tot+V) term, computed without any
    // (token × class) dense grid. Scores accumulate as DECIMAL(38,18) of
    // per-term doubles, so the per-doc argmax is exact and
    // order-immune — a double sum's partial-order drift could flip a
    // near-tie argmax between engines (CORRECTNESS would catch exactly
    // that).
    //
    // 100 TB shape: the model (class-token counts) is vocabulary-sized,
    // not corpus-sized — size-gated broadcast; the one corpus-scale
    // shuffle is the (doc, tok) tf aggregate; scoring is a token-keyed
    // join + map-side-combinable (doc, class) sum; argmax is the
    // TopKPerKey rank-filter shape (k=1).
    "q_ml_naive_bayes" -> ((s, d) => {
      val d18 = DecimalType(38, 18)
      val docTok = cached(s, d, "nb_doc_tok") {
        tokenized(s, d).select(col("doc_id"), explode(col("tk")).as("tok"))
          .join(t(s, d, "documents").select(col("doc_id"), col("lang")), "doc_id")
          .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
      }
      val classTok = docTok.groupBy(col("lang").as("model_lang"), col("tok"))
        .agg(sum("tf").as("cnt"))
      val classTot = classTok.groupBy("model_lang").agg(sum("cnt").as("tot"))
      val priors = t(s, d, "documents")
        .groupBy(col("lang").as("model_lang")).agg(count(lit(1)).as("n_docs"))
      // (a rollup fusing classTot+vocab into one pass was tried in r22 and
      // reverted: sharing their lineage makes the classes join an
      // ambiguous self-join for the analyzer, and the saving is one tiny
      // vocabulary-scale stage)
      val vocab = classTok.agg(countDistinct(col("tok")).as("v"))
      // n_all derived from priors (r22, guide §2.4): the sum of per-lang
      // group counts IS the table count unconditionally (a null lang forms
      // its own group, so nothing escapes) — one corpus scan + one
      // aggregation subtree fewer than the separate documents.count.
      val nAll = priors.agg(sum(col("n_docs")).as("n_all"))
      // classes: one row per model class with totals/prior/vocab —
      // provably bounded (#langs rows), forced broadcast is safe
      val classes = classTot.join(priors, "model_lang")
        .crossJoin(broadcast(vocab)).crossJoin(broadcast(nAll))
      // r22 (guide §2.4 "two operations keyed the same way share one
      // exchange"): the r21 plan ran s1's (doc_id, model_lang) aggregate,
      // dl's (doc_id, lang) aggregate, their (doc_id, model_lang) join and
      // the per-doc argmax window each off its OWN corpus-scale exchange —
      // 19 AQE stage jobs per execution, c8/c32 ratio 0.70 (latency-bound,
      // not data-bound). ONE pinned exchange of the narrow (doc, tok, tf)
      // frame by doc_id now feeds the whole scoring tail: hash(doc_id)
      // satisfies the clustered distribution of both aggregates (subset
      // rule), the broadcast joins preserve it alias-aware, the scored
      // join is co-partitioned on it, and the TopK argmax heaps inherit
      // it. Both consumers canonicalize identically, so AQE materializes
      // the exchange once. The partition count is PINNED (exempt from AQE
      // coalescing — the expansion below is invisible to its size
      // heuristic) and comes from the session's shuffle-partition conf,
      // the deployment scale dial.
      val docTokP = docTok.repartition(
        org.apache.spark.sql.graftx.Sizing.numShufflePartitions(docTok),
        col("doc_id"))
      // ONE aggregation computes BOTH per-(doc, class) sums: each (doc,
      // tok, tf) row crosses the L-row class list (broadcast), LEFT-joins
      // the class-token counts (broadcast, unique per (model_lang, tok)),
      // and the group then holds every token exactly once per class — so
      // dl = Σtf inside the same group, and a token the class never saw
      // contributes tf·0 (ln(0+1) = 0, the absent-token trick) to s1
      // exactly as the r21 inner-join form's missing row did. Decimal
      // accumulation is order-immune, so the fold is bitwise-identical.
      // The r21 form ran s1 and dl as separate corpus-scale aggregation
      // subtrees joined on (doc_id, model_lang) — and since the planner
      // requires ALL cluster keys for join co-partitioning, that join
      // re-exchanged both sides and the argmax re-exchanged again.
      // the class list is classTot's lang set (⊆ priors — every tokenized
      // doc is a document — so the inner classes join below keeps exactly
      // these langs): crossing with it avoids re-materializing the whole
      // classes chain a second time just to project one column
      val scored = docTokP
        .crossJoin(broadcast(classTot.select("model_lang")))
        .join(maybeBroadcast(classTok), Seq("model_lang", "tok"), "left")
        .groupBy("doc_id", "lang", "model_lang")
        .agg(sum((col("tf") * coalesce(log(col("cnt") + 1), lit(0.0))).cast(d18))
            .as("s1"),
          sum("tf").as("dl"))
        .join(broadcast(classes), "model_lang")
        .select(col("doc_id"), col("lang"), col("model_lang"),
          (col("s1") +
            (-col("dl") * log(col("tot") + col("v"))).cast(d18) +
            log(col("n_docs").cast(DoubleType) / col("n_all")).cast(d18))
            .as("score"))
      val rn = row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("model_lang").asc))
      scored.withColumn("rn", rn).where(col("rn") === 1)
        .groupBy(col("lang").as("actual_lang"), col("model_lang").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("actual_lang", "pred_lang")
    }),

    // Zipf rank-frequency fit: log(count) ~ log(rank) OLS over the
    // top-ZIPF_K tokens — the one-number healthiness check on a corpus'
    // token distribution (natural text ≈ −1; templated/synthetic text
    // drifts). The corpus collapses to the vocabulary histogram (one
    // combinable shuffle); the top-K cut is a TakeOrderedAndProject
    // (map-side partial top-K — no vocabulary sort, no single-partition
    // window over the full vocabulary); ranking and the OLS sums then
    // run over exactly K rows. Deterministic ties: (count desc, token).
    "q_text_zipf" -> ((s, d) => {
      val top = t(s, d, "documents")
        .select(explode(LlmPipeline.toks(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(ZIPF_K)
      val w = Window.orderBy(col("cnt").desc, col("tok").asc) // K rows only
      val pts = top.withColumn("rnk", row_number().over(w))
        .select(log(col("rnk").cast(DoubleType)).as("x"),
          log(col("cnt").cast(DoubleType)).as("y"))
      val d18 = DecimalType(38, 18)
      val suff = pts.agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(col("x").cast(d18)).cast(DoubleType).as("sx"),
        sum(col("y").cast(d18)).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(d18)).cast(DoubleType).as("sxx"),
        sum((col("x") * col("y")).cast(d18)).cast(DoubleType).as("sxy"),
        sum((col("y") * col("y")).cast(d18)).cast(DoubleType).as("syy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val varx = col("n") * col("sxx") - col("sx") * col("sx")
      val vary = col("n") * col("syy") - col("sy") * col("sy")
      suff.select(col("n").cast(LongType).as("n_tokens"),
        r4(cov / varx).as("zipf_slope"),
        r4((col("sy") - cov / varx * col("sx")) / col("n")).as("intercept"),
        r4(cov * cov / (varx * vary)).as("r2"))
    }),
  )

  /** Top-token count for the q_text_zipf fit (vocab at every sf tier
    * exceeds it, so both engines fit the same K points). */
  private val ZIPF_K = 200

  /** Edit-distance-≤1 self-join over `names(k, nm)` via FastSS deletion-
    * neighborhood blocking. Recall is exact: a substitution pair shares
    * the variant deleting the differing position; an insert/delete pair
    * shares the shorter string itself. Sharing a variant bounds true
    * distance at 2, so the exact levenshtein confirm on the (already
    * narrow, blocked) candidates restores precision with no recall loss. */
  private[graft] def fuzzySelfJoin(names: DataFrame): DataFrame = {
    // array_distinct BEFORE the explode: repeated chars emit duplicate
    // variants, and deduping inside the row array costs nothing, while a
    // post-explode distinct would be a corpus-scale shuffle
    val vars = names.select(col("k"), col("nm"), explode(expr(
        "array_distinct(transform(sequence(0, length(nm)), " +
        "i -> concat(substring(nm, 1, i), substring(nm, i+2))))")).as("v"))
    val cand = vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.k") < col("b.k"))
      .select(col("a.k").as("k_a"), col("a.nm").as("nm_a"),
        col("b.k").as("k_b"), col("b.nm").as("nm_b"))
      .distinct()
    cand.where(levenshtein(col("nm_a"), col("nm_b")) <= 1)
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
  }

  def oracle: Seq[(String, String)] = Seq(
    "q_text_bm25" -> {
      val tfCols = BM25_TERMS.zipWithIndex.map { case (term, i) =>
        s"CAST(len(list_filter(string_split(text,' '), x -> x = '$term')) AS BIGINT) AS tf$i"
      }.mkString(",\n        |   ")
      val dfCols = BM25_TERMS.indices.map(i =>
        s"count(*) FILTER (WHERE tf$i > 0) AS df$i").mkString(", ")
      val scoreSql = BM25_TERMS.indices.map { i =>
        s"(ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5)) * (tf$i * ${BM25_K1 + 1})) " +
          s"/ (tf$i + $BM25_K1 * (${1 - BM25_B} + $BM25_B * dl / " +
          "(CAST(sum_dl AS DOUBLE) / n_docs)))"
      }.mkString(" + ")
      s"""WITH tf AS (
        |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS dl,
        |   $tfCols
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfCols
        |  FROM tf)
        |SELECT doc_id, dl AS n_tokens, ${r4sql(scoreSql)} AS bm25
        |FROM tf CROSS JOIN stats
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin
    },
    "q_text_chunk" ->
      s"""SELECT doc_id, CAST(i AS INT) AS chunk_id,
         | CAST(i * $STRIDE AS BIGINT) AS chunk_start,
         | substr(text, CAST(i * $STRIDE + 1 AS INT), $CHUNK) AS chunk,
         | CAST(length(substr(text, CAST(i * $STRIDE + 1 AS INT), $CHUNK)) AS INT) AS chunk_len
         |FROM (
         |  SELECT doc_id, text, unnest(generate_series(0,
         |    greatest(CAST(ceil(n_chars / $STRIDE.0) AS INT), 1) - 1)) AS i
         |  FROM documents)
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_text_entropy" ->
      s"""WITH tc AS (
         |  SELECT doc_id, tok, count(*) AS c FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY doc_id, tok)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
         | CAST(count(*) AS BIGINT) AS n_types,
         | ${r4sql("ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / sum(c)")} AS entropy
         |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_pmi" ->
      s"""WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
         |bc AS (
         |  SELECT bigram, count(*) AS c_xy FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
         |      i -> tk[i] || ' ' || tk[i+1])) AS bigram FROM tk)
         |  GROUP BY bigram),
         |uni AS (
         |  SELECT tok, count(*) AS c FROM (SELECT unnest(tk) AS tok FROM tk)
         |  GROUP BY tok),
         |nu AS (SELECT sum(c) AS n_uni FROM uni),
         |nb AS (SELECT sum(c_xy) AS n_big FROM bc)
         |SELECT bigram, c_xy,
         | ${r4sql("ln(CAST(c_xy AS DOUBLE)) + 2 * ln(CAST(n_uni AS DOUBLE)) - ln(CAST(n_big AS DOUBLE)) - ln(CAST(c1 AS DOUBLE)) - ln(CAST(c2 AS DOUBLE))")} AS pmi
         |FROM bc
         |JOIN (SELECT tok AS w1, c AS c1 FROM uni) u1 ON string_split(bigram, ' ')[1] = u1.w1
         |JOIN (SELECT tok AS w2, c AS c2 FROM uni) u2 ON string_split(bigram, ' ')[2] = u2.w2
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE c_xy >= $PMI_MIN_PAIR
         |ORDER BY pmi DESC, bigram ASC LIMIT 30""".stripMargin,
    "q_text_ppl" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |db AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
         |    i -> tk[i] || ' ' || tk[i+1])) AS bigram FROM tk),
         |bc AS (SELECT bigram, count(*) AS c_xy FROM db GROUP BY bigram),
         |uni AS (
         |  SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(tk) AS tok FROM tk) GROUP BY tok),
         |vocab AS (SELECT count(*) AS v FROM uni)
         |SELECT doc_id, count(*) AS n_bigrams,
         | ${r4sql("avg(ln(CAST(c1 + v AS DOUBLE)) - ln(CAST(c_xy + 1 AS DOUBLE)))")} AS avg_nll
         |FROM db
         |JOIN bc USING (bigram)
         |JOIN (SELECT tok AS w1, c AS c1 FROM uni) u1
         |  ON string_split(bigram, ' ')[1] = u1.w1
         |CROSS JOIN vocab
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        |    FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w),
        |wp AS (
        |  SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i
        |  FROM words)
        |SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair,
        | CAST(sum(wc) AS BIGINT) AS cnt
        |FROM wp GROUP BY 1
        |ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,
    "q_feature_hash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |bc AS (
         |  SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT % $FH_DIM AS b,
         |   count(*) AS c
         |  FROM tok GROUP BY 1, 2)
         |SELECT doc_id, string_agg(b || ':' || c, ' ' ORDER BY b) AS features,
         | count(*) AS n_dims
         |FROM bc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // deliberately the naive quadratic formulation — the ground truth the
    // blocked plan must reproduce exactly
    "q_join_fuzzy" ->
      """WITH u AS (
        |  SELECT c_custkey AS k, c_name AS nm FROM customer WHERE c_custkey % 10 = 0)
        |SELECT a.k AS k_a, a.nm AS nm_a, b.k AS k_b, b.nm AS nm_b,
        | CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM u a JOIN u b ON a.k < b.k AND levenshtein(a.nm, b.nm) <= 1
        |ORDER BY k_a, k_b""".stripMargin,
    "q_ml_naive_bayes" ->
      """WITH dt AS (
        |  SELECT doc_id, lang, tok, count(*) AS tf FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2, 3),
        |ct AS (SELECT lang AS model_lang, tok, sum(tf) AS cnt FROM dt GROUP BY 1, 2),
        |tt AS (SELECT model_lang, sum(cnt) AS tot FROM ct GROUP BY 1),
        |pri AS (SELECT lang AS model_lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |vv AS (SELECT count(DISTINCT tok) AS v FROM ct),
        |na AS (SELECT count(*) AS n_all FROM documents),
        |cls AS (
        |  SELECT model_lang, tot, n_docs, v, n_all
        |  FROM tt JOIN pri USING (model_lang) CROSS JOIN vv CROSS JOIN na),
        |s1 AS (
        |  SELECT dt.doc_id, ct.model_lang,
        |   sum(CAST(dt.tf * ln(ct.cnt + 1) AS DECIMAL(38,18))) AS s1
        |  FROM dt JOIN ct ON dt.tok = ct.tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, lang, sum(tf) AS dl FROM dt GROUP BY 1, 2),
        |sc AS (
        |  SELECT dl.doc_id, dl.lang, cls.model_lang,
        |   coalesce(s1.s1, CAST(0 AS DECIMAL(38,18)))
        |    + CAST(-dl.dl * ln(cls.tot + cls.v) AS DECIMAL(38,18))
        |    + CAST(ln(CAST(cls.n_docs AS DOUBLE) / cls.n_all) AS DECIMAL(38,18)) AS score
        |  FROM dl CROSS JOIN cls
        |  LEFT JOIN s1 ON s1.doc_id = dl.doc_id AND s1.model_lang = cls.model_lang),
        |pred AS (
        |  SELECT doc_id, lang, model_lang,
        |   row_number() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, model_lang ASC) AS rn
        |  FROM sc)
        |SELECT lang AS actual_lang, model_lang AS pred_lang, count(*) AS n_docs
        |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_text_zipf" ->
      s"""WITH hist AS (
         |  SELECT tok, count(*) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY 1),
         |top AS (
         |  SELECT tok, cnt FROM hist ORDER BY cnt DESC, tok LIMIT $ZIPF_K),
         |pts AS (
         |  SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS DOUBLE)) AS x,
         |   ln(CAST(cnt AS DOUBLE)) AS y
         |  FROM top),
         |suff AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |   CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
         |   CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
         |   CAST(sum(CAST(x*x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         |   CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         |   CAST(sum(CAST(y*y AS DECIMAL(38,18))) AS DOUBLE) AS syy
         |  FROM pts),
         |f AS (
         |  SELECT n, sx, sy,
         |   n*sxy - sx*sy AS cov, n*sxx - sx*sx AS varx, n*syy - sy*sy AS vary
         |  FROM suff)
         |SELECT CAST(n AS BIGINT) AS n_tokens,
         | ${r4sql("cov / varx")} AS zipf_slope,
         | ${r4sql("(sy - cov / varx * sx) / n")} AS intercept,
         | ${r4sql("cov * cov / (varx * vary)")} AS r2
         |FROM f""".stripMargin,
  )
}
