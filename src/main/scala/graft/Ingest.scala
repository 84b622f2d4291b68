package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest facade — the PUBLIC per-batch API of every delta family
  * (VERDICT r11 task 6). The registry's `*_delta` / `*_incremental`
  * queries demonstrate each family's ingest shape against a
  * deterministic fixture batch (`id % 10 = 7`); a real pipeline calls
  * THESE entry points with whatever batch DataFrame just arrived.
  *
  * Shared contract, all methods:
  *  - `d` names a dataset directory whose per-corpus index artifacts
  *    (signature tables, postings, quantizer assignments, PQ codebooks
  *    — [[Tables.memoizedOnDisk]]) are built on first use and then
  *    reused across sessions; an ingest call never rebuilds or rescans
  *    the corpus side.
  *  - `batch` is an arbitrary DataFrame with the family's input schema
  *    (documents: `doc_id: long, text: string`; vectors: `vec_id: long,
  *    embedding: array<float/double>`). Batch-side derivations are
  *    computed fresh at O(batch) cost.
  *  - Corpus side excludes the batch's own ids (anti-join), so
  *    re-ingesting stored rows matches the registered delta queries and
  *    genuinely new ids probe the full index. exactDedup excludes by
  *    (doc_id, hash) — a batch row reusing a stored id with DIFFERENT
  *    text does not hide the stored content, which stays dedupable
  *    until actually replaced. Batch-internal duplicates
  *    are each family's next full pass's job (the documented trade),
  *    except exactDedup which flags them via `batch_dup`.
  *  - Batch-size safety: per-batch derived tables that ride a broadcast
  *    (the PQ tiers' ADC distance table, O(batch·M·K) rows) are
  *    SIZE-GATED against the session broadcast budget — an oversized
  *    batch degrades those joins to shuffles instead of failing at the
  *    driver broadcast limit. There is no hard batch ceiling; very
  *    large batches just lose the broadcast fast path.
  *
  * Beyond the PROBE methods above, the facade is the full index
  * LIFECYCLE (r17–r18): [[commitDocs]]/[[commitVectors]] (insert),
  * [[replaceDocs]]/[[replaceVectors]] (upsert), [[deleteDocs]]/
  * [[deleteVectors]] (tombstone), [[compact]] (fold), with
  * [[overlayReport]] and [[driftReport]] as the observability pair —
  * all over [[IndexOverlay]]'s manifest chain, all O(batch) except the
  * O(overlay) fold.
  *
  * Streaming twin: [[graft.streaming.Streams]] wires the same batch
  * cores into Structured Streaming micro-batches; verdicts are
  * batch-split-invariant (StreamingSpec), and the commit/replace sinks
  * compose at-least-once delivery to exactly-once index state.
  */
object Ingest {

  /** Exact-hash dedup verdicts: (doc_id, corpus_dup, batch_dup, keep).
    * Registered twin: q_dedup_incremental (its per-language report is
    * this frame aggregated). */
  def exactDedup(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.Curation.ingestExactDedup(s, d, batch)

  /** MinHash+LSH near-dup pairs (doc_a=batch, doc_b=corpus, jac ≥ 0.8),
    * exact-verified. Registered twin: q_dedup_minhash_delta. */
  def minhashDedup(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestMinhashDedup(s, d, batch)

  /** 1-row rebuild-lag report for a batch: how many batch-hot shingles
    * the persisted corpus hot-set artifact does not know yet (they are
    * capped batch-side regardless; the corpus index learns them at the
    * next rebuild). Registered twin: q_shingle_cap_lag. */
  def minhashCapLag(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestShingleCapLag(s, d, batch)

  /** ExactSubstr-style duplicated-span stats for batch docs whose
    * token windows already occur corpus-side. Registered twin:
    * q_dedup_substring_delta. */
  def substringDedup(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestSubstringDedup(s, d, batch)

  /** Semantic (embedding) dedup verdicts (vec_id, cell, dropped) vs the
    * frozen constant-cell quantizer. Registered twin:
    * q_dedup_semantic_delta. */
  def semanticDedup(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestSemanticDedup(s, d, batch)

  /** ANN top-3 corpus neighbors per batch vector — fixed-bucket LSH
    * multiprobe tier (dial tier; prefer [[annLshc]] at very large N).
    * Registered twin: q_sim_ann_lsh_delta. */
  def annLsh(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnLsh(s, d, batch)

  /** ANN top-3 — constant-occupancy LSH, the LSH-family 100 TB pick
    * (O(batch·tables·probes·c), N-independent dials). Registered twin:
    * q_sim_ann_lshc_delta. */
  def annLshc(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnLshc(s, d, batch)

  /** ANN top-3 — trained-k IVF tier (√N dials; prefer [[annIvfc]] at
    * very large N). Registered twin: q_sim_ann_ivf_k_delta. */
  def annIvfK(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnIvfK(s, d, batch)

  /** ANN top-3 — constant-cell IVF tier, the 100 TB scale pick
    * (O(batch·NP·c), N-independent dials). Registered twin:
    * q_sim_ann_ivfc_delta. */
  def annIvfc(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnIvfc(s, d, batch)

  /** ANN top-3 — trained-k IVF-PQ (memory-economy codes, √N dials).
    * Registered twin: q_sim_ann_ivfpq_delta. */
  def annIvfPq(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnIvfPq(s, d, batch)

  /** ANN top-3 — constant-cell IVF-PQ: PQ memory economy at linear-class
    * candidate volume, the production PQ tier at 100 TB. Registered
    * twin: q_sim_ann_ivfc_pq_delta. */
  def annIvfcPq(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestAnnIvfcPq(s, d, batch)

  /** COMMIT a document batch into the standing index: the batch's rows
    * whose ids are not currently VISIBLE are appended as
    * [[IndexOverlay]] segments, raw rows plus every doc index family
    * under FROZEN geometry, and every later ingest/probe call on `d`
    * sees them corpus-side without an O(N) rebuild. Re-committing any
    * batch is an idempotent no-op; a commit never changes a visible
    * row's content (that is [[replaceDocs]]); committing a DELETED id
    * re-inserts it — the new rows' manifest is later than the
    * tombstone's, so they win (sequence semantics, r18). EAGER — this
    * is an action with side effects, not a query builder. CRASH-ATOMIC:
    * the family segments become visible through one manifest publish,
    * so a crashed partial commit is invisible and a replay re-commits
    * it in full. Returns the (family, segment, n_rows) report of what
    * landed on disk; empty when nothing was novel. Single committing
    * writer per dataset dir is the supported regime; concurrent commits
    * are additionally safe for DISJOINT-id batches (a lost publish race
    * retries, never silently drops rows) — batches sharing ids need
    * external coordination ([[IndexOverlay]] doc). */
  def commitDocs(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestCommitDocs(s, d, batch)

  /** COMMIT a vector batch into the standing index — [[commitDocs]]'s
    * contract over the vector families (raw embeddings, LSH buckets,
    * quantizer cells, PQ codes). */
  def commitVectors(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestCommitVectors(s, d, batch)

  /** REPLACE (upsert) documents: make the batch's rows THE standing
    * content for their ids, in one atomic manifest — ids with different
    * visible content swap to the batch's text (the old row, corpus-
    * stored or committed, is shadowed by a tombstone co-published with
    * the replacement segments; source parquet is never touched), unseen
    * ids insert, identical content is a no-op. Every doc index family
    * re-derives the changed ids under frozen geometry, so probes flip
    * from old content to new with no window of both or neither.
    * Idempotent (replaying a replace publishes nothing) — so an
    * at-least-once stream of upserts composes to exactly-once index
    * state ([[graft.streaming.Streams.replaceDocsSink]]). EAGER;
    * returns the commit report (the tombstone family's row counts the
    * landing ids — superseded AND inserted, so a raced insert
    * serializes last-writer-wins like an update). */
  def replaceDocs(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestReplaceDocs(s, d, batch)

  /** [[replaceDocs]] for vectors: changed embeddings re-index under
    * frozen geometry, unseen ids insert, identical embeddings no-op. */
  def replaceVectors(s: SparkSession, d: String, batch: DataFrame): DataFrame =
    operators.LlmPipeline.ingestReplaceVectors(s, d, batch)

  /** DELETE (tombstone) documents from the standing index: the
    * currently-visible ids among `ids` — stored corpus rows and
    * committed overlay rows alike — stop being corpus-side for every
    * later ingest/probe call, without touching the source data. The
    * tombstone shadows what came BEFORE it in the manifest chain, so a
    * later [[commitDocs]] of the same id re-inserts it (r18; deletes
    * are no longer permanent-until-compaction). Deleting an id with no
    * visible row is a no-op, which also makes re-running a delete
    * idempotent. [[compact]] physically drops deleted overlay rows and
    * folds overlay-only tombstones away; corpus-stored ids keep one as
    * long as their base row must stay hidden. The one non-id-keyed
    * artifact, the hot-shingle cap, is NOT retracted (a cap is
    * conservative by nature). EAGER; takes a 1-column id frame (or any
    * frame carrying `doc_id` — anything else fails loudly); returns the
    * commit report shape. */
  def deleteDocs(s: SparkSession, d: String, ids: DataFrame): DataFrame =
    operators.LlmPipeline.ingestDeleteIds(s, d, ids, "doc_id",
      operators.LlmPipeline.famDocsDeleted,
      operators.LlmPipeline.visibleDocs(s, d).select("doc_id"))

  /** [[deleteDocs]] for vectors. */
  def deleteVectors(s: SparkSession, d: String, ids: DataFrame): DataFrame =
    operators.LlmPipeline.ingestDeleteIds(s, d, ids, "vec_id",
      operators.LlmPipeline.famVecsDeleted,
      operators.LlmPipeline.visibleVecs(s, d).select("vec_id"))

  /** COMPACT the overlay: fold every committed family's segments into
    * one holding exactly the VISIBLE rows (deleted rows and the
    * superseded copies behind a replace leave disk; overlay-only
    * tombstones fold away, corpus-stored ids keep one while their base
    * row must stay hidden), flip the
    * manifest chain atomically, and garbage-collect what the chain no
    * longer references (including crashed commits' orphan segments).
    * Probe results are INVARIANT across a compact (rows are moved,
    * never re-derived); what changes is cost — per-probe plan
    * construction and append attempts are O(segments), so compaction is
    * the dial that bounds them ([[overlayReport]]'s n_segments /
    * n_rows-vs-corpus_rows columns say when; DESIGN.md §0.-6 carries the
    * measured probe-vs-segment-count curve and budget). EAGER;
    * O(overlay + tombstones); EXCLUSIVE writer — or, on a shared store,
    * pass `retainMillis` > 0 to keep the superseded chain (manifests
    * AND their segments) readable for that grace window, so a plan
    * constructed against the pre-compact chain still executes after the
    * flip; the deferred debris is reclaimed by any later
    * compact/[[gc]]-bearing call once the window passes (r19 task 4).
    * Returns (family, n_segments_in, n_rows_in, segment, n_rows) per
    * effective family. */
  def compact(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestCompact(s, d)

  /** [[compact]] with a reader grace period: the superseded chain stays
    * on disk (invisible to new plans, scannable by in-flight ones) until
    * `retainMillis` after the flip. */
  def compact(s: SparkSession, d: String, retainMillis: Long): DataFrame =
    operators.LlmPipeline.ingestCompact(s, d, retainMillis)

  /** [[compact]] iff any family's effective segment count — PLUS its
    * true-orphan debris (published dirs no manifest lists: crashed
    * commits, lost publish races), which inflates append listings just
    * like live segments and is only reclaimed by a compact (VERDICT
    * r18) — exceeds `maxSegments`. The auto-coalesce convenience a
    * commit-driven pipeline calls after each batch; driver-side check
    * (chain + listings, no jobs); returns None when under budget. */
  def compactIfNeeded(s: SparkSession, d: String,
      maxSegments: Int): Option[DataFrame] =
    compactIfNeeded(s, d, maxSegments, retainMillis = 0L)

  /** [[compactIfNeeded]] with [[compact]]'s reader grace period — the
    * overload a SHARED-store pipeline calls after each batch (ADVICE
    * r19: the plain form gc'd just-retired chains with no window). */
  def compactIfNeeded(s: SparkSession, d: String, maxSegments: Int,
      retainMillis: Long): Option[DataFrame] = {
    val eff = IndexOverlay.effectiveEntries(d)
      .groupBy(_.family).map { case (f, es) => f -> es.size }
    val orphans = IndexOverlay.orphanSegments(d)
    val over = (eff.keySet ++ orphans.keySet).exists(f =>
      eff.getOrElse(f, 0) + orphans.getOrElse(f, 0) > maxSegments)
    if (over) Some(compact(s, d, retainMillis)) else None
  }

  /** Apply a document CHANGELOG — rows `(doc_id, text, op, ord)` with
    * `op ∈ {'upsert','delete'}` (text is ignored for deletes) and `ord`
    * the feed's per-row order (Kafka offset, file sequence, CDC LSN) —
    * reducing to each id's FINAL operation (max `ord`; ties break
    * deterministically) and applying upserts via [[replaceDocs]] and
    * deletes via [[deleteDocs]] in one pass. This is the RESYNC verb
    * that closes the replay-vs-delete ordering caveat on the plain
    * commit/replace sinks (VERDICT r18 task 5): a full from-scratch
    * replay through those re-inserts ids whose deletes predate the
    * replay (publish order decides, not event time), while a replay
    * through THIS verb re-issues each id's final delete — so replaying
    * any prefix-complete changelog converges to the state the changelog
    * describes, whether it arrives as one batch (the reduction picks
    * the final op) or split across micro-batches in feed order
    * ([[graft.streaming.Streams.applyDocsChangelogSink]]). Cross-batch
    * ordering remains the feed's responsibility, as with any CDC apply.
    * EAGER; idempotent (re-applying publishes nothing); returns the
    * commit-report rows of what landed. */
  def applyDocChangelog(s: SparkSession, d: String, changes: DataFrame): DataFrame =
    applyChangelog(s, d, changes, "doc_id", "text",
      replaceDocs, deleteDocs)

  /** [[applyDocChangelog]] for vector feeds —
    * `(vec_id, embedding, op, ord)`. */
  def applyVectorChangelog(s: SparkSession, d: String, changes: DataFrame): DataFrame =
    applyChangelog(s, d, changes, "vec_id", "embedding",
      replaceVectors, deleteVectors)

  private def applyChangelog(s: SparkSession, d: String, changes: DataFrame,
      idCol: String, payloadCol: String,
      rep: (SparkSession, String, DataFrame) => DataFrame,
      del: (SparkSession, String, DataFrame) => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, concat, hash, lit,
      raise_error, row_number, when}
    val need = Seq(idCol, payloadCol, "op", "ord")
    require(need.forall(changes.columns.contains),
      s"changelog needs columns (${need.mkString(", ")}); " +
        s"got (${changes.columns.mkString(", ")})")
    // final op per id: max ord wins; equal-ord ties break 'delete' first
    // then smallest payload hash, so a malformed feed still applies
    // deterministically
    val w = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
      .orderBy(col("ord").desc, col("op"), hash(col(payloadCol)))
    // the malformed-op gate rides the SAME materialization as the
    // reduction (a guard column evaluated by the checkpoint) instead of
    // a separate count() action per apply (VERDICT r19) — and a NULL op
    // reads as malformed too (ADVICE r19: `!isin` is NULL for null, so
    // a bare negation let a null-op row slip through and silently
    // cancel that id's real earlier operation)
    val guard = when(col("op").isNull || !col("op").isin("upsert", "delete"),
      raise_error(concat(lit("changelog op must be 'upsert' or 'delete'; got "),
        coalesce(col("op"), lit("NULL"))))).otherwise(lit(null))
    // pinned once: the replace and delete verbs below each run their own
    // corpus-side pass, and must not re-execute the reduction
    val last = changes.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
      .withColumn("_opck", guard).localCheckpoint().drop("_opck")
    rep(s, d, last.where(col("op") === "upsert").select(idCol, payloadCol))
      .union(del(s, d, last.where(col("op") === "delete").select(idCol)))
  }

  /** PROMOTE the standing state — base ∪ committed overlay − tombstones
    * — into a fresh corpus GENERATION ([[graft.CorpusGen]]), returning
    * the overlay to EMPTY: new base snapshots (`(doc_id, text)` /
    * `(vec_id, embedding)`; the user's source parquet is never touched)
    * plus new base artifacts per index family, flipped atomically (the
    * generation's watermark retires every overlay manifest in the same
    * publish — no window of doubled or missing rows; a crash before the
    * flip leaves only an invisible temp dir). FROZEN-GEOMETRY: rows are
    * moved, never re-derived, so every probe is INVARIANT across a
    * promotion — except ids a geometry re-dial had STRANDED (committed
    * under an old dial, silently absent from current-geometry probes),
    * which promotion HEALS by re-deriving them from the snapshot under
    * the current geometry. The retrain flavor is [[retrain]] (r20 —
    * promote + re-dial + re-derive + epoch flip, one verb). EXCLUSIVE
    * writer, like [[compact]] — and ENFORCED since r20: the watermark
    * is re-verified after the flip, a commit that raced the fold rolls
    * the suspect generation back and the fold retries under a watermark
    * that includes it (bounded retries, then loud) — rows can no longer
    * silently double. No-op when nothing was committed since the last
    * promotion. EAGER; INCREMENTAL since r20 (VERDICT r19 task 2):
    * generations are id-hash-BUCKETED ([[graft.CorpusGen]]), the fold
    * rewrites only the buckets the overlay touches and carries every
    * other bucket forward by reference — a 0.1% overlay no longer pays
    * a 100% corpus rewrite (cost ~ O(touched buckets + overlay), floor
    * corpus/nbuckets; CommitBench measures full-vs-one-doc folds).
    * After it, probes pay the plain one-branch base plan again: no
    * overlay union, no tombstone anti-join. */
  def promote(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestPromote(s, d)

  /** [[promote]] with a reader grace period for the retired overlay
    * chain and the superseded generation ([[compact]]'s contract). */
  def promote(s: SparkSession, d: String, retainMillis: Long): DataFrame =
    operators.LlmPipeline.ingestPromote(s, d, retainMillis)

  /** RETRAIN the vector geometry — the callable remedy every
    * [[geometryReport]] stale row prescribes (VERDICT r19 task 1):
    * [[promote]] the standing state into a fresh snapshot, re-derive the
    * data-bound dials from the STANDING count (constant-occupancy LSH
    * bits, ⌈√N⌉ trained-k cells, ⌈N/c⌉ semantic cells), retrain the
    * geometry (centroids, two-level quantizer, PQ codebooks) and every
    * corpus assignment artifact ON the merged snapshot, and flip the
    * store's geometry epoch atomically — probes then cover all standing
    * ids under the fresh dials, deleted ids are physically absent, and
    * later commits derive under the new geometry. NOT probe-invariant
    * (that is the point — re-measure recall, the RECALL.json protocol).
    * EXCLUSIVE writer; crash-before-flip leaves the old epoch fully
    * readable. EAGER; O(corpus) training cost (CommitBench measures it
    * beside promote). Returns the minted inventory (epoch, dials, one
    * row per artifact with footer-exact counts). */
  def retrain(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestRetrain(s, d)

  /** [[retrain]] with [[promote]]'s reader grace period for the folded
    * overlay chain. */
  def retrain(s: SparkSession, d: String, retainMillis: Long): DataFrame =
    operators.LlmPipeline.ingestRetrain(s, d, retainMillis)

  /** Promote-cadence observability (VERDICT r19 task 6): one row of the
    * dials the promote decision needs — standing overlay/corpus rows and
    * their ratio, the chain's manifest count, the last promote's
    * measured cost and an estimate for promoting now, and whether
    * `maxOverlayRatio` is exceeded. Zero Spark jobs on a warm store
    * (chain + generation metadata only). */
  def promoteReport(s: SparkSession, d: String,
      maxOverlayRatio: Double = 0.1): DataFrame =
    operators.LlmPipeline.ingestPromoteReport(s, d, maxOverlayRatio)

  /** [[promote]] iff the standing overlay has reached `maxOverlayRatio`
    * of the corpus row count — [[compactIfNeeded]]'s shape for the
    * rebuild-cost dial, so a commit-driven pipeline triggers the
    * O(corpus) fold from measured data instead of eyeballing two
    * reports. Driver-side check (chain + gen metadata, no jobs);
    * returns None while under the ratio. */
  def promoteIfNeeded(s: SparkSession, d: String, maxOverlayRatio: Double,
      retainMillis: Long = 0L): Option[DataFrame] = {
    import org.apache.spark.sql.Row
    val r: Row = promoteReport(s, d, maxOverlayRatio).head()
    if (r.getAs[Boolean]("promote_suggested"))
      Some(promote(s, d, retainMillis))
    else None
  }

  /** Overlay observability: one row per committed family on disk —
    * (family, live, n_segments, n_rows, n_orphan_segments, corpus_rows).
    * `live` = false marks a family STRANDED by a geometry re-dial (its
    * segments are correctly no longer read — this report is how that
    * stops being silent); `n_rows / corpus_rows` on the raw families
    * and `n_segments` anywhere are the two [[compact]] dials;
    * `n_orphan_segments` counts crashed commits' unmanifested debris
    * (invisible to reads, reclaimed by compact). EAGER like the commits,
    * but ZERO Spark jobs on a warm store: segment/row statistics come
    * from the manifest chain, corpus sizes from the current
    * generation's meta when promoted (else the persisted 1-row count
    * artifacts). */
  def overlayReport(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestOverlayReport(s, d)

  /** Lifecycle-aware drift: q_index_drift's frozen-centroid residual
    * over base ∪ COMMITTED − deleted vectors — the rebuild trigger that
    * actually sees the new-distribution data commits bring in (the
    * registered query is base-only by oracle-gate design). One row per
    * trained-k cell: (cell, n_members, drift, stale). */
  def driftReport(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestDriftReport(s, d)

  /** Geometry staleness across ALL three crowned vector tiers over the
    * standing member set (base ∪ committed − deleted): [[driftReport]]'s
    * per-cell trained-k residual, the frozen constant-occupancy LSH bit
    * dial's realized occupancy, and the semantic quantizer's cell-size
    * histogram — one row per (tier, key, n_members, metric, threshold,
    * stale). The rebuild/[[promote]]+re-dial trigger for each frozen
    * dial. */
  def geometryReport(s: SparkSession, d: String): DataFrame =
    operators.LlmPipeline.ingestGeometryReport(s, d)
}
