package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Delta-segment OVERLAY store for the per-corpus index artifacts — the
  * write half of the ingest lifecycle ([[Ingest.commitDocs]] /
  * [[Ingest.commitVectors]]).
  *
  * The base artifacts ([[Tables.memoizedOnDisk]]) are built once from the
  * corpus and then frozen; every `Ingest` probe method computes its batch
  * side fresh at O(batch). The COMMIT step makes an accepted batch part
  * of the standing corpus without the O(N) rebuild: this store holds the
  * delta as parquet SEGMENTS beside the base artifact
  * (`indexDir(d)/overlay/<family>/seg_NNNNN`), the LSM-tree shape every
  * large index system uses — appends are O(batch), reads union
  * base + segments, and a periodic compaction (here: corpus
  * regeneration, which mints a fresh [[Tables.indexDir]] via the data
  * token and so starts from an empty overlay) folds segments back into
  * a fresh base.
  *
  * Scope and conventions:
  *  - Committed rows are derived under the FROZEN geometry (hyperplanes,
  *    quantizer centroids, PQ codebooks, the persisted-N lshc bit dial) —
  *    identical expressions to the per-batch probe plans, so a committed
  *    row is bit-for-bit what the corpus build would have produced for it
  *    had geometry not moved. Geometry drift across many commits is the
  *    documented trade; q_index_drift measures it and triggers rebuild.
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
  *  - Single writer per dataset dir (the same convention as the base
  *    artifact builds). A concurrent append is still SAFE: segment ids
  *    are max+1 over published segments and each writer verifies it WON
  *    the publish (a writer-unique token inside the published dir); a
  *    loser retries on a fresh id instead of silently reporting the
  *    winner's rows as its own (ADVICE r16).
  *  - NOT memoized anywhere: the overlay is the one MUTABLE part of the
  *    index store by design, so segment listings are re-stat'ed at every
  *    plan construction (a driver-side directory listing, ~µs; zero cost
  *    when the overlay dir does not exist).
  */
object IndexOverlay {

  private def famDir(d: String, family: String): String =
    s"${Tables.indexDir(d)}/overlay/$family"

  /** Family names with at least one directory on disk (published or
    * not) — the observability surface ([[Ingest.overlayReport]]): a
    * re-dialed base STRANDS old-geometry families (they stop being
    * read — correct, but silent), and this listing is how the report
    * makes them visible. */
  private[graft] def families(d: String): Seq[String] = {
    val dir = new java.io.File(s"${Tables.indexDir(d)}/overlay")
    Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  /** Published (marker-complete) segment paths of a family, in segment-id
    * order. Half-written segments (no _SUCCESS) are invisible, and so is
    * a concurrent writer's pre-publish temp sibling (`seg_N.tmp.<uuid>`)
    * — parquet puts _SUCCESS inside the temp BEFORE the atomic rename,
    * so a bare startsWith("seg_") filter would list (and read, and
    * id-parse) a directory that is not yet, and may never be, published
    * (caught by the concurrent-commit race test). */
  private val SegName = "seg_(\\d+)".r
  private[graft] def segments(d: String, family: String): Seq[String] = {
    val dir = new java.io.File(famDir(d, family))
    Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && SegName.pattern.matcher(f.getName).matches() &&
        new java.io.File(f, "_SUCCESS").exists)
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** All committed rows of a family, or None when nothing was ever
    * committed (the every-registered-query fast path). mergeSchema: a
    * family's segments are meant to share one schema ([[append]] rejects
    * drift), but segments written by an OLDER code version predate that
    * check — merging surfaces their full column set instead of silently
    * projecting every segment through whichever file seeded inference
    * (ADVICE r16). */
  private[graft] def read(s: SparkSession, d: String, family: String): Option[DataFrame] = {
    val segs = segments(d, family)
    if (segs.isEmpty) None
    else Some(s.read.option("mergeSchema", "true").parquet(segs: _*))
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

  /** Append one published segment of `rows` to a family; returns
    * (segment path, rows written — counted from the published parquet,
    * so the report states what is actually on disk).
    *
    * Naming + race contract (ADVICE r16): the target id is
    * max(published ids)+1 — robust to gaps (a compacted/removed
    * segment never causes a name reuse) — and the writer proves it WON
    * the publish by finding its unique token file inside the published
    * dir. Losing a race (or landing on a foreign pre-published name)
    * retries on a fresh id, so a commit's rows are never silently
    * dropped while its report claims success. */
  private[graft] def append(s: SparkSession, d: String, family: String,
      rows: DataFrame): (String, Long) = {
    // schema-drift gate: every segment of a family must carry the same
    // columns, or a later mergeSchema read would null the gaps silently
    segments(d, family).headOption.foreach { seg0 =>
      val have = s.read.parquet(seg0).columns.toSet
      val got = rows.columns.toSet
      require(got == have,
        s"overlay family '$family': append schema ${got.toSeq.sorted.mkString(",")} " +
          s"drifts from the family's segments (${have.toSeq.sorted.mkString(",")}) — " +
          "bump the family name (geometry key) instead of mixing schemas")
    }
    val token = s"_writer.${java.util.UUID.randomUUID()}"
    var attempts = 0
    while (attempts < 64) {
      val ids = segments(d, family)
        .map(p => new java.io.File(p).getName.stripPrefix("seg_").toInt)
      val path = f"${famDir(d, family)}/seg_${ids.foldLeft(-1)(math.max) + 1}%05d"
      sources.Sinks.publishAtomic(path) { tmp =>
        rows.write.parquet(tmp)
        // the claim rides INSIDE the atomic publish: token present in the
        // published dir ⟺ this writer's rows are the ones on disk
        // (underscore-prefixed, so parquet readers ignore it)
        java.nio.file.Files.createFile(java.nio.file.Paths.get(tmp, token))
      }
      if (new java.io.File(path, token).exists)
        return (path, s.read.parquet(path).count())
      attempts += 1 // lost the publish race — the next listing sees the winner
    }
    throw new IllegalStateException(
      s"overlay append to '$family' lost ${attempts} consecutive publish races")
  }
}
