package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Promoted-corpus GENERATIONS — the fold-back-to-base half of the
  * ingest lifecycle ([[Ingest.promote]], VERDICT r18 task 1).
  *
  * [[IndexOverlay]]'s manifest chain makes commits O(batch), and
  * [[Ingest.compact]] bounds SEGMENT COUNT — but overlay rows never
  * left the overlay: base artifacts are built from the source tables
  * only, so after enough streaming commits the overlay IS the corpus
  * and every probe pays the two-branch base∪overlay plan (plus the
  * tombstone anti-join) forever. A PROMOTION folds the standing state —
  * base ∪ visible overlay − tombstones — into a fresh base GENERATION:
  *
  *   `indexDir(d)/gens/gen_NNNNN/`
  *     `tables/documents`, `tables/embeddings`  — the promoted corpus
  *         snapshots (the standing `(doc_id, text)` / `(vec_id,
  *         embedding)` views; the USER's source parquet is never
  *         touched)
  *     `art/<family>`                            — the promoted index
  *         artifacts, keyed by the same geometry-encoding family names
  *         the overlay uses
  *     `meta.tsv`                                — `watermark` (the
  *         largest overlay manifest id folded in) plus per-table /
  *         per-family row counts (footer sums at publish)
  *
  * and the ingest path's corpus-side readers take the LATEST generation
  * as their base (falling back to the source tables / gen-0 artifacts
  * when none exists — the identity on never-promoted stores, so the
  * registered oracle-gate queries, which read the source tables
  * directly, are never affected).
  *
  * Crash atomicity is the same one-flip rule as the manifest chain: the
  * whole generation dir publishes through one atomic rename, and its
  * `watermark` retires every overlay manifest with id ≤ watermark at
  * that instant — [[IndexOverlay.effectiveEntriesSeq]] drops them from
  * the chain, so there is NO window where a reader sees promoted rows
  * twice (gen + overlay) or not at all. A crash before the flip leaves
  * an invisible temp dir; after it, the retired manifests and their
  * segments are plain garbage for [[IndexOverlay.gc]] (grace-period
  * aware, like compaction's). Commits issued AFTER the flip allocate
  * manifest ids above the watermark and stack on the new generation
  * exactly as they did on gen 0.
  *
  * Scope: generations hold the lifecycle's state, like the overlay —
  * driver-side listings + a tiny meta file to read, through the Hadoop
  * FileSystem layer ([[sources.Store]]). Geometry stays FROZEN across
  * promotions (hyperplanes, centroids, codebooks, the persisted-N lshc
  * bit dial keep reading the gen-0 artifacts): a promotion moves rows,
  * it does not retrain — [[Ingest.geometryReport]] says when frozen
  * geometry has drifted past usefulness, and the retrain path is a
  * re-dial (new family/stage names) whose artifacts then derive from
  * the PROMOTED snapshot, i.e. retrain-on-the-merged-corpus. */
object CorpusGen {

  /** One published generation: id, root path, the overlay-manifest
    * watermark it folded, publish mtime, and the row counts recorded at
    * publish (footer sums — `tables/<name>` and `art/<family>`). */
  final case class Gen(id: Int, path: String, watermark: Int, mtime: Long,
    tableRows: Map[String, Long], artRows: Map[String, Long])

  private def gensDir(d: String): String = s"${Tables.indexDir(d)}/gens"
  private val GenName = "gen_(\\d+)".r

  /** Construction-time SNAPSHOT pin (ADVICE r19): one standing-view plan
    * construction consults the current generation several times — the
    * base readers (corpusDocs / genArt) and the chain filter
    * ([[IndexOverlay.effectiveEntriesSeq]]'s watermark) — so a promote
    * flipping between two reads on a SHARED store could yield a
    * base-OLD/chain-NEW plan that reads the folded rows from neither
    * branch. [[pinned]] reads the gen once and serves that snapshot to
    * every [[current]]/[[watermark]] call in the dynamic scope (the
    * standing-view constructors in LlmPipeline open it). Thread-local
    * and reentrant (an outer pin wins), so concurrent sessions never
    * share a snapshot. Cross-view skew — two separately-pinned views in
    * one probe straddling a promote — is benign by promotion's
    * probe-invariance (both snapshots present the same standing rows). */
  private val pin =
    new scala.util.DynamicVariable[Map[String, Option[Gen]]](Map.empty)

  private[graft] def pinned[T](d: String)(body: => T): T =
    if (pin.value.contains(d)) body
    else pin.withValue(pin.value + (d -> listCurrent(d)))(body)

  /** The latest published generation, None on a never-promoted store
    * (the every-registered-query fast path: one directory listing) —
    * served from the [[pinned]] snapshot when one is open. */
  def current(d: String): Option[Gen] =
    pin.value.getOrElse(d, listCurrent(d))

  private def listCurrent(d: String): Option[Gen] =
    sources.Store.list(gensDir(d)).flatMap { f =>
      f.name match {
        case GenName(id) if f.isDir &&
          sources.Store.exists(s"${f.path}/_SUCCESS") =>
          Some((id.toInt, f))
        case _ => None
      }
    }.sortBy(_._1).lastOption.map { case (id, f) =>
      val meta = sources.Store.readUtf8(s"${f.path}/meta.tsv").getOrElse("")
        .split('\n').filter(_.nonEmpty).map(_.split('\t'))
      Gen(id, f.path,
        meta.collectFirst { case Array("watermark", w) => w.toInt }.getOrElse(-1),
        f.mtime,
        meta.collect { case Array("table", n, r) => n -> r.toLong }.toMap,
        meta.collect { case Array("art", n, r) => n -> r.toLong }.toMap)
    }

  /** The overlay-manifest watermark: manifests with id ≤ this are folded
    * into the current generation and MUST be ignored by chain readers
    * (and eventually GC'd). −1 on a never-promoted store. */
  def watermark(d: String): Int = current(d).map(_.watermark).getOrElse(-1)

  /** The promoted corpus snapshot for `table` ("documents" /
    * "embeddings"), when the current generation carries one. */
  def table(s: SparkSession, d: String, table: String): Option[DataFrame] =
    current(d).filter(_.tableRows.contains(table))
      .map(g => s.read.parquet(s"${g.path}/tables/$table"))

  /** The promoted artifact for `family`, when the current generation
    * carries it. Absent exactly when the family was minted AFTER the
    * promotion (a re-dial) — the caller falls back to the gen-0
    * artifact restricted to snapshot ids, and [[Ingest.overlayReport]]
    * surfaces the gap until the next promotion heals it. */
  def artifact(s: SparkSession, d: String, family: String): Option[DataFrame] =
    current(d).filter(_.artRows.contains(family))
      .map(g => s.read.parquet(s"${g.path}/art/$family"))

  /** Publish generation `id` atomically: `write` receives the temp root
    * and must lay out `tables/` and `art/`; meta (watermark + the row
    * counts it returns) and the completion marker are written before
    * the flip. Returns the published path. */
  private[graft] def publish(d: String, id: Int, watermark: Int)(
      write: String => (Seq[(String, Long)], Seq[(String, Long)])): String = {
    val path = f"${gensDir(d)}/gen_$id%05d"
    sources.Sinks.publishAtomic(path) { tmp =>
      val (tables, arts) = write(tmp)
      val lines = Seq(s"watermark\t$watermark") ++
        tables.map { case (n, r) => s"table\t$n\t$r" } ++
        arts.map { case (n, r) => s"art\t$n\t$r" }
      sources.Store.writeUtf8(s"$tmp/meta.tsv", lines.mkString("\n"))
      sources.Store.touch(s"$tmp/_SUCCESS")
    }
    path
  }

  /** Last promote's measured cost — (wall seconds, overlay rows folded,
    * corpus rows written), the inputs of [[graft.Ingest.promoteReport]]'s
    * cost model (VERDICT r19 task 6). Plain-overwrite observability, not
    * lifecycle state: a lost file only blanks the estimate columns. */
  private[graft] def writePromoteStats(d: String, sec: Double,
      overlayRows: Long, corpusRows: Long): Unit =
    sources.Store.writeUtf8(s"${gensDir(d)}/promote_stats.tsv",
      f"sec\t$sec%.3f%noverlay_rows\t$overlayRows%ncorpus_rows\t$corpusRows")

  private[graft] def readPromoteStats(d: String): Option[(Double, Long, Long)] =
    sources.Store.readUtf8(s"${gensDir(d)}/promote_stats.tsv").flatMap { text =>
      val kv = text.split('\n').filter(_.nonEmpty).map(_.split('\t'))
        .collect { case Array(k, v) => k -> v }.toMap
      for {
        sec <- kv.get("sec").map(_.toDouble)
        ov <- kv.get("overlay_rows").map(_.toLong)
        corp <- kv.get("corpus_rows").map(_.toLong)
      } yield (sec, ov, corp)
    }

  /** Drop superseded generations (all but the latest) whose supersede
    * flip is older than `retainMillis` — same grace-period contract as
    * [[IndexOverlay.gc]]. */
  private[graft] def gcGens(d: String, retainMillis: Long = 0L): Unit = {
    val now = System.currentTimeMillis()
    val gens = sources.Store.list(gensDir(d)).flatMap { f =>
      f.name match {
        case GenName(id) if f.isDir => Some((id.toInt, f))
        case _ => None
      }
    }.sortBy(_._1)
    if (gens.size > 1) {
      val newest = gens.last
      gens.dropRight(1).foreach { case (_, f) =>
        if (!(retainMillis > 0 && now - newest._2.mtime < retainMillis)) {
          sources.Store.delete(f.path)
          sources.Store.delete(s"${f.path}.lock")
        }
      }
    }
    // crashed promotions' temp dirs: gcGens runs right after a
    // successful publish under the exclusive promote writer, so any
    // `gen_N.tmp.<uuid>` present belongs to a dead writer
    sources.Store.list(gensDir(d)).foreach { f =>
      if (f.isDir && f.name.contains(".tmp.")) sources.Store.delete(f.path)
    }
  }
}
