package graft

/** Geometry EPOCHS — the state behind [[Ingest.retrain]] (VERDICT r19
  * task 1: the report-without-a-verb gap). The vector index families
  * derive under FROZEN geometry — hyperplane bit dials, trained-k
  * centroids, the two-level semantic quantizer, PQ codebooks — trained
  * once from the gen-0 corpus; commits keep deriving under those dials
  * while [[Ingest.geometryReport]] measures how far the standing corpus
  * has outgrown them. Before r20 the remedy was prose ("promote +
  * re-dial: new family/stage names derive from the promoted snapshot");
  * the RETRAIN verb makes it callable, and this object holds the one
  * piece of state it flips: the current geometry EPOCH.
  *
  *   `indexDir(d)/geom/g_NNNNN/meta.tsv`  — `epoch`, the standing
  *       counts the data-bound dials read (`emb_count` → lshc nbits,
  *       sem cell count, trained k), and the corpus generation the
  *       epoch trained on.
  *
  * Epoch 0 is the ABSENCE of any published epoch dir — the identity on
  * every existing store and on the driver's read-only testdata, so
  * registered plans never change (same stage keys, same training
  * input). At epoch E ≥ 1:
  *
  *  - every geometry-bearing VECTOR stage key and overlay family name
  *    carries a `__gE` suffix ([[key]]) — segments committed under old
  *    geometry strand (stop being read, visible in
  *    [[Ingest.overlayReport]]) exactly like any re-dial, and the next
  *    promote heals what the retrain's own fold did not cover;
  *  - the training input becomes the PROMOTED corpus snapshot
  *    (base ∪ committed − deleted at retrain time), not the user's
  *    source table — retrain-on-the-merged-corpus;
  *  - the data-bound dials read the epoch's recorded standing counts
  *    instead of the frozen gen-0 count artifact.
  *
  * Doc-side families are NOT epoched: their one data-bound artifact
  * (the hot-shingle df cap) already learns through overlay commits, and
  * none of their dials derive from N. The multi-table LSH family's
  * geometry is N-independent too (pure-function hyperplanes, fixed
  * table bits), so it keeps its name and its promoted artifacts.
  *
  * Crash contract (same one-flip rule as [[CorpusGen]]): the epoch dir
  * publishes atomically AFTER every next-epoch artifact is built, so a
  * crash mid-retrain leaves the store at the old epoch with some
  * already-built next-epoch artifacts — a re-run purges and rebuilds
  * them from the CURRENT snapshot (they may predate new commits) and
  * flips once. EXCLUSIVE writer, like promote/compact. */
object GeomEpoch {

  /** One published epoch: id, the standing counts its dials read, and
    * the corpus generation it trained on. */
  final case class Ep(epoch: Int, embCount: Long, docCount: Long, gen: Int)

  private def geomDir(d: String): String = s"${Tables.indexDir(d)}/geom"
  private val EpName = "g_(\\d+)".r

  /** Retrain-scope override: [[Ingest.retrain]] builds the NEXT epoch's
    * artifacts before the flip, so the builders must resolve stage keys
    * and dials against the pending epoch while the store still reads
    * the old one. Thread-local, like [[CorpusGen]]'s pin. */
  private val pending = new scala.util.DynamicVariable[Map[String, Ep]](Map.empty)

  private[graft] def withEpoch[T](d: String, ep: Ep)(body: => T): T =
    pending.withValue(pending.value + (d -> ep))(body)

  /** The current epoch, None (= epoch 0) on a never-retrained store —
    * one directory listing, the [[CorpusGen.current]] cost class. */
  def current(d: String): Option[Ep] =
    pending.value.get(d).orElse {
      sources.Store.list(geomDir(d)).flatMap { f =>
        f.name match {
          case EpName(id) if f.isDir &&
            sources.Store.exists(s"${f.path}/_SUCCESS") => Some((id.toInt, f))
          case _ => None
        }
      }.sortBy(_._1).lastOption.map { case (id, f) =>
        val kv = sources.Store.readUtf8(s"${f.path}/meta.tsv").getOrElse("")
          .split('\n').filter(_.nonEmpty).map(_.split('\t'))
          .collect { case Array(k, v) => k -> v }.toMap
        Ep(id, kv.getOrElse("emb_count", "0").toLong,
          kv.getOrElse("doc_count", "0").toLong,
          kv.getOrElse("gen", "0").toInt)
      }
    }

  def epoch(d: String): Int = current(d).map(_.epoch).getOrElse(0)

  /** Epoch-qualified stage/family key: identity at epoch 0 (so every
    * existing artifact path, overlay family and registered plan is
    * untouched), `name__gE` at epoch E — a retrain mints new names the
    * way any geometry re-dial does, stranding old-geometry segments. */
  private[graft] def key(d: String, name: String): String =
    current(d) match {
      case Some(ep) => s"${name}__g${ep.epoch}"
      case None => name
    }

  /** Remove a crashed retrain's partial artifacts for `epoch` (their
    * stage dirs carry the `__gE` suffix directly under the index dir) —
    * safe under the exclusive retrain writer: the epoch was never
    * published, so no reader ever resolved these names. Returns whether
    * anything was deleted (the caller then evicts session memos). */
  private[graft] def purgePartial(d: String, epoch: Int): Boolean = {
    val suffix = s"__g$epoch"
    val stale = sources.Store.list(Tables.indexDir(d)).filter(f =>
      f.name.endsWith(suffix) || f.name.contains(s"$suffix.tmp.") ||
        f.name == s"$suffix.lock" || f.name.endsWith(s"$suffix.lock"))
    stale.foreach(f => sources.Store.delete(f.path))
    stale.nonEmpty
  }

  /** Publish epoch `ep` atomically — the retrain's flip. */
  private[graft] def publish(d: String, ep: Ep): String = {
    val path = f"${geomDir(d)}/g_${ep.epoch}%05d"
    sources.Sinks.publishAtomic(path) { tmp =>
      sources.Store.mkdirs(tmp)
      sources.Store.writeUtf8(s"$tmp/meta.tsv",
        s"epoch\t${ep.epoch}\nemb_count\t${ep.embCount}\n" +
          s"doc_count\t${ep.docCount}\ngen\t${ep.gen}")
      sources.Store.touch(s"$tmp/_SUCCESS")
    }
    path
  }
}
