package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query invariants for the curation additions the oracle can't see:
  * canonical selection consistency with the cluster/quality queries, and
  * split determinism/totals. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_dedup_canonical picks the max-quality member of each cluster") {
    val clusters = q("q_dedup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_id)
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = q("q_text_quality").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val canon = q("q_dedup_canonical").collect()
    assert(canon.map(_.getLong(0)).toSet == byCluster.keySet, "one row per cluster")
    canon.foreach { r =>
      val (cid, doc, qual, n) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val members = byCluster(cid)
      assert(members.contains(doc), s"canonical $doc not in cluster $cid")
      assert(n == members.size)
      val best = members.map(quality).max
      assert(qual == best, s"cluster $cid: picked $qual, best member has $best")
      // deterministic tie-break: among max-quality members, min doc_id
      assert(doc == members.filter(m => quality(m) == best).min)
    }
  }

  test("q_dedup_canonical rank-1 filter is rewritten to the TopKPerKey plan") {
    val df = q("q_dedup_canonical")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyFinal"), p)
  }

  test("q_split_train partitions every doc exactly once, deterministically") {
    val total = Tables.t(spark, sf, "documents").count()
    val rows = q("q_split_train").collect()
    assert(rows.map(_.getLong(2)).sum == total, "splits must cover all docs")
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // determinism: a second independent evaluation is byte-identical
    val again = q("q_split_train").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the hash split should land near 90/5/5 at corpus scale (loose at sf0.001)
    val frac = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum.toDouble / total
    assert(frac > 0.75 && frac < 1.0, s"train fraction $frac")
  }
}
