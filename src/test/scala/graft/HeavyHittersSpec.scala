package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.HeavyHittersAgg
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitters sketch: the bounds no oracle can hash-check.
  * With k counters over N items: estimates never exceed truth, sit within
  * N/(k+1) of it, and every item more frequent than N/(k+1) is present —
  * and all three survive partial/merge across partitions. */
class HeavyHittersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF

  private def toks = Tables.t(spark, sf, "documents")
    .select(explode(split(col("text"), " ")).as("tok"))

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(HeavyHittersAgg.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MG bounds hold, single partition and across an 8-partition merge") {
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 64
    val bound = n / (k + 1) + 1
    for (parts <- Seq(1, 8)) {
      val hh = sketch(toks.repartition(parts), k)
      assert(hh.nonEmpty && hh.size <= k)
      hh.foreach { case (item, est) =>
        val truth = exact.getOrElse(item, 0L)
        assert(est <= truth, s"$item overestimated: $est > $truth")
        assert(est >= truth - bound, s"$item too low: $est < $truth - $bound")
      }
      // guaranteed capture of everything above the frequency threshold
      exact.filter(_._2 > bound).keys.foreach { item =>
        assert(hh.contains(item), s"frequent item $item missing (parts=$parts)")
      }
    }
  }

  test("q_text_heavyhitters top entries agree with the exact top tokens") {
    val exactTop = SparkEntry.queries("q_text_stats")(spark, sf)
      .limit(5).collect().map(_.getString(0)).toSet
    val hhTop = SparkEntry.queries("q_text_heavyhitters")(spark, sf)
      .limit(5).collect().map(_.getString(0)).toSet
    // the very top of the distribution is far above the MG error bound, so
    // the sketch must agree there
    assert((exactTop intersect hhTop).size >= 4, s"$exactTop vs $hhTop")
  }
}
