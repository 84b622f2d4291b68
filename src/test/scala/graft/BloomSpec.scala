package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BloomExprs
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom runtime-prefilter contract: build/probe hash agreement (no
  * false negatives — the property that keeps q_decontaminate_bloom
  * EXACTLY equal to the unfiltered join), a sane false-positive rate, and
  * the plan shape (the probe rides the scan stage as a codegen'd filter
  * below the confirm join). */
class BloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def buildBloom(items: Seq[String], fpp: Double = 0.02): Array[Byte] = {
    val agg = new graft.functions.BloomBuild(items.size.toLong, fpp)
    items.toDF("s").as[String].select(agg.toColumn).toDF("bloom")
      .head().getAs[Array[Byte]]("bloom")
  }

  test("no false negatives: every inserted string probes true") {
    val items = (0 until 5000).map(i => s"shingle $i of the corpus")
    val bytes = buildBloom(items)
    val misses = items.toDF("s")
      .where(!BloomExprs.bloomMightContain(bytes, col("s"))).count()
    assert(misses == 0, s"$misses false negatives — build/probe hash mismatch")
  }

  test("false-positive rate on disjoint strings is near the configured fpp") {
    val bytes = buildBloom((0 until 5000).map(i => s"present $i"), fpp = 0.02)
    val fp = (0 until 5000).map(i => s"absent $i").toDF("s")
      .where(BloomExprs.bloomMightContain(bytes, col("s"))).count()
    assert(fp < 5000 * 0.05, s"fp rate ${fp / 5000.0} far above configured 0.02")
  }

  test("null input yields null, and the SQL registration matches the Column face") {
    val bytes = buildBloom(Seq("a", "b"))
    val viaCol = Seq(Some("a"), Some("zzz"), None).toDF("s")
      .select(BloomExprs.bloomMightContain(bytes, col("s")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(viaCol(0) == true && viaCol(2) == null)
    Seq(Some("a"), Some("zzz"), None).toDF("s")
      .createOrReplaceTempView("bloom_probe_fixture")
    val rows = spark.sql(
      "SELECT bloom_might_contain_str(X'" +
        bytes.map("%02x".format(_)).mkString + "', s) FROM bloom_probe_fixture")
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(rows.toSeq == viaCol.toSeq, "SQL function disagrees with the Column face")
  }

  test("q_decontaminate_bloom is row-identical to the exact join") {
    val exact = SparkEntry.queries("q_decontaminate")(spark, TestSpark.SF).collect()
    val bloom = SparkEntry.queries("q_decontaminate_bloom")(spark, TestSpark.SF).collect()
    assert(exact.toSeq == bloom.toSeq,
      "bloom prefilter + exact confirm must equal the unfiltered exact join")
  }

  test("the bloom probe sits below the confirm join in the physical plan") {
    val df = SparkEntry.queries("q_decontaminate_bloom")(spark, TestSpark.SF)
    df.collect()
    // final plan only — AQE appends an "== Initial Plan ==" section that
    // re-prints every operator
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val probeAt = p.indexOf("bloom_might_contain_str")
    assert(probeAt >= 0, s"bloom probe missing from the plan:\n$p")
    // EVERY join must appear above (before, in toString preorder) the
    // probe filter: the prefilter sits in the scan stage under the
    // confirm join, never hoisted above it
    val lastJoinAt = p.lastIndexOf("HashJoin")
    assert(lastJoinAt >= 0 && lastJoinAt < probeAt,
      s"probe does not sit below every join:\n$p")
  }
}
