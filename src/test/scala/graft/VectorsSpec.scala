package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the oracle can't fully pin down for the Vectors pack:
  * quantization error bounds, SQ-ANN recall vs exact knn, and the
  * map-side-heap plan shape of both top-k stages. */
class VectorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("int8 quantization: codes bounded, max dim saturates, MSE small") {
    val rows = q("q_emb_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l1 = r.getLong(r.fieldIndex("l1_q"))
      val nnz = r.getLong(r.fieldIndex("nnz"))
      val mse = r.getDouble(r.fieldIndex("mse_e6"))
      assert(l1 <= 64L * 127, s"vec ${r.get(0)}: l1_q $l1 exceeds 64*127")
      assert(l1 >= 127, s"vec ${r.get(0)}: some dim must saturate at ±127, l1=$l1")
      assert(nnz >= 1 && nnz <= 64, s"vec ${r.get(0)}: nnz $nnz out of range")
      // per-dim |err| <= maxabs/254; embeddings are unit-ish (maxabs < 1),
      // so MSE*1e6 < (1/254)^2*1e6 ≈ 15.5 — generous factor-10 headroom
      assert(mse >= 0 && mse <= 155.0, s"vec ${r.get(0)}: mse_e6 $mse too large")
    }
  }

  test("quantized codes round-trip: reconstructed cosine vs original >= 0.999") {
    // direct check that int8 reconstruction preserves direction — the
    // property the SQ-ANN coarse ranking relies on
    val e = Tables.t(spark, sf, "embeddings")
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("recon", transform(col("embedding"), x =>
        (round(x.cast("double") * 127.0 / col("maxabs"), 0) * col("maxabs") / 127.0)
          .cast("float")))
    val cos = org.apache.spark.sql.graftx.VectorExprs.cosineSim(
      col("embedding"), col("recon"))
    val minCos = e.select(min(cos)).head().getDouble(0)
    assert(minCos >= 0.999, s"reconstruction distorts direction: min cos $minCos")
  }

  test("SQ-ANN recall vs exact knn top-3 >= 0.9") {
    val exact = q("q_sim_knn").where(col("rnk") <= 3)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = q("q_sim_ann_sq")
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(sq).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ recall $recall < 0.9 (${sq.size} vs ${exact.size})")
  }

  test("int_dot native expression: == HOF form, SQL-callable, NULL on mismatch") {
    import spark.implicits._
    val qvecs = Tables.t(spark, sf, "embeddings")
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("qvec", transform(col("embedding"), x =>
        round(x.cast("double") * 127.0 / col("maxabs"), 0).cast("long")))
      .select("vec_id", "qvec").limit(50)
    val pairs = qvecs.as("a").crossJoin(qvecs.as("b"))
    val native = org.apache.spark.sql.graftx.VectorExprs.intDot(col("a.qvec"), col("b.qvec"))
    val hof = aggregate(zip_with(col("a.qvec"), col("b.qvec"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    assert(pairs.where(native =!= hof || native.isNull).count() == 0)
    // SQL registration via GraftExtensions
    val viaSql = spark.sql("SELECT int_dot(array(1L,2L,3L), array(4L,5L,6L))").head().getLong(0)
    assert(viaSql == 32L)
    // length mismatch must be NULL, never a wrong value
    assert(spark.sql("SELECT int_dot(array(1L), array(1L,2L))").head().isNullAt(0))
  }

  test("q_sim_ann_sq runs both top-k stages through map-side TopKPerKey heaps") {
    val df = q("q_sim_ann_sq")
    df.collect() // finalize AQE on THIS plan
    val p = df.queryExecution.executedPlan.toString
    assert("TopKPerKeyPartial".r.findAllIn(p).size >= 2, p)
    assert("TopKPerKeyFinal".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("WindowExec"), p)
  }
}
