package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.MinHashAgg
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass TypedImperativeAggregate must agree exactly with the
  * composable k-separate-min-aggregates form used by q_dedup_minhash. */
class MinHashAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("min_hash_sig == k separate min(md5) aggregates, under repartition") {
    val docs = Tables.t(spark, TestSpark.SF, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .repartition(16) // force partial buffers + merges across partitions
    val k = 8
    val typed = docs.groupBy("doc_id")
      .agg(MinHashAgg.minHashSig(col("tok"), k).as("sig"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("tok")))).as(s"s$i"))
    val composed = docs.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val joined = typed.join(composed, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val sig = r.getAs[scala.collection.Seq[String]]("sig")
      (0 until k).foreach { i =>
        assert(sig(i) == r.getAs[String](s"s$i"),
          s"doc ${r.getLong(0)} slot $i: ${sig(i)} != ${r.getAs[String](s"s$i")}")
      }
    }
  }

  test("buffer survives serialize/deserialize round-trip") {
    val agg = org.apache.spark.sql.graftx.MinHashAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = Array("aa", null, "cc", "dd")
    assert(agg.deserialize(agg.serialize(buf)).sameElements(buf))
  }
}
