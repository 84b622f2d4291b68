package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Gold-file smoke (SURVEY.md §6.4, mirroring upstream's single
  * end-to-end gold test): the flagship `entry` result must match the
  * committed snapshot exactly — any silent drift in the aggregate
  * pipeline (rounding, partial-agg order, filter semantics) fails here
  * before the driver gate sees it. */
class GoldSpec extends AnyFunSuite {

  test("entry matches committed gold rows") {
    val got = SparkEntry.entry(TestSpark.spark).collect().map { r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString(",")
    }
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/entry_gold.csv"), "UTF-8")
    val want = try src.getLines().filter(_.nonEmpty).toArray finally src.close()
    assert(got.length == want.length, s"${got.length} rows vs gold ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"\n got: $g\ngold: $w") }
  }
}
