package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators: multi-dimensional (Z-order / Morton) clustering
  * for scan pruning. No SNOWAV analog (upstream's store is a fixed grid;
  * SURVEY.md §0 [U] scheme) — this is the layout step a 100 TB store runs
  * at write time so that per-file column min/max statistics prune
  * multi-dimensional predicates (the OPTIMIZE-ZORDER pattern of modern
  * lakehouse tables, built here from first principles).
  *
  * Scale notes (100 TB):
  * - The Morton code is pure bit arithmetic on normalized dims — narrow,
  *   codegen'd, zero exchanges. Normalization bounds come from a 1-row
  *   min/max aggregate (forced broadcast — provably bounded).
  * - q_layout_zorder buckets by the TOP BITS of the z-value (equal-width
  *   in z space) — still narrow; the per-bucket envelope report is a
  *   32-group aggregate. The production write path is
  *   [[graft.sources.Sinks.writeZOrdered]]: repartitionByRange(z) +
  *   sortWithinPartitions(z), whose sampled range boundaries balance
  *   skewed z distributions; the equal-width buckets here are the
  *   deterministic stand-in the DuckDB oracle can mirror.
  * - The report carries both layouts (z-order vs single-key) over the
  *   same rows, so the pruning win is DATA, not prose: z buckets bound
  *   BOTH dims at ~2^-⌈bits/2⌉ of the domain each; single-key buckets
  *   bound one dim and span ~the full domain on the other.
  */
object Layout extends QueryPack {

  /** Grid resolution per dimension (16 bits) and bucket count (top 5
    * bits of the 32-bit z-value → 32 "files"). */
  private val GRID_BITS = 16
  private val N_BUCKET_BITS = 5

  /** Query box for the pruning report, in normalized grid coordinates:
    * one eighth of each dimension starting at the domain midpoint. */
  private val BOX_LO = 1 << (GRID_BITS - 1)                       // 32768
  private val BOX_HI = BOX_LO + (1 << (GRID_BITS - 3))            // +8192

  /** Spread the low 16 bits of `v` so bit i lands at position 2i — the
    * classic mask ladder; composing two gives the Morton interleave. */
  private def spread(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit grid coordinates (x gets the even
    * bits). */
  private[graft] def morton(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Normalize two dimensions of `df` onto the [0, 2^16) grid: bounds
    * from a 1-row broadcast min/max aggregate; the integer dim divides
    * by (range + 1) for a half-open cell, the double dim by a range
    * widened 1e-7 relatively (so max lands strictly inside the top
    * cell), floored at 1e-9 so a CONSTANT column grades to cell 0
    * instead of 0/0 = NaN → null. ONE owner for the grid contract —
    * the layout query, its oracle mirror, and the writeZOrdered sink
    * spec all ride this definition. */
  private[graft] def gridNormalized(df: DataFrame, id: String,
      xc: String, yc: String): DataFrame = {
    val bounds = df.agg(
      min(col(xc)).as("x_min"), max(col(xc)).as("x_max"),
      min(col(yc)).as("y_min"), max(col(yc)).as("y_max"))
    val side = lit((1L << GRID_BITS).toDouble)
    val xN = floor((col(xc) - col("x_min")).cast(DoubleType) * side /
      (col("x_max") - col("x_min") + 1).cast(DoubleType)).cast(LongType)
    val yN = floor((col(yc) - col("y_min")) * side /
      greatest((col("y_max") - col("y_min")) * 1.0000001, lit(1e-9))).cast(LongType)
    df.crossJoin(broadcast(bounds))
      .select(col(id), xN.as("xg"), yN.as("yg"))
  }

  /** Oracle-side mirror of [[spread]]/[[morton]] as SQL text. */
  private def spreadSql(v: String): String = {
    val s1 = s"((($v) | (($v) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }
  private def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  def queries: Seq[(String, Fn)] = Seq(

    // Z-order vs single-key layout, same rows, same bucket count: per-
    // bucket row counts and min/max ENVELOPES of both dims (exactly the
    // file-skipping statistics a parquet footer carries), plus whether
    // the fixed query box intersects the envelope — the bucket would be
    // READ. Sum(box_hit) over the two layouts is the pruning story.
    "q_layout_zorder" -> ((s, d) => {
      val graded = gridNormalized(t(s, d, "orders"),
          "o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("z", morton(col("xg"), col("yg")))
      val zBucket = shiftright(col("z"), 2 * GRID_BITS - N_BUCKET_BITS)
      val xBucket = shiftright(col("xg"), GRID_BITS - N_BUCKET_BITS)
      def envelope(df: DataFrame, layout: String, bucket: Column): DataFrame =
        df.groupBy(lit(layout).as("layout"), bucket.as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("xg")).as("min_x"), max(col("xg")).as("max_x"),
            min(col("yg")).as("min_y"), max(col("yg")).as("max_y"))
          .withColumn("box_hit",
            (col("min_x") < BOX_HI && col("max_x") >= BOX_LO &&
              col("min_y") < BOX_HI && col("max_y") >= BOX_LO).cast(IntegerType))
      envelope(graded, "zorder", zBucket)
        .unionAll(envelope(graded, "linear", xBucket))
        .orderBy("layout", "bucket")
    }),
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_layout_zorder" -> {
      val z = mortonSql("xg", "yg")
      s"""WITH bounds AS (
         |  SELECT min(o_custkey) AS x_min, max(o_custkey) AS x_max,
         |   min(o_totalprice) AS y_min, max(o_totalprice) AS y_max
         |  FROM orders),
         |graded AS (
         |  SELECT o_orderkey,
         |   CAST(floor(CAST(o_custkey - x_min AS DOUBLE) * 65536.0
         |     / CAST(x_max - x_min + 1 AS DOUBLE)) AS BIGINT) AS xg,
         |   CAST(floor((o_totalprice - y_min) * 65536.0
         |     / greatest((y_max - y_min) * 1.0000001, 1e-9)) AS BIGINT) AS yg
         |  FROM orders CROSS JOIN bounds),
         |z AS (SELECT *, $z AS zval FROM graded),
         |env AS (
         |  SELECT 'zorder' AS layout, zval >> ${2 * GRID_BITS - N_BUCKET_BITS} AS bucket,
         |   count(*) AS n_rows, min(xg) AS min_x, max(xg) AS max_x,
         |   min(yg) AS min_y, max(yg) AS max_y
         |  FROM z GROUP BY 2
         |  UNION ALL
         |  SELECT 'linear', xg >> ${GRID_BITS - N_BUCKET_BITS},
         |   count(*), min(xg), max(xg), min(yg), max(yg)
         |  FROM z GROUP BY 2)
         |SELECT layout, bucket, n_rows, min_x, max_x, min_y, max_y,
         | CAST(min_x < $BOX_HI AND max_x >= $BOX_LO
         |   AND min_y < $BOX_HI AND max_y >= $BOX_LO AS INT) AS box_hit
         |FROM env ORDER BY layout, bucket""".stripMargin
    },
  )
}
