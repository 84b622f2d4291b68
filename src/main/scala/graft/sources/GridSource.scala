package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2: a synthetic raster grid — the analog of the reference's
  * gridded-raster ingest ([U] SURVEY.md §3A daily NetCDF scan; /root/
  * reference was empty at survey time, §0). The cell value is the pure
  * integer function `v = (x*31 + y*17) % 97`, so results are reproducible
  * on any engine (the DuckDB oracle regenerates the same grid with
  * `generate_series`) and the connector surface itself — schema inference,
  * partition planning, filter pushdown with stripe pruning, column
  * pruning — is what's really under test.
  *
  * Scale design: the grid splits into `stripes` row-stripes, each an
  * independent [[InputPartition]] (the executor-side unit). Pushed `y`
  * bounds prune whole stripes at PLANNING time — the DSv2 equivalent of
  * partition pruning, which on a real raster store means never opening the
  * pruned files; pushed `x`/`y` predicates are then applied row-level
  * inside the reader. `spark.read.format("graft-grid")` resolves through
  * META-INF/services (DataSourceRegister).
  *
  * Usage: `spark.read.format("graft-grid")
  *   .option("width", 64).option("height", 64).option("stripes", 8).load()`
  */
class GridSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-grid"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GridSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GridTable(new CaseInsensitiveStringMap(properties))
}

object GridSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("v", IntegerType, nullable = false)))

  /** The deterministic cell value — mirrored by the oracle SQL. */
  def cellValue(x: Int, y: Int): Int = (x * 31 + y * 17) % 97
}

private[sources] class GridTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val width = options.getInt("width", 64)
  private val height = options.getInt("height", 64)
  private val stripes = options.getInt("stripes", 8)
  override def name(): String = s"graft_grid(${width}x$height)"
  override def schema(): StructType = GridSource.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(width, height, stripes)
}

private[sources] class GridScanBuilder(width: Int, height: Int, stripes: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GridSource.SCHEMA
  private var limit: Int = Int.MaxValue
  private var hadResidual = false
  private var countPushed = false

  // LIMIT n with no intervening filter reaches the source: each reader
  // stops generating after n rows (Spark still applies the global limit)
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  // COMPLETE aggregate pushdown for ungrouped COUNT(*): the grid's row
  // count under rectangular x/y bounds is pure arithmetic over the pushed
  // filters — the scan answers from metadata without generating a single
  // cell (the DSv2 analog of a parquet footer rowcount answer). Only legal
  // when every filter was pushed (a residual filter must see real rows).
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar] && !hadResidual
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    countPushed = true
    required = StructType(Seq(StructField("count_star", LongType, nullable = false)))
    true
  }

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: Integer) => a == "x" || a == "y"
    case GreaterThan(a, _: Integer) => a == "x" || a == "y"
    case GreaterThanOrEqual(a, _: Integer) => a == "x" || a == "y"
    case LessThan(a, _: Integer) => a == "x" || a == "y"
    case LessThanOrEqual(a, _: Integer) => a == "x" || a == "y"
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    val residual = filters.filterNot(supported)
    hadResidual = residual.nonEmpty
    residual // Spark evaluates these post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!countPushed) required = requiredSchema
  override def build(): Scan =
    GridScan(width, height, stripes, pushed, required, limit, countPushed)
}

private[sources] case class GridScan(width: Int, height: Int, stripes: Int,
    pushed: Array[Filter], required: StructType, limit: Int,
    countPushed: Boolean = false) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // planner-visible statistics AFTER pushdown: Catalyst's join planning
  // (broadcast-side selection, AQE initial sizing) sees the filtered row
  // count instead of a table-size guess — for a connector this exact, the
  // estimate is exact
  override def estimateStatistics(): Statistics = new Statistics {
    // a pushed COUNT(*) scan emits exactly ONE pre-aggregated row, not
    // metadataCount rows — report what the scan actually produces
    private val rows =
      if (countPushed) 1L
      else math.min(metadataCount, if (limit == Int.MaxValue) Long.MaxValue else limit.toLong)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * (required.length.max(1) * 4L))
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }
  // surfaced in explain output (BatchScan prints the scan description) so
  // pushdown is plan-visible, like a parquet scan's PushedFilters
  override def description(): String =
    s"graft-grid ${width}x$height PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}" +
      (if (limit != Int.MaxValue) s", PushedLimit: $limit" else "") +
      (if (countPushed) ", PushedAggregate: COUNT(*)" else "")

  /** Bounds of `col` under the pushed filters (inclusive). */
  private def bounds(col: String, max: Int): (Int, Int) = {
    var lo = 0
    var hi = max - 1
    pushed.foreach {
      case EqualTo(a, v: Integer) if a == col => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan(a, v: Integer) if a == col => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(a, v: Integer) if a == col => lo = math.max(lo, v)
      case LessThan(a, v: Integer) if a == col => hi = math.min(hi, v - 1)
      case LessThanOrEqual(a, v: Integer) if a == col => hi = math.min(hi, v)
      case _ => ()
    }
    (lo, hi)
  }
  private def yBounds: (Int, Int) = bounds("y", height)

  /** Closed-form COUNT(*) under the pushed rectangular bounds. */
  private[sources] def metadataCount: Long = {
    val (xLo, xHi) = bounds("x", width)
    val (yLo, yHi) = yBounds
    math.max(0, xHi - xLo + 1).toLong * math.max(0, yHi - yLo + 1).toLong
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (countPushed)
      return Array(GridCountPartition(metadataCount))
    val (yLo, yHi) = yBounds
    val stripeH = math.max(1, math.ceil(height.toDouble / stripes).toInt)
    (0 until height by stripeH)
      .map(y0 => (y0, math.min(y0 + stripeH, height)))
      // stripe pruning: a stripe disjoint from the pushed y-range is never
      // planned — its reader would emit nothing, so don't schedule it
      .filter { case (y0, y1) => y1 > yLo && y0 <= yHi }
      .map { case (y0, y1) => GridInputPartition(y0, y1): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GridReaderFactory(width, pushed, required, limit)
}

/** Single-partition carrier of the metadata-computed count. */
private[sources] case class GridCountPartition(count: Long) extends InputPartition

private[sources] case class GridInputPartition(y0: Int, y1: Int) extends InputPartition

private[sources] case class GridReaderFactory(width: Int, pushed: Array[Filter],
    required: StructType, limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case GridCountPartition(count) =>
      // pushed COUNT(*): one row, no cell generation at all
      new PartitionReader[InternalRow] {
        private var done = false
        private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        row.setLong(0, count)
        override def next(): Boolean = { val r = !done; done = true; r }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    case p: GridInputPartition => createCellReader(p)
  }

  private def createCellReader(p: GridInputPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private var x = -1
      private var y = p.y0
      private var emitted = 0
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        required.length)
      // required-column projection indices resolved once per reader
      private val cols = required.fieldNames

      private def keep(cx: Int, cy: Int): Boolean = pushed.forall {
        case EqualTo(a, v: Integer) => pick(a, cx, cy) == v.intValue()
        case GreaterThan(a, v: Integer) => pick(a, cx, cy) > v.intValue()
        case GreaterThanOrEqual(a, v: Integer) => pick(a, cx, cy) >= v.intValue()
        case LessThan(a, v: Integer) => pick(a, cx, cy) < v.intValue()
        case LessThanOrEqual(a, v: Integer) => pick(a, cx, cy) <= v.intValue()
        case _ => true
      }
      private def pick(a: String, cx: Int, cy: Int): Int = if (a == "x") cx else cy

      override def next(): Boolean = {
        if (emitted >= limit) return false // per-reader limit pushdown
        while (true) {
          x += 1
          if (x >= width) { x = 0; y += 1 }
          if (y >= p.y1) return false
          if (keep(x, y)) {
            emitted += 1
            var i = 0
            while (i < cols.length) {
              row.setInt(i, cols(i) match {
                case "x" => x
                case "y" => y
                case "v" => GridSource.cellValue(x, y)
              })
              i += 1
            }
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
