package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the seeded retail generator — the
  * reference's `scripts/generate_data.py` re-expressed as a first-class
  * Spark table (`spark.read.format("graft-gen").option("table",
  * "sales").option("rows", 250000).load()`).
  *
  * Architecture notes (why DSv2 instead of the DataFrame generator in
  * [[graft.etl.RetailDataGen]]):
  *   - **Partitioning-independent determinism**: values derive from a
  *     counter-based SplitMix64 on (seed, row_id, column), not Spark's
  *     `rand()` (whose stream is seeded per-partition) — the SAME table
  *     materializes for 1 partition or 1000, so a 100 TB generation job
  *     can be re-sharded freely and reproduce bit-identically.
  *   - **Planning integration**: rows split into `numPartitions` range
  *     [[InputPartition]]s (Spark schedules them like any scan);
  *     column pruning reaches the reader via
  *     [[SupportsPushDownRequiredColumns]] (unrequested columns are
  *     never generated); LIMIT pushes down via
  *     [[SupportsPushDownLimit]] and caps the generated range itself;
  *     range/equality predicates on the table's id column push down via
  *     [[SupportsPushDownFilters]] and trim the generated id range —
  *     the generator-source analog of parquet min/max pruning (a
  *     `WHERE sales_id BETWEEN a AND b` generates b-a+1 rows, not
  *     `rows`). Filters on any other column stay post-scan.
  *
  * Distributions mirror [[graft.etl.RetailDataGen]] (and through it the
  * reference generator's ranges/weights); values differ only in the
  * underlying PRNG stream.
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schemaFor(options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GenTable(properties.asScala.toMap)
}

object GenSource {
  val Tables: Set[String] = Set("customers", "products", "stores", "sales")

  def schemaFor(table: String): StructType = table match {
    case "customers" => StructType(Seq(
      StructField("customer_id", LongType, nullable = false),
      StructField("first_name", StringType, nullable = false),
      StructField("last_name", StringType, nullable = false),
      StructField("gender", StringType, nullable = false),
      StructField("age", IntegerType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("state", StringType, nullable = false),
      StructField("membership_level", StringType, nullable = false)))
    case "products" => StructType(Seq(
      StructField("product_id", LongType, nullable = false),
      StructField("product_name", StringType, nullable = false),
      StructField("category", StringType, nullable = false),
      StructField("sub_category", StringType, nullable = false),
      StructField("brand", StringType, nullable = false),
      StructField("price", DoubleType, nullable = false),
      StructField("cost", DoubleType, nullable = false),
      StructField("color", StringType, nullable = false),
      StructField("size", StringType, nullable = false)))
    case "stores" => StructType(Seq(
      StructField("store_id", LongType, nullable = false),
      StructField("store_name", StringType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("state", StringType, nullable = false),
      StructField("region", StringType, nullable = false),
      StructField("store_type", StringType, nullable = false)))
    case "sales" => StructType(Seq(
      StructField("sales_id", LongType, nullable = false),
      StructField("customer_id", LongType, nullable = false),
      StructField("product_id", LongType, nullable = false),
      StructField("store_id", LongType, nullable = false),
      StructField("quantity", IntegerType, nullable = false),
      StructField("sales_date", StringType, nullable = false),
      StructField("discount_pct", DoubleType, nullable = false),
      StructField("unit_price", DoubleType, nullable = false),
      StructField("total_amount", DoubleType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"graft-gen: unknown table '$other' (expected one of $Tables)")
  }

  /** SplitMix64 — the standard counter-mix; uniform(seed, row, tag) is a
    * pure function, so any partition can generate any row.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from (seed, rowId, column tag). */
  def uniform(seed: Long, rowId: Long, tag: Int): Double =
    (mix64(mix64(seed ^ (tag * 0x9e3779b97f4a7c15L)) ^ rowId) >>> 11) *
      1.1102230246251565e-16 // 2^-53
}

private[sources] class GenTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val tableName = props.getOrElse("table",
    throw new IllegalArgumentException("graft-gen: 'table' option required"))

  override def name(): String = s"graft-gen/$tableName"
  override def schema(): StructType = GenSource.schemaFor(tableName)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(tableName, props)
}

private[sources] class GenScanBuilder(table: String, props: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters {
  private var required: StructType = GenSource.schemaFor(table)
  private var limit: Option[Long] = None
  private var lo = 1L
  private var hi = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var residual = false

  // the id column IS the row counter, so range predicates on it map
  // exactly to trimming the generated range
  private val idCol = table match {
    case "customers" => "customer_id"
    case "products"  => "product_id"
    case "stores"    => "store_id"
    case _           => "sales_id"
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Spark pushes filters before the limit, so `residual` is known here.
  // Refusing the push when a residual (non-id) filter remains makes
  // limit-after-filter correctness a property of THIS source, not of
  // the current planner's limit-past-filter rule (which could change
  // in a Spark upgrade and silently under-return rows).
  override def pushLimit(n: Int): Boolean =
    if (residual) false else { limit = Some(n.toLong); true }

  private def bound(f: Filter): Option[Unit] = f match {
    case EqualTo(`idCol`, v: Number) =>
      lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue); Some(())
    case GreaterThan(`idCol`, v: Number) =>
      lo = math.max(lo, v.longValue + 1); Some(())
    case GreaterThanOrEqual(`idCol`, v: Number) =>
      lo = math.max(lo, v.longValue); Some(())
    case LessThan(`idCol`, v: Number) =>
      hi = math.min(hi, v.longValue - 1); Some(())
    case LessThanOrEqual(`idCol`, v: Number) =>
      hi = math.min(hi, v.longValue); Some(())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(f => bound(f).isDefined)
    pushed = sup
    residual = rest.nonEmpty
    rest // residual filters Spark must still evaluate
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val rows0 = props.getOrElse("rows", "1000").toLong
    val first = math.max(1L, lo)
    val lastByRange = math.min(rows0, hi)
    val last = limit.fold(lastByRange)(n =>
      math.min(lastByRange, first + n - 1))
    new GenScan(table, required,
      first, last,
      props.getOrElse("seed", "42").toLong,
      props.getOrElse("numpartitions", "8").toInt,
      props.getOrElse("ncustomers", "1000").toLong,
      props.getOrElse("nproducts", "1000").toLong,
      props.getOrElse("nstores", "100").toLong,
      props.getOrElse("anchor", "2025-09-12"))
  }
}

private[sources] case class GenRange(start: Long, end: Long)
    extends InputPartition

private[sources] class GenScan(table: String, required: StructType,
    first: Long, last: Long, seed: Long, numPartitions: Int,
    nCustomers: Long, nProducts: Long, nStores: Long, anchor: String)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenScan(table=$table, idRange=[$first,$last], seed=$seed, " +
      s"columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, last - first + 1)
    if (n == 0) return Array.empty
    val parts = math.max(1, numPartitions)
    val step = math.max(1L, (n + parts - 1) / parts)
    (first to last by step)
      .map(s => GenRange(s, math.min(s + step, last + 1))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory(table, required.fieldNames, seed, nCustomers,
      nProducts, nStores, anchor)
}

private[sources] case class GenReaderFactory(table: String,
    columns: Array[String], seed: Long, nCustomers: Long,
    nProducts: Long, nStores: Long, anchor: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[GenRange]
    new GenReader(table, columns, r.start, r.end, seed, nCustomers,
      nProducts, nStores, anchor)
  }
}

/** Generates rows [start, end) of the named table. Each cell is a pure
  * function of (seed, row id, column) — [[GenSource.uniform]] — so the
  * output is independent of how rows were sharded into partitions.
  */
private[sources] class GenReader(table: String, columns: Array[String],
    start: Long, end: Long, seed: Long, nCustomers: Long, nProducts: Long,
    nStores: Long, anchor: String) extends PartitionReader[InternalRow] {
  import GenSource.uniform
  import graft.etl.RetailDataGen.{Categories, Discounts, Regions, Sizes, StoreTypes, TierWeights, Tiers}

  private var id = start - 1
  private val anchorDate = java.time.LocalDate.parse(anchor)

  private def s(v: String): AnyRef = UTF8String.fromString(v)
  private def pick(options: Seq[String], u: Double): String =
    options((u * options.size).toInt)
  private def pickWeighted(options: Seq[String], weights: Seq[Double],
      u: Double): String = {
    val cum = weights.scanLeft(0.0)(_ + _).tail
    options.zip(cum).find { case (_, t) => u < t }
      .map(_._1).getOrElse(options.last)
  }
  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  /** One generator per (table, column); unrequested columns are never
    * evaluated (this is what the pruning pushdown buys).
    */
  private def cell(col: String): AnyRef = (table, col) match {
    case ("customers", "customer_id") => java.lang.Long.valueOf(id)
    case ("customers", "first_name") => s(s"First$id")
    case ("customers", "last_name") => s(s"Last$id")
    case ("customers", "gender") => s(pick(
      Seq("Male", "Female", "Non-binary", "Other"), uniform(seed, id, 1)))
    case ("customers", "age") =>
      java.lang.Integer.valueOf(18 + (uniform(seed, id, 2) * 68).toInt)
    case ("customers", "city") =>
      s("City" + (uniform(seed, id, 3) * 200).toInt)
    case ("customers", "state") =>
      s("State" + (uniform(seed, id, 4) * 30).toInt)
    case ("customers", "membership_level") =>
      s(pickWeighted(Tiers, TierWeights, uniform(seed, id, 5)))

    case ("products", "product_id") => java.lang.Long.valueOf(id)
    case ("products", "product_name") => s(s"Product $id")
    case ("products", "category") => s(category)
    case ("products", "sub_category") =>
      s(category + " Sub" + (uniform(seed, id, 12) * 5).toInt)
    case ("products", "brand") =>
      s("Brand" + (uniform(seed, id, 13) * 50).toInt)
    case ("products", "price") => java.lang.Double.valueOf(price)
    case ("products", "cost") => java.lang.Double.valueOf(
      round2(price * (0.4 + uniform(seed, id, 15) * 0.5)))
    case ("products", "color") => s(pick(
      Seq("Red", "Blue", "Green", "Black", "White"), uniform(seed, id, 16)))
    case ("products", "size") => s(pick(Sizes, uniform(seed, id, 17)))

    case ("stores", "store_id") => java.lang.Long.valueOf(id)
    case ("stores", "store_name") => s(s"Store $id")
    case ("stores", "city") => s("City" + (uniform(seed, id, 21) * 200).toInt)
    case ("stores", "state") => s("State" + (uniform(seed, id, 22) * 30).toInt)
    case ("stores", "region") => s(pick(Regions, uniform(seed, id, 23)))
    case ("stores", "store_type") =>
      s(pick(StoreTypes, uniform(seed, id, 24)))

    case ("sales", "sales_id") => java.lang.Long.valueOf(id)
    case ("sales", "customer_id") => java.lang.Long.valueOf(
      1L + (uniform(seed, id, 31) * nCustomers).toLong)
    case ("sales", "product_id") => java.lang.Long.valueOf(
      1L + (uniform(seed, id, 32) * nProducts).toLong)
    case ("sales", "store_id") => java.lang.Long.valueOf(
      1L + (uniform(seed, id, 33) * nStores).toLong)
    case ("sales", "quantity") =>
      java.lang.Integer.valueOf(1 + (uniform(seed, id, 34) * 5).toInt)
    case ("sales", "sales_date") => s(anchorDate
      .minusDays((uniform(seed, id, 35) * 730).toLong)
      .format(java.time.format.DateTimeFormatter.ofPattern("dd-MM-yyyy")))
    case ("sales", "discount_pct") => java.lang.Double.valueOf(
      Discounts((uniform(seed, id, 36) * Discounts.size).toInt).toDouble)
    case ("sales", "unit_price") => java.lang.Double.valueOf(unitPrice)
    case ("sales", "total_amount") => java.lang.Double.valueOf(
      round2(unitPrice * (1 + (uniform(seed, id, 34) * 5).toInt)))

    case other => throw new IllegalStateException(
      s"graft-gen: no generator for $other")
  }

  // shared sub-values (referenced by more than one column; recomputed
  // per access — cheap mixes, and keeps cell() pure)
  private def category: String = pick(Categories, uniform(seed, id, 11))
  private def price: Double = round2(
    (1.0 + uniform(seed, id, 14) * 9.0) * (category match {
      case "Electronics" => 5000.0
      case "Home & Kitchen" => 2000.0
      case "Automotive" => 3000.0
      case _ => 500.0
    }) / 10.0)
  private def unitPrice: Double =
    round2(100.0 + uniform(seed, id, 37) * 900.0)

  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow =
    InternalRow.fromSeq(columns.toSeq.map(cell))
  override def close(): Unit = ()
}
