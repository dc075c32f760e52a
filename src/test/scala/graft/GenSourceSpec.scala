package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataSourceV2 generator connector: partitioning-independent
  * determinism, pruning/limit pushdown, and datagen-parity domains.
  */
class GenSourceSpec extends SparkSpec {

  private def gen(table: String, rows: Long, opts: Map[String, String] =
      Map.empty): DataFrame =
    opts.foldLeft(spark.read.format("graft-gen")
        .option("table", table).option("rows", rows.toString)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  test("the same table materializes for 1 partition and 7 partitions") {
    val a = gen("sales", 1000, Map("numpartitions" -> "1"))
      .orderBy("sales_id").collect()
    val b = gen("sales", 1000, Map("numpartitions" -> "7"))
      .orderBy("sales_id").collect()
    assert(a.toSeq == b.toSeq,
      "generator output must not depend on partitioning")
    assert(a.length == 1000)
  }

  test("column pruning reaches the reader (scan description lists only requested columns)") {
    val df = gen("customers", 100).select("age", "membership_level")
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    val desc = scan.scan.description()
    assert(desc.contains("columns=[age,membership_level]"),
      s"pruning did not reach the scan: $desc")
    assert(scan.scan.readSchema().fieldNames.toSeq ==
      Seq("age", "membership_level"))
  }

  test("limit pushdown caps the generated range") {
    val df = gen("products", 1000000).limit(5)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    assert(scan.scan.description().contains("idRange=[1,5]"),
      s"limit not pushed: ${scan.scan.description()}")
    assert(df.count() == 5)
  }

  test("limit after a residual (non-id) filter does NOT cap the scan range") {
    // the 5 matching rows may sit anywhere in the id space: capping the
    // generated range at the limit would silently under-return rows, so
    // pushLimit must refuse when a residual filter remains
    val df = gen("products", 10000)
      .filter(col("price") > 100.0).limit(5)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    val desc = scan.scan.description()
    assert(!desc.contains("idRange=[1,5]"), s"limit capped the scan: $desc")
    assert(df.count() == 5)
    val got = df.collect().map(_.getAs[Double]("price"))
    assert(got.forall(_ > 100.0))
  }

  test("id-range filter pushdown trims generation instead of post-filtering") {
    val df = gen("sales", 1000000)
      .filter(col("sales_id") >= 100 && col("sales_id") <= 199)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    assert(scan.scan.description().contains("idRange=[100,199]"),
      s"filter not pushed: ${scan.scan.description()}")
    assert(df.count() == 100)
    // pushed rows are the SAME rows a post-filter would keep
    // (counter-based cells are a pure function of the id)
    val post = gen("sales", 1000)
      .filter(col("sales_id") >= 100 && col("sales_id") <= 199)
      .orderBy("sales_id").collect()
    assert(df.orderBy("sales_id").collect().toSeq === post.toSeq)
  }

  test("non-id filters stay post-scan and still evaluate correctly") {
    val df = gen("sales", 500).filter(col("quantity") === 3)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    assert(scan.scan.description().contains("idRange=[1,500]"),
      s"non-id filter must not trim the range: ${scan.scan.description()}")
    assert(df.collect().forall(_.getAs[Int]("quantity") == 3))
    assert(df.count() > 0)
  }

  test("domains match the datagen contract (ids, age, FK ranges, weighted tiers)") {
    val cust = gen("customers", 2000)
    assert(cust.count() == 2000)
    val ages = cust.agg(min("age"), max("age")).collect()(0)
    assert(ages.getInt(0) >= 18 && ages.getInt(1) <= 85)
    // Bronze is the 50%-weighted tier — it must dominate
    val tiers = cust.groupBy("membership_level").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiers("Bronze") > tiers.getOrElse("Platinum", 0L))

    val sales = gen("sales", 5000,
      Map("ncustomers" -> "100", "nproducts" -> "50", "nstores" -> "10"))
    val fks = sales.agg(max("customer_id"), max("product_id"),
      max("store_id"), min("quantity"), max("quantity")).collect()(0)
    assert(fks.getLong(0) <= 100 && fks.getLong(1) <= 50 && fks.getLong(2) <= 10)
    assert(fks.getInt(3) >= 1 && fks.getInt(4) <= 5)
    // dd-MM-yyyy render, parseable back within the 2-year window
    val dates = sales.select(to_date(col("sales_date"), "dd-MM-yyyy").as("d"))
    assert(dates.filter(col("d").isNull).count() == 0)
  }

  test("the short name resolves through the service registry") {
    // loading by short name already proves registration; double-check the
    // provider class is what the registry resolved
    val df = spark.read.format("graft-gen")
      .option("table", "stores").option("rows", "10").load()
    assert(df.count() == 10)
    assert(df.schema.fieldNames.contains("region"))
  }
}
