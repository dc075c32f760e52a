package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Registered correctness queries for the CSV cleaning chains
  * (SURVEY.md §2 B2-B6, C1-C4; `etl/etl.py:63-104`) over checked-in
  * dirty fixtures — the oracle re-states each pandas-style rule in
  * DuckDB's `read_csv` + `TRY_CAST`/`try_strptime` dialect, so the
  * whole extract->clean front half of the pipeline is hash-checked
  * cell-exact, not just unit-tested.
  *
  * The fixtures (the CSVs under src/test/resources/dirty) carry every dirt class
  * the reference's generator plants (`scripts/generate_data.py:150-180`):
  * junk numerics, empty fields, out-of-domain ages/quantities,
  * wrong-format and impossible dates (31-02, non-leap 29-02),
  * cost>=price rows, and untrimmed names.
  */
object CleanCsv {

  /** Absolute fixture path: the oracle SQL must read the identical bytes
    * from a DuckDB process whose cwd is not ours, so the canonical
    * checkout location is embedded — but the Spark side falls back to a
    * cwd-relative resolve so the library still runs from any checkout
    * (only the DuckDB oracle is location-pinned).
    */
  val FixtureDir: String = {
    val canonical = "/root/repo/src/test/resources/dirty"
    if (new java.io.File(canonical).isDirectory) canonical
    else new java.io.File("src/test/resources/dirty").getAbsolutePath
  }

  private def duckCsv(name: String): String =
    s"read_csv('$FixtureDir/$name.csv', header=true, all_varchar=true)"

  /** q36 — sales cleaning chain (B4 try_cast, B5 day-first date parse,
    * B6 discount fillna(0), C3 drop unparseable dates, C4 quantity>0).
    * sales_id is unique in the fixture -> total order.
    */
  def cleanSalesCsv(spark: SparkSession, dir: String): DataFrame =
    Cleaning.cleanSales(
      Tables.readCsv(spark, s"$FixtureDir/sales.csv", Tables.salesCsvSchema))
      .orderBy("sales_id")

  private val cleanSalesBody: String =
    s"""SELECT TRY_CAST(sales_id AS BIGINT) AS sales_id,
       |       TRY_CAST(customer_id AS BIGINT) AS customer_id,
       |       TRY_CAST(product_id AS BIGINT) AS product_id,
       |       TRY_CAST(store_id AS BIGINT) AS store_id,
       |       TRY_CAST(quantity AS INT) AS quantity,
       |       CAST(try_strptime(sales_date, '%d-%m-%Y') AS DATE) AS sales_date,
       |       COALESCE(TRY_CAST(discount_pct AS DOUBLE), 0.0) AS discount_pct,
       |       TRY_CAST(unit_price AS DOUBLE) AS unit_price,
       |       TRY_CAST(total_amount AS DOUBLE) AS total_amount
       |FROM ${duckCsv("sales")}
       |WHERE try_strptime(sales_date, '%d-%m-%Y') IS NOT NULL
       |  AND TRY_CAST(quantity AS INT) > 0""".stripMargin

  val cleanSalesCsvSql: String = cleanSalesBody + "\nORDER BY sales_id"

  /** q37 — products cleaning chain (B2 rename size->size_, B4 coercion,
    * C2 cost<price theta-filter).
    */
  def cleanProductsCsv(spark: SparkSession, dir: String): DataFrame =
    Cleaning.cleanProducts(
      Tables.readCsv(spark, s"$FixtureDir/products.csv",
        Tables.productsCsvSchema))
      .orderBy("product_id")

  private val cleanProductsBody: String =
    s"""SELECT TRY_CAST(product_id AS BIGINT) AS product_id,
       |       product_name, category, sub_category, brand,
       |       TRY_CAST(price AS DOUBLE) AS price,
       |       TRY_CAST(cost AS DOUBLE) AS cost,
       |       color, "size" AS size_
       |FROM ${duckCsv("products")}
       |WHERE TRY_CAST(cost AS DOUBLE) < TRY_CAST(price AS DOUBLE)""".stripMargin

  val cleanProductsCsvSql: String = cleanProductsBody + "\nORDER BY product_id"

  /** q38 — customers cleaning chain (B3 trim, B4 coercion, C1 age
    * domain filter 18..100 inclusive).
    */
  def cleanCustomersCsv(spark: SparkSession, dir: String): DataFrame =
    Cleaning.cleanCustomers(
      Tables.readCsv(spark, s"$FixtureDir/customers.csv",
        Tables.customersCsvSchema))
      .orderBy("customer_id")

  /** q40 — derived money arithmetic (B10 price*(1-disc/100)*qty, B11
    * round-to-2), reference README.md:95-98 /
    * `scripts/generate_data.py:245-250`: cleaned sales join cleaned
    * products on product_id, then [[Cleaning.withDerivedAmounts]].
    * Per-row double arithmetic and half-up rounding are IEEE-identical
    * across engines for non-tie values (the fixture has none).
    */
  def derivedAmountsCsv(spark: SparkSession, dir: String): DataFrame = {
    val sales = Cleaning.cleanSales(
      Tables.readCsv(spark, s"$FixtureDir/sales.csv", Tables.salesCsvSchema))
    val products = Cleaning.cleanProducts(
      Tables.readCsv(spark, s"$FixtureDir/products.csv",
        Tables.productsCsvSchema))
    Cleaning.withDerivedAmounts(
      sales.select("sales_id", "product_id", "quantity", "discount_pct")
        .join(products.select("product_id", "price"), Seq("product_id")))
      .select("sales_id", "product_id", "quantity", "discount_pct", "price",
        "unit_price", "total_amount")
      .orderBy("sales_id")
  }

  val derivedAmountsCsvSql: String =
    s"""WITH s AS ($cleanSalesBody),
       |     p AS ($cleanProductsBody)
       |SELECT s.sales_id, s.product_id, s.quantity, s.discount_pct, p.price,
       |  round(p.price * (1 - s.discount_pct / 100), 2) AS unit_price,
       |  round(round(p.price * (1 - s.discount_pct / 100), 2) * s.quantity, 2)
       |    AS total_amount
       |FROM s JOIN p ON s.product_id = p.product_id
       |ORDER BY sales_id""".stripMargin

  val cleanCustomersCsvSql: String =
    s"""SELECT TRY_CAST(customer_id AS BIGINT) AS customer_id,
       |       trim(first_name) AS first_name,
       |       trim(last_name) AS last_name,
       |       gender,
       |       TRY_CAST(age AS INT) AS age,
       |       city, state, membership_level
       |FROM ${duckCsv("customers")}
       |WHERE TRY_CAST(age AS INT) BETWEEN 18 AND 100
       |ORDER BY customer_id""".stripMargin
}
