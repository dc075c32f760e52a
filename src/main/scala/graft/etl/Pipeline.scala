package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Joins, ScalableKeys, Star}
import graft.sources.Tables

/** The reference's full ETL pipeline (`etl/etl.py` entry point 1,
  * SURVEY.md §3), re-expressed as one lazy Spark dataflow:
  *
  *   extract (CSV, declared schemas) -> clean/type (B/C ops) ->
  *   stage (CSV sinks, A2) -> dims with surrogate keys (D3) ->
  *   dim_date derive + idempotent upsert (I1) -> fact build via
  *   broadcast key-mapping joins (E1) -> parquet warehouse (A3/A4).
  *
  * The reference's driver->Oracle round trips (chunked INSERTs,
  * sequence-backfill MERGE, read-back key maps) disappear: keys are
  * assigned in-plan, the "read back the key map" step IS the broadcast
  * join, and per-job atomic parquet writes replace transactions (I3).
  *
  * Idempotency (I2): `run` skips the warehouse build when the target
  * exists (the `inspect(engine).has_table` guard, `etl/etl.py:229-234`),
  * except dim_date which takes the MERGE-upsert path on every run
  * (`etl/etl.py:179-224`).
  */
object Pipeline {

  case class Warehouse(dimCustomer: DataFrame, dimProduct: DataFrame,
    dimStore: DataFrame, dimDate: DataFrame, factSales: DataFrame)

  /** Extract + clean the 4 raw CSVs (dir layout from RetailDataGen). */
  def extractAndClean(spark: SparkSession, inputDir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = (
    Cleaning.cleanCustomers(
      Tables.readCsv(spark, s"$inputDir/customers", Tables.customersCsvSchema)),
    Cleaning.cleanProducts(
      Tables.readCsv(spark, s"$inputDir/products", Tables.productsCsvSchema)),
    Cleaning.cleanStores(
      Tables.readCsv(spark, s"$inputDir/stores", Tables.storesCsvSchema)),
    Cleaning.cleanSales(
      Tables.readCsv(spark, s"$inputDir/sales", Tables.salesCsvSchema)))

  /** Stage cleaned frames as CSVs for inspection (`etl/etl.py:127-137`). */
  def stage(stagingDir: String, customers: DataFrame, products: DataFrame,
      stores: DataFrame, sales: DataFrame): Unit = {
    Tables.writeCsv(customers, s"$stagingDir/stg_customer")
    Tables.writeCsv(products, s"$stagingDir/stg_product")
    Tables.writeCsv(stores, s"$stagingDir/stg_store")
    Tables.writeCsv(sales, s"$stagingDir/stg_sales")
  }

  /** Surrogate keys via [[ScalableKeys.withRankByKey]] — value-identical
    * to `row_number() OVER (ORDER BY naturalId)` but with no
    * single-partition window funnel (StarSpec proves the equivalence).
    */
  private def withKey(df: DataFrame, naturalId: String, key: String): DataFrame =
    ScalableKeys.withRankByKey(df, naturalId, key)

  /** Build the star in memory (lazy). */
  def buildWarehouse(customers: DataFrame, products: DataFrame,
      stores: DataFrame, sales: DataFrame): Warehouse = {
    val dimCustomer = withKey(customers, "customer_id", "customer_key")
    val dimProduct = withKey(products, "product_id", "product_key")
    val dimStore = withKey(stores, "store_id", "store_key")
    val dimDate = Star.dimDateFrom(sales, "sales_date")

    // E1: the reference pulls {natural_id -> key} maps to the client and
    // dict-maps them (etl/etl.py:263-282); here each map IS a broadcast
    // hash join — the fact never shuffles. The hints are size-gated
    // (Joins.broadcastIfSmall): a dim that outgrows the broadcast
    // threshold falls back to a shuffle join instead of a driver OOM.
    // The rank-keyed dims have RDD-severed lineage (no stats), so each
    // gate sizes on the cleaned source frame the dim was derived from.
    val fact = sales
      .join(Joins.broadcastIfSmall(
          dimCustomer.select("customer_id", "customer_key"), customers),
        Seq("customer_id"), "left")
      .join(Joins.broadcastIfSmall(
          dimProduct.select("product_id", "product_key"), products),
        Seq("product_id"), "left")
      .join(Joins.broadcastIfSmall(
          dimStore.select("store_id", "store_key"), stores),
        Seq("store_id"), "left")
      .join(Joins.broadcastIfSmall(
          dimDate.select("calendar_date", "date_key")),
        sales("sales_date") === col("calendar_date"), "left")
      .select("sales_id", "customer_key", "product_key", "store_key",
        "date_key", "quantity", "unit_price", "discount_pct", "total_amount")
    Warehouse(dimCustomer, dimProduct, dimStore, dimDate, fact)
  }

  /** Full run: extract -> clean -> stage -> build -> load parquet
    * warehouse. Re-runs are no-ops for existing tables (I2) except
    * dim_date, which merges new dates (I1).
    */
  def run(spark: SparkSession, inputDir: String, stagingDir: String,
      warehouseDir: String): Warehouse = {
    val (customers, products, stores, sales) = extractAndClean(spark, inputDir)
    stage(stagingDir, customers, products, stores, sales)
    val wh = buildWarehouse(customers, products, stores, sales)

    def loadIfAbsent(df: DataFrame, name: String): Unit = {
      val path = s"$warehouseDir/$name"
      if (!Catalog.pathExists(spark, path))
        Tables.overwriteParquet(df, path)
    }
    loadIfAbsent(wh.dimCustomer, "dim_customer")
    loadIfAbsent(wh.dimProduct, "dim_product")
    loadIfAbsent(wh.dimStore, "dim_store")
    loadIfAbsent(wh.factSales, "fact_sales")

    // dim_date: staged MERGE-upsert semantics on every run
    val datePath = s"$warehouseDir/dim_date"
    val merged =
      if (Catalog.pathExists(spark, datePath))
        Star.upsertByKey(spark.read.parquet(datePath), wh.dimDate, "date_key")
      else wh.dimDate
    // write via temp + swap: can't overwrite a path while reading it
    val tmp = s"$datePath._staged"
    Tables.overwriteParquet(merged, tmp)
    Tables.overwriteParquet(spark.read.parquet(tmp), datePath)
    Catalog.deletePath(spark, tmp)
    wh
  }
}
