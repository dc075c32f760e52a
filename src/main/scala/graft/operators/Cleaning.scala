package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level cleaning / typing operators (SURVEY.md §2 groups B, C, D).
  *
  * Each op is a pure `DataFrame => DataFrame`, composable with `transform`.
  * Semantics mirror the reference's pandas cleaning chain
  * (`etl/etl.py:63-104`) exactly:
  *   - numeric coercion failure -> null (pandas `errors="coerce"`), via
  *     `try_cast` so behavior is identical whether ANSI mode is on or off
  *     (Spark 4 defaults `spark.sql.ansi.enabled=true`);
  *   - date parse day-first `dd-MM-yyyy`, failure -> null -> row dropped;
  *   - weekday numbered 1=Mon..7=Sun (pandas `dt.weekday+1`), which in
  *     Spark is `weekday()+1`, NOT `dayofweek` (1=Sun).
  *
  * All ops are narrow (no shuffle) and stay inside whole-stage codegen —
  * at 100 TB they fuse into the scan stage.
  */
object Cleaning {

  /** Coerce-to-null numeric cast (B4; `etl/etl.py:66,72-73,92-98`). */
  def tryCast(c: Column, to: String): Column = c.try_cast(to)

  /** Trim whitespace on string columns (B3; `etl/etl.py:64-65,83`). */
  def trimCols(cols: String*)(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, trim(col(c))))

  /** Rename reserved-word column (B2; `etl/etl.py:76-79` size -> size_). */
  def renameCol(from: String, to: String)(df: DataFrame): DataFrame =
    df.withColumnRenamed(from, to)

  /** Null fill with a constant (B6; `etl/etl.py:96` discount fillna(0)). */
  def fillNull(colName: String, value: Double)(df: DataFrame): DataFrame =
    df.na.fill(Map(colName -> value))

  /** Day-first date parse with coerce-to-null (B5; `etl/etl.py:87-88`).
    * `try_to_timestamp` + date cast == pandas `to_datetime(dayfirst=True,
    * errors="coerce")` for `dd-MM-yyyy` inputs.
    */
  def parseDateDayFirst(c: Column): Column =
    try_to_timestamp(c, lit("dd-MM-yyyy")).cast("date")

  /** Date normalize / truncate time (B7; `etl/etl.py:110,275,282`). */
  def normalizeDate(c: Column): Column = to_date(c)

  /** YYYYMMDD int date key (B9; `etl/etl.py:112`). */
  def dateKey(c: Column): Column = date_format(c, "yyyyMMdd").cast("int")

  /** Weekday 1=Mon..7=Sun (B8; `etl/etl.py:118`). */
  def weekdayMon1(c: Column): Column = weekday(c) + lit(1)

  /** Age-bucket CASE expression (H1; SQL Analysis docx Q4). */
  def ageBucket(age: Column): Column =
    when(age.between(18, 25), "18-25")
      .when(age.between(26, 35), "26-35")
      .when(age.between(36, 45), "36-45")
      .when(age.between(46, 60), "46-60")
      .otherwise("60+")

  // --------------------------------------------------------------------
  // Full per-table cleaning chains (`etl/etl.py:63-104`). Input: raw
  // string-typed CSV frames (Tables.*CsvSchema). Output: typed, filtered.
  // --------------------------------------------------------------------

  /** `clean_customers` (`etl/etl.py:63-68`): trim names, coerce age,
    * keep 18 <= age <= 100 (C1).
    */
  def cleanCustomers(df: DataFrame): DataFrame =
    df.transform(trimCols("first_name", "last_name"))
      .withColumn("customer_id", tryCast(col("customer_id"), "long"))
      .withColumn("age", tryCast(col("age"), "int"))
      .filter(col("age").between(18, 100))

  /** `clean_products` (`etl/etl.py:71-79`): coerce price/cost, keep
    * cost < price (C2), rename size -> size_ (B2).
    */
  def cleanProducts(df: DataFrame): DataFrame =
    df.withColumn("product_id", tryCast(col("product_id"), "long"))
      .withColumn("price", tryCast(col("price"), "double"))
      .withColumn("cost", tryCast(col("cost"), "double"))
      .filter(col("cost") < col("price"))
      .transform(renameCol("size", "size_"))

  /** `clean_stores` (`etl/etl.py:82-84`): trim store_name, coerce id. */
  def cleanStores(df: DataFrame): DataFrame =
    df.transform(trimCols("store_name"))
      .withColumn("store_id", tryCast(col("store_id"), "long"))

  /** `clean_sales` (`etl/etl.py:86-104`): parse dd-MM-yyyy dates with
    * coerce (B5), drop unparseable (C3), coerce numerics (B4), keep
    * quantity > 0 (C4), discount null -> 0 (B6).
    */
  def cleanSales(df: DataFrame): DataFrame =
    df.withColumn("sales_id", tryCast(col("sales_id"), "long"))
      .withColumn("customer_id", tryCast(col("customer_id"), "long"))
      .withColumn("product_id", tryCast(col("product_id"), "long"))
      .withColumn("store_id", tryCast(col("store_id"), "long"))
      .withColumn("sales_date", parseDateDayFirst(col("sales_date")))
      .na.drop(Seq("sales_date"))
      .withColumn("quantity", tryCast(col("quantity"), "int"))
      .filter(col("quantity") > 0)
      .withColumn("discount_pct", tryCast(col("discount_pct"), "double"))
      .transform(fillNull("discount_pct", 0.0))
      .withColumn("unit_price", tryCast(col("unit_price"), "double"))
      .withColumn("total_amount", tryCast(col("total_amount"), "double"))

  /** Derived money arithmetic (B10, B11; README.md:95-98,
    * `scripts/generate_data.py:245-250`): unit_price = price*(1-disc/100),
    * total = unit_price*qty, rounded to 2 (round half-up, matching
    * python's round-to-2 on Decimal-free floats closely enough for tests).
    */
  def withDerivedAmounts(df: DataFrame): DataFrame =
    df.withColumn("unit_price",
        round(col("price") * (lit(1) - col("discount_pct") / 100), 2))
      .withColumn("total_amount",
        round(col("unit_price") * col("quantity"), 2))
}
