package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Catalog, Pipeline, RetailDataGen, ValidationReport}
import graft.operators.{Salting, ScalableKeys}
import graft.sources.Tables

/** Golden end-to-end run of the retail ETL (SURVEY.md §5 "golden
  * pipeline test"): generate seeded CSVs -> full pipeline -> assert the
  * reference's own invariants (K1-K4) + KPI aggregates + idempotency.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Files.createTempDirectory("graft_e2e").toString
  private lazy val wh = {
    RetailDataGen.writeAll(spark, s"$base/raw", baseRows = 500)
    Pipeline.run(spark, s"$base/raw", s"$base/staging", s"$base/warehouse")
  }

  test("pipeline loads a complete star: counts, no orphan keys") {
    wh // force
    val fact = spark.read.parquet(s"$base/warehouse/fact_sales")
    assert(fact.count() === 2500) // baseRows*5, all rows survive cleaning
    assert(fact.filter($"customer_key".isNull || $"product_key".isNull ||
      $"store_key".isNull || $"date_key".isNull).count() === 0)
    val dimC = spark.read.parquet(s"$base/warehouse/dim_customer")
    assert(dimC.count() === dimC.select("customer_key").distinct().count())
  }

  test("staged CSVs are written and re-readable (A2 roundtrip)") {
    wh
    val staged = Tables.readCsv(spark, s"$base/staging/stg_customer",
      Tables.customersCsvSchema)
    assert(staged.count() > 0)
  }

  test("dim_date: one row per distinct sale date, 2-year window (<=731)") {
    wh
    val dd = spark.read.parquet(s"$base/warehouse/dim_date")
    assert(dd.count() === dd.select("date_key").distinct().count())
    assert(dd.count() <= 731)
    assert(dd.filter($"weekday" < 1 || $"weekday" > 7).count() === 0)
  }

  test("re-run is idempotent: same warehouse counts (I1/I2)") {
    wh
    val before = spark.read.parquet(s"$base/warehouse/fact_sales").count()
    val ddBefore = spark.read.parquet(s"$base/warehouse/dim_date").count()
    Pipeline.run(spark, s"$base/raw", s"$base/staging", s"$base/warehouse")
    assert(spark.read.parquet(s"$base/warehouse/fact_sales").count() === before)
    assert(spark.read.parquet(s"$base/warehouse/dim_date").count() === ddBefore)
  }

  test("validation report: 0 nulls in cleaned frames, 0 bad FKs (K1-K3)") {
    val (c, p, s, sl) = Pipeline.extractAndClean(spark, s"$base/raw")
    val r = ValidationReport.validate(c, p, s, sl)
    assert(r.rowCounts("sales") === 2500)
    assert(r.badFkRows === 0)
    assert(r.nullCells.values.sum === 0)
    ValidationReport.writeReport(r, s"$base/validation_report.txt")
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/validation_report.txt")))
      .contains("sales_rows_with_bad_fk: 0"))
  }

  test("KPI aggregates over the warehouse match direct computation (F5-F7)") {
    wh
    val fact = spark.read.parquet(s"$base/warehouse/fact_sales")
    val direct = Pipeline.extractAndClean(spark, s"$base/raw")._4
    val kpiFact = fact.agg(
      sum($"total_amount".cast("decimal(18,2)")).as("rev"),
      countDistinct($"customer_key").as("nc")).head()
    val kpiDirect = direct.agg(
      sum($"total_amount".cast("decimal(18,2)")).as("rev"),
      countDistinct($"customer_id").as("nc")).head()
    assert(kpiFact.getDecimal(0) === kpiDirect.getDecimal(0))
    assert(kpiFact.getLong(1) === kpiDirect.getLong(1))
  }

  test("catalog ops: create-if-absent, exists guard, drop, script runner") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Catalog.dropTable(spark, "graft_cat_test")
    // a dropped managed table can leave its location behind if a prior
    // run died mid-create; clear it so create-if-absent is exercisable
    Catalog.deletePath(spark,
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_cat_test")
    assert(!Catalog.tableExists(spark, "graft_cat_test"))
    Catalog.createTableIfAbsent(spark, "graft_cat_test", df)
    assert(Catalog.tableExists(spark, "graft_cat_test"))
    Catalog.createTableIfAbsent(spark, "graft_cat_test", df.limit(1)) // no-op
    assert(spark.table("graft_cat_test").count() === 2)
    val results = Catalog.runScript(spark,
      """-- comment
        |SELECT COUNT(*) AS n FROM graft_cat_test;
        |SELECT 1 AS one;
        |""".stripMargin)
    assert(results.length === 2)
    assert(results.head.as[Long].head() === 2L)
    Catalog.dropTable(spark, "graft_cat_test")
  }

  test("runScript: ';' inside quoted literals/comments does not split (J6)") {
    assert(Catalog.splitStatements(
      "INSERT INTO t VALUES ('a;b');\n-- note; semicolon\nSELECT 'x''y;z';\nSELECT 1")
      .map(_.trim).filter(_.nonEmpty) === Seq(
        "INSERT INTO t VALUES ('a;b')",
        "-- note; semicolon\nSELECT 'x''y;z'",
        "SELECT 1"))
    // double-quoted strings (Spark's non-ANSI default dialect) too
    assert(Catalog.splitStatements("SELECT \"a;b\" AS s; SELECT \"x\"\"y;\"")
      .map(_.trim).filter(_.nonEmpty) === Seq(
        "SELECT \"a;b\" AS s", "SELECT \"x\"\"y;\""))
    Catalog.dropTable(spark, "graft_script_q")
    Catalog.deletePath(spark,
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_script_q")
    Catalog.runScript(spark,
      """CREATE TABLE graft_script_q (s STRING) USING parquet;
        |INSERT INTO graft_script_q VALUES ('a;b');
        |INSERT INTO graft_script_q VALUES ('c''d;e')""".stripMargin)
    assert(spark.table("graft_script_q").as[String].collect().toSet ===
      Set("a;b", "c'd;e"))
    Catalog.dropTable(spark, "graft_script_q")
  }

  test("parquet append sink accumulates batches (A3)") {
    val dir = Files.createTempDirectory("graft_append").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Tables.appendParquet(df, dir)
    Tables.appendParquet(df, dir)
    assert(spark.read.parquet(dir).count() === 4)
  }

  test("ScalableKeys: dense sequential ids without a global sort") {
    val df = spark.range(0, 10000).toDF("v").repartition(8)
    val withIds = ScalableKeys.withSequentialIds(df, "id", startAt = 100)
    assert(withIds.count() === 10000)
    val ids = withIds.select("id").as[Long].collect().sorted
    assert(ids.head === 100 && ids.last === 10099)
    assert(ids.distinct.length === 10000)
  }

  test("Salting: salted join and salted sum equal their unsalted twins") {
    val large = spark.range(0, 5000)
      .select((col("id") % 10).as("k"), col("id").as("v"))
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val plain = large.join(small, "k")
    val salted = Salting.saltedEquiJoin(large, small, "k", 4)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("v")).head().getLong(0) ===
      plain.agg(sum("v")).head().getLong(0))

    val plainSum = large.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").collect()
    val saltedSum = Salting.saltedSum(large, "k", "v", 4)
      .orderBy("k").collect()
    assert(plainSum.sameElements(saltedSum))
  }
}
