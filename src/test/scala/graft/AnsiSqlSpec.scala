package graft

/** Dual-dialect portability (SURVEY.md §3 entry point 2): the BI
  * insight queries' oracle SQL is plain ANSI — the very same text runs
  * unchanged through `spark.sql` and produces the same cells as the
  * DataFrame-API form. (Queries built on DuckDB-specific functions —
  * list_*, strftime, isodow — are exercised via the DuckDB oracle only.)
  */
class AnsiSqlSpec extends SparkSpec {

  private val ansiPortable = Seq(
    "q01_top_products", "q02_monthly_revenue", "q03_revenue_by_store",
    "q04_balance_bucket", "q05_kpi_summary",
    // q06 left this list in round 6: its share floor now uses the
    // cents-scaled integer division idiom (HUGEINT + `//`, DuckDB-only)
    "q12_row_counts",
    // round-3 additions whose oracles are dialect-free
    // q69 left this list in round 4: its oracle now converts the >2^53
    // moments via Features.decToDoubleSql (HUGEINT + `//`, DuckDB-only)
    "q59_scd2", "q61_bloom_join", "q63_click_funnel", "q66_latest_by_user",
    "q74_set_cohorts",
    "q78_debounce", "q79_active_users", "q80_retention", "q81_streaks",
    // round-4 wave 2 dialect-free oracles
    "q107_skyline", "q111_daily_reconcile", "q113_topk_per_segment",
    "q115_price_ranks", "q116_weighted_median", "q117_exists_subquery")

  private def registerViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      graft.sources.Tables.load(spark, sf0001, t).createOrReplaceTempView(t)
    }
    graft.sources.Tables.events(spark, sf0001)
      .createOrReplaceTempView("events")
  }

  test("oracle SQL runs unchanged on spark.sql with identical results") {
    registerViews()
    ansiPortable.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaApi = SparkEntry.queries(name)(spark, sf0001)
      val sqlCols = viaSql.columns.sorted.toSeq
      val apiCols = viaApi.columns.sorted.toSeq
      assert(sqlCols === apiCols, s"$name column mismatch")
      val l = viaSql.select(sqlCols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq
      val r = viaApi.select(apiCols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq
      assert(l === r, s"$name: spark.sql result differs from DataFrame API")
    }
  }
}
