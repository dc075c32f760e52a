package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** The reference generator's validation report (SURVEY.md §2 K1-K3;
  * `scripts/generate_data.py:286-309`, `data/validation_report.txt`):
  * row counts, per-table null-cell totals, FK referential integrity —
  * written as a small text report. Each check is one aggregation job;
  * nothing is collected except the final scalar counts.
  */
object ValidationReport {

  case class Report(rowCounts: Map[String, Long],
    nullCells: Map[String, Long], badFkRows: Long) {
    def render: String = {
      val counts = rowCounts.toSeq.sortBy(_._1)
        .map { case (t, n) => s"rows $t: $n" }
      val nulls = nullCells.toSeq.sortBy(_._1)
        .map { case (t, n) => s"null_cells $t: $n" }
      (counts ++ nulls :+ s"sales_rows_with_bad_fk: $badFkRows")
        .mkString("", "\n", "\n")
    }
  }

  private def nullCellCount(df: DataFrame): Long =
    df.agg(df.columns.map(c => sum(col(c).isNull.cast("long")))
        .reduce(_ + _).as("n"))
      .head().getLong(0)

  def validate(customers: DataFrame, products: DataFrame, stores: DataFrame,
      sales: DataFrame): Report = {
    val tables = Map("customers" -> customers, "products" -> products,
      "stores" -> stores, "sales" -> sales)
    val counts = tables.map { case (n, df) => n -> df.count() }
    val nulls = tables.map { case (n, df) => n -> nullCellCount(df) }
    // FK integrity: sales rows whose FKs miss any dim (anti-join, E7/K2).
    // The dims come from the seeded generator and scale with --rows, so
    // the broadcast is SIZE-GATED (round-3 rule: no hard hint on
    // anything that grows) — past the threshold Catalyst/AQE fall back
    // to a shuffle anti-join.
    val bad =
      sales.join(Joins.broadcastIfSmall(customers.select("customer_id")),
          Seq("customer_id"), "left_anti").count() +
      sales.join(Joins.broadcastIfSmall(products.select("product_id")),
          Seq("product_id"), "left_anti").count() +
      sales.join(Joins.broadcastIfSmall(stores.select("store_id")),
          Seq("store_id"), "left_anti").count()
    Report(counts, nulls, bad)
  }

  def writeReport(report: Report, path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), report.render)
  }
}
