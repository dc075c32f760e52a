package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Cleaning
import graft.sources.Tables

/** Semantics corners from FIXTURES.md §B "unit-test corner inputs",
  * mirroring the reference's pandas behavior (`etl/etl.py:63-104`).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("age coercion + range filter: 'abc'->null dropped, 17/101 dropped, 18/100 kept") {
    val raw = Seq(
      ("1", "A", "B", "M", "abc", "c", "s", "Gold"),
      ("2", "A", "B", "M", "17", "c", "s", "Gold"),
      ("3", "A", "B", "M", "101", "c", "s", "Gold"),
      ("4", "A", "B", "M", "18", "c", "s", "Gold"),
      ("5", "A", "B", "M", "100", "c", "s", "Gold"))
      .toDF(Tables.customersCsvSchema.fieldNames: _*)
    val got = Cleaning.cleanCustomers(raw)
    assert(got.select("customer_id").as[Long].collect().sorted === Array(4L, 5L))
  }

  test("name trim") {
    val raw = Seq(("1", "  Asha ", " Rao ", "F", "30", "c", "s", "Gold"))
      .toDF(Tables.customersCsvSchema.fieldNames: _*)
    val r = Cleaning.cleanCustomers(raw).select("first_name", "last_name")
      .head()
    assert(r === Row("Asha", "Rao"))
  }

  test("cost<price filter drops equal-cost row; size renamed to size_") {
    val raw = Seq(
      ("1", "p", "Electronics", "sc", "b", "100.0", "100.0", "red", "M"),
      ("2", "p", "Electronics", "sc", "b", "100.0", "60.0", "red", "M"))
      .toDF(Tables.productsCsvSchema.fieldNames: _*)
    val got = Cleaning.cleanProducts(raw)
    assert(got.columns.contains("size_") && !got.columns.contains("size"))
    assert(got.select("product_id").as[Long].collect() === Array(2L))
  }

  test("date parse day-first: 31-12-2024 ok; ISO and garbage dropped") {
    val rows = Seq("31-12-2024", "2024-12-31", "garbage").zipWithIndex.map {
      case (d, i) => (s"$i", "1", "1", "1", "2", d, "0", "10.0", "20.0")
    }
    val raw = rows.toDF(Tables.salesCsvSchema.fieldNames: _*)
    val got = Cleaning.cleanSales(raw)
    assert(got.count() === 1)
    assert(got.select("sales_date").head().getDate(0).toString === "2024-12-31")
  }

  test("quantity <= 0 or unparseable dropped; null discount -> 0.0") {
    val rows = Seq(("1", "0"), ("2", "-3"), ("3", "x"), ("4", "2")).map {
      case (id, q) => (id, "1", "1", "1", q, "01-06-2024", null: String,
        "10.0", "20.0")
    }
    val raw = rows.toDF(Tables.salesCsvSchema.fieldNames: _*)
    val got = Cleaning.cleanSales(raw)
    assert(got.select("sales_id").as[Long].collect() === Array(4L))
    assert(got.select("discount_pct").as[Double].head() === 0.0)
  }

  test("weekday 1=Mon..7=Sun; date_key yyyyMMdd int") {
    val df = Seq("2024-01-01", "2024-01-07").toDF("d")
      .select(to_date($"d").as("d"))
    val got = df.select(Cleaning.weekdayMon1($"d"), Cleaning.dateKey($"d"))
      .as[(Int, Int)].collect().sortBy(_._2)
    assert(got === Array((1, 20240101), (7, 20240107)))
  }

  test("age buckets: boundary values") {
    val df = Seq(18, 25, 26, 35, 36, 45, 46, 60, 61).toDF("age")
    val got = df.select($"age", Cleaning.ageBucket($"age")).as[(Int, String)]
      .collect().toMap
    assert(got(18) === "18-25" && got(25) === "18-25")
    assert(got(26) === "26-35" && got(35) === "26-35")
    assert(got(36) === "36-45" && got(45) === "36-45")
    assert(got(46) === "46-60" && got(60) === "46-60")
    assert(got(61) === "60+")
  }

  test("derived amounts: unit_price = price*(1-disc/100), total = unit*qty, round 2") {
    val df = Seq((200.0, 25.0, 3)).toDF("price", "discount_pct", "quantity")
    val got = Cleaning.withDerivedAmounts(df)
      .select("unit_price", "total_amount").head()
    assert(got === Row(150.0, 450.0))
  }
}
