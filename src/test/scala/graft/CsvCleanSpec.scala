package graft

import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType, LongType}

import graft.operators.CleanCsv

/** Fixture-level expectations for the registered CSV cleaning queries
  * (q36-q38) — the DuckDB oracle checks cell-exactness; these assert the
  * *semantics* (which rows survive which rule, and why) so a fixture or
  * cleaning-rule regression reads as a named failure, not a hash diff.
  */
class CsvCleanSpec extends SparkSpec {
  import spark.implicits._

  test("q36 sales: date/quantity gates drop the right rows; discount fills") {
    val rows = CleanCsv.cleanSalesCsv(spark, "").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 5, 6, 10, 11, 12, 14, 16))
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // B6: empty and junk discount -> 0.0
    assert(byId(5L).getDouble(6) === 0.0 && byId(6L).getDouble(6) === 0.0)
    // B4: junk numerics coerce to null, row otherwise survives
    assert(byId(10L).isNullAt(7) && byId(11L).isNullAt(8))
    // B5: leap date parses (29-02-2024 kept, 29-02-2023 dropped)
    assert(byId(14L).getDate(5).toString === "2024-02-29")
    val sch = CleanCsv.cleanSalesCsv(spark, "").schema
    assert(sch("sales_date").dataType === DateType)
    assert(sch("quantity").dataType === IntegerType)
    assert(sch("sales_id").dataType === LongType)
    assert(sch("unit_price").dataType === DoubleType)
  }

  test("q37 products: cost<price filter and size->size_ rename") {
    val df = CleanCsv.cleanProductsCsv(spark, "")
    assert(df.columns.contains("size_") && !df.columns.contains("size"))
    assert(df.select("product_id").as[Long].collect().toSeq ===
      Seq(201L, 206L, 207L))
  }

  test("q38 customers: trim applied, age domain [18,100] inclusive") {
    val rows = CleanCsv.cleanCustomersCsv(spark, "")
      .select("customer_id", "first_name", "last_name", "age")
      .as[(Long, String, String, Int)].collect()
    assert(rows.map(_._1).toSeq === Seq(101L, 103, 107, 108))
    assert(rows.find(_._1 == 101).get._2 === "Alice")
    val grace = rows.find(_._1 == 107).get
    assert(grace._2 === "Grace" && grace._3 === "Lee" && grace._4 === 18)
    assert(rows.find(_._1 == 103).get._4 === 100)
  }
}
