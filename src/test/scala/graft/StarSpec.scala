package graft

import org.apache.spark.sql.functions._
import graft.operators.Star

/** Star-schema build invariants (SURVEY.md §2 D3, I1, E1). */
class StarSpec extends SparkSpec {
  import spark.implicits._

  test("surrogate keys are dense, deterministic, ordered by natural id") {
    val dim = Star.dimCustomer(spark, sf0001).orderBy("customer_key")
      .select("customer_key", "customer_id").as[(Long, Long)].collect()
    assert(dim.map(_._1) === (1L to dim.length).toArray)
    assert(dim.map(_._2).sorted === dim.map(_._2)) // key order == natural order
  }

  test("dim_date covers exactly the distinct ship dates, with correct parts") {
    val dd = Star.dimDate(spark, sf0001)
    val n = graft.sources.Tables.lineitem(spark, sf0001)
      .select(to_date($"l_shipdate")).distinct().count()
    assert(dd.count() === n)
    val bad = dd.filter(
      $"date_key" =!= date_format($"calendar_date", "yyyyMMdd").cast("int") ||
      $"weekday" < 1 || $"weekday" > 7 ||
      $"quarter" =!= quarter($"calendar_date")).count()
    assert(bad === 0)
  }

  test("rank-by-key equals the single-partition row_number it replaces") {
    import org.apache.spark.sql.expressions.Window
    val base = graft.sources.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_name")
    val viaWindow = base.withColumn("k",
      row_number().over(Window.orderBy("c_custkey")).cast("long"))
    val viaRank = graft.operators.ScalableKeys
      .withRankByKey(base, "c_custkey", "k")
    assert(viaWindow.exceptAll(viaRank).isEmpty &&
      viaRank.exceptAll(viaWindow).isEmpty)
  }

  test("mergeByKey: staged updates matched rows, inserts new, keeps rest; idempotent") {
    val existing = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v")
    val staged = Seq((2L, "b2", 21), (4L, "d", 40)).toDF("id", "name", "v")
    val merged = Star.mergeByKey(existing, staged, "id")
      .orderBy("id").as[(Long, String, Int)].collect()
    assert(merged === Array((1L, "a", 10), (2L, "b2", 21), (3L, "c", 30),
      (4L, "d", 40)))
    val again = Star.mergeByKey(Star.mergeByKey(existing, staged, "id"),
      staged, "id").orderBy("id").as[(Long, String, Int)].collect()
    assert(again === merged)
  }

  test("keepNewestByKey picks the highest-version row per key") {
    val df = Seq((1L, 1, "old"), (1L, 3, "new"), (1L, 2, "mid"),
      (2L, 7, "only")).toDF("id", "ver", "payload")
    val got = Star.keepNewestByKey(df, "id", "ver")
      .orderBy("id").as[(Long, Int, String)].collect()
    assert(got === Array((1L, 3, "new"), (2L, 7, "only")))
  }

  test("upsert is idempotent: applying staged twice adds nothing") {
    val existing = Star.dimDateFrom(
      graft.sources.Tables.orders(spark, sf0001), "o_orderdate")
    val staged = Star.dimDateFrom(
      graft.sources.Tables.lineitem(spark, sf0001), "l_shipdate")
    val once = Star.upsertByKey(existing, staged, "date_key")
    val twice = Star.upsertByKey(once, staged, "date_key")
    assert(once.count() === twice.count())
    assert(twice.select("date_key").distinct().count() === twice.count())
  }

  test("fact_sales: every lineitem row lands with all surrogate keys resolved") {
    val fact = Star.factSales(spark, sf0001)
    val nLi = graft.sources.Tables.lineitem(spark, sf0001).count()
    assert(fact.count() === nLi)
    val unresolved = fact.filter(
      $"customer_key".isNull || $"product_key".isNull ||
      $"store_key".isNull || $"date_key".isNull).count()
    assert(unresolved === 0)
  }

  test("fact_sales revenue ties out with the raw lineitem revenue") {
    val fromFact = Star.factSales(spark, sf0001)
      .agg(sum($"total_amount".cast("decimal(18,2)"))).as[java.math.BigDecimal]
      .head()
    val fromRaw = graft.sources.Tables.lineitem(spark, sf0001)
      .agg(sum((($"l_extendedprice" * (lit(1) - $"l_discount")))
        .cast("decimal(18,2)"))).as[java.math.BigDecimal].head()
    assert(fromFact === fromRaw)
  }
}
