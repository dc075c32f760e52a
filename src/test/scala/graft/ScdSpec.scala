package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** Type-2 SCD semantics on a toy dim: change → close+reopen, insert,
  * no-op, and history passthrough. (The registered q59 covers the
  * changed/unchanged paths against the DuckDB oracle; inserts and
  * pre-existing history rows only occur here.)
  */
class ScdSpec extends SparkSpec {

  test("applyType2: closes changed, keeps unchanged, inserts new, passes history") {
    import spark.implicits._
    val current = Seq(
      // k=1: history row + open row that will change
      (1, "a-old", java.sql.Date.valueOf("2023-01-01"),
        java.sql.Date.valueOf("2024-01-01"), 0),
      (1, "a", java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf(Scd.OpenEnd), 1),
      // k=2: open row, unchanged in staged
      (2, "b", java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf(Scd.OpenEnd), 1),
      // k=3: open row, absent from staged (late dim — stays open)
      (3, "c", java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf(Scd.OpenEnd), 1)
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val staged = Seq(
      (1, "a-new"), // changed
      (2, "b"),     // identical
      (4, "d")      // brand new key
    ).toDF("k", "attr")

    val out = Scd.applyType2(current, staged, "k", Seq("attr"), "2024-06-01")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDate(2).toString,
        r.getDate(3).toString, r.getInt(4)))

    assert(out.toSeq == Seq(
      (1, "a-old", "2023-01-01", "2024-01-01", 0),
      (1, "a", "2024-01-01", "2024-06-01", 0),
      (1, "a-new", "2024-06-01", Scd.OpenEnd, 1),
      (2, "b", "2024-01-01", Scd.OpenEnd, 1),
      (3, "c", "2024-01-01", Scd.OpenEnd, 1),
      (4, "d", "2024-06-01", Scd.OpenEnd, 1)))
  }

  test("applyType2 is idempotent: re-applying the same snapshot changes nothing") {
    import spark.implicits._
    val current = Seq(
      (1, "a", java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf(Scd.OpenEnd), 1)
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val staged = Seq((1, "a")).toDF("k", "attr")
    val once = Scd.applyType2(current, staged, "k", Seq("attr"), "2024-06-01")
    val twice = Scd.applyType2(once, staged, "k", Seq("attr"), "2024-07-01")
    assert(twice.count() == 1)
    assert(twice.filter(col("is_current") === 1).count() == 1)
  }
}
