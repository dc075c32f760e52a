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

  test("snapshotDiff round-trips: old + changeset reproduces new exactly") {
    val cust = graft.sources.Tables.customer(spark, sf0001)
    val oldSnap = cust.filter(pmod(col("c_custkey"), lit(13)) =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("acctbal"))
    val newSnap = cust.filter(pmod(col("c_custkey"), lit(17)) =!= 0)
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(11)) === 0, lit("MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        (col("c_acctbal").cast("double") +
          when(pmod(col("c_custkey"), lit(7)) === 0, lit(100.0))
            .otherwise(lit(0.0))).as("acctbal"))
    val diff = Scd.snapshotDiff(oldSnap, newSnap, "c_custkey",
      Seq("c_mktsegment", "acctbal"))
    // every op class occurs in the fixture
    val ops = diff.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("I", "U", "D").subsetOf(ops.keySet), s"ops seen: $ops")
    // replay: (old minus D/U keys) union (I/U rows) == new
    val dropKeys = diff.filter(col("op").isin("D", "U")).select("c_custkey")
    val upserts = diff.filter(col("op").isin("I", "U"))
      .drop("op")
    val replayed = oldSnap.join(dropKeys, Seq("c_custkey"), "left_anti")
      .unionByName(upserts)
    assert(replayed.exceptAll(newSnap).isEmpty &&
      newSnap.exceptAll(replayed).isEmpty,
      "replaying the changeset onto old must reproduce new")
    // unchanged keys emit nothing: diff of a snapshot with itself is empty
    assert(Scd.snapshotDiff(newSnap, newSnap, "c_custkey",
      Seq("c_mktsegment", "acctbal")).isEmpty)
  }
}
