package graft

import graft.sources.Tables

/** JDBC source/sink round-trip (SURVEY.md §2 A3/A5 as real JDBC) against
  * embedded in-memory Derby — the JDBC driver Spark ships with, so this
  * exercises the exact `spark.read/write.format("jdbc")` path the
  * reference uses against Oracle (`etl/etl.py:143-160,266-269`) without
  * needing a database server.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:grafttest;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("writeJdbc then readJdbc round-trips rows and schema") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
    Tables.writeJdbc(df, url, "t_roundtrip", mode = "overwrite",
      props = props, batchSize = 5000)
    val back = Tables.readJdbc(spark, url, "t_roundtrip", props = props)
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).sorted === Array("id", "name", "score"))
    assert(back.orderBy("ID").as[(Long, String, Double)].collect()
      === Array((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
  }

  test("partitioned readJdbc splits the scan into range-bounded tasks") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    Tables.writeJdbc(df, url, "t_parts", mode = "overwrite", props = props)
    val back = Tables.readJdbc(spark, url, "t_parts", props = props,
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .as[Long].head() === 5050L)
  }

  test("append mode accumulates batches (the reference's staged-load shape)") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    Tables.writeJdbc(a, url, "t_append", mode = "overwrite", props = props)
    Tables.writeJdbc(b, url, "t_append", mode = "append", props = props)
    assert(Tables.readJdbc(spark, url, "t_append", props = props).count() === 2)
  }
}
