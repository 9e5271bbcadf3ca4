package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The events loader must tolerate the source's schema drift (the reference
  * ingests whatever the topic carries — SURVEY §1.2): ts has shipped as
  * parquet TIMESTAMP(NANOS) (read as long under the session's legacy flag),
  * and as plain TIMESTAMP(MICROS) with and without the UTC annotation.
  * All three layouts must load to identical TimestampType rows, and the
  * range scan must keep its pushed filter in every branch.
  */
class TablesSpec extends SparkSpec {

  // one fixture dir per physical layout, derived from the same 6 rows
  private lazy val dirs: Map[String, String] = {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "2024-01-01T00:00:00", 10L, "login", 1.0),
      (2L, "2024-01-03T12:30:00", 11L, "answer", 2.0),
      (3L, "2024-01-05T00:00:00", 10L, "answer", 3.0),
      (4L, "2024-01-06T23:59:59", 12L, "logout", 4.0),
      (5L, "2024-01-08T00:00:00", 11L, "login", 5.0),
      (6L, "2024-01-09T08:00:00", 13L, "answer", 6.0))
      .toDF("event_id", "iso", "user_id", "event_type", "value")
      .withColumn("props", map(lit("k"), lit("v")))
    def write(name: String)(tsCol: org.apache.spark.sql.Column): String = {
      val dir = managedTempDir(s"graft-tables-$name")
      base.withColumn("ts", tsCol).drop("iso")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    Map(
      // TIMESTAMP(isAdjustedToUTC=true, MICROS) → loads as TimestampType
      "ltz" -> write("ltz")(to_timestamp(col("iso"))),
      // TIMESTAMP(isAdjustedToUTC=false, MICROS) → loads as TimestampNTZType
      "ntz" -> write("ntz")(to_timestamp(col("iso")).cast("timestamp_ntz")),
      // the legacy layout: nanos-as-long (what TIMESTAMP(NANOS) reads as
      // under spark.sql.legacy.parquet.nanosAsLong — the test session sets
      // it, matching every graft entry point)
      "nanos" -> write("nanos")(
        unix_micros(to_timestamp(col("iso"))) * 1000L))
  }

  test("events loads every ts layout to identical TimestampType rows") {
    val loaded = dirs.map { case (layout, dir) =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, layout)
      layout -> df.orderBy("event_id").collect().toSeq
    }
    assert(loaded("ltz").nonEmpty)
    assert(loaded("ntz") == loaded("ltz"), "ntz vs ltz")
    assert(loaded("nanos") == loaded("ltz"), "nanos vs ltz")
  }

  test("eventsRange filters identically across layouts, bounds half-open") {
    val expected = Seq(2L, 3L, 4L) // [2024-01-02, 2024-01-08): rows 2,3,4
    dirs.foreach { case (layout, dir) =>
      val got = Tables.eventsRange(spark, dir, "2024-01-02", "2024-01-08")
        .orderBy("event_id").select("event_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSeq
      assert(got == expected, layout)
    }
  }

  test("eventsRange pushes the range predicate in every layout") {
    dirs.foreach { case (layout, dir) =>
      val p = Tables.eventsRange(spark, dir, "2024-01-02", "2024-01-08")
        .queryExecution.executedPlan.toString
      assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
        s"$layout: $p")
    }
  }
}
