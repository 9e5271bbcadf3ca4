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

  test("ntz layout loads to the same instants in a non-UTC session") {
    // a plain ntz->ltz cast would reinterpret the UTC wall clock in the
    // session zone and silently shift every instant; the loader routes
    // through convert_timezone so any session zone is exact
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = Tables.events(s2, dirs("ntz")).orderBy("event_id").collect().toSeq
    val ref = Tables.events(spark, dirs("ntz")).orderBy("event_id").collect().toSeq
    assert(got == ref) // java.sql.Timestamp equality is epoch-based
  }

  test("real TIMESTAMP(NANOS) files load via the flag-set retry in a flag-less session") {
    // Spark cannot WRITE nanos parquet, so build the file with parquet-mr
    // directly — the only way to exercise loadEventsRaw's retry branch
    // (the shared test session pre-sets the flag; a fresh session with it
    // off must fail the first read, set the flag, and reload as long)
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val dir = managedTempDir("graft-tables-realnanos")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    val baseNs = java.time.Instant.parse("2024-01-03T12:30:00Z").getEpochSecond * 1000000000L
    (1 to 3).foreach { i =>
      val g = gf.newGroup()
      g.add("event_id", i.toLong); g.add("ts", baseNs + i * 1000000L)
      g.add("user_id", 10L + i); g.add("event_type", "login")
      g.add("value", i.toDouble); g.add("props", "{}")
      writer.write(g)
    }
    writer.close()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val out = Tables.events(s2, dir).orderBy("event_id").collect()
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true") // retry fired
    assert(out.length == 3)
    assert(out(0).getAs[java.sql.Timestamp]("ts").getTime ==
      (baseNs + 1000000L) / 1000000L) // epoch millis, exact micros-in-nanos
  }

  test("a failed retry restores the nanosAsLong flag before rethrowing") {
    // the first read fails for a non-nanos reason (missing dir), the
    // flag-set retry fails the same way — the session flag must come back
    // to its prior value instead of staying flipped (which would silently
    // read any later TIMESTAMP(NANOS) column as long)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    intercept[Exception] {
      Tables.events(s2, "/nonexistent/graft-tables-retry-restore")
    }
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
  }
}
