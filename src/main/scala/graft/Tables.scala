package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB these would be
  * partitioned datasets; the loaders take a directory so swapping in a
  * partitioned layout (or a different source) is a one-line change.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark does
    * not read natively: read it as a long and convert. The generated data is
    * microsecond-precision (ns remainder is always 0), so `div 1000` is an
    * exact conversion, matching what DuckDB sees.
    *
    * Reading TIMESTAMP(NANOS) requires the SESSION-WIDE flag
    * `spark.sql.legacy.parquet.nanosAsLong` (it has no per-read option). All
    * graft entry points (Verify/Bench/Explain/tests) set it at session build;
    * for externally-built sessions this loader sets it once if absent — an
    * intentional, documented global effect: any other TIMESTAMP(NANOS)
    * parquet column in the session will also read as long.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  /** Time-range scan of events with the predicate applied to the RAW
    * nanos-long column BEFORE the timestamp conversion — a filter on the
    * derived `ts` cannot push through `timestamp_micros(ts div 1000)`, so it
    * would scan every row group; this form reaches the parquet reader as a
    * plain long range (PlanSpec asserts it). Bounds are ISO dates, UTC.
    * Equivalence: derived_ts >= T  iff  raw_ns >= epoch_us(T) * 1000.
    */
  def eventsRange(spark: SparkSession, dir: String,
                  fromIso: String, untilIso: String): DataFrame = {
    def ns(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.getEpochSecond * 1000000000L
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    load(spark, dir, "events")
      .filter(col("ts") >= ns(fromIso) && col("ts") < ns(untilIso))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
