package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB these would be
  * partitioned datasets; the loaders take a directory so swapping in a
  * partitioned layout (or a different source) is a one-line change.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's ts column has shipped in two physical layouts:
    * parquet TIMESTAMP(NANOS) (which Spark only reads via the session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` flag, as a long) and plain
    * TIMESTAMP(MICROS). The loader adapts to whichever the files contain —
    * ingest must tolerate the source's schema drift, not pin one vintage:
    *   - long (nanos under the legacy flag): `timestamp_micros(ts div 1000)`
    *     — the generated nanos data is micros-precision, so `div 1000` is
    *     exact, matching what DuckDB sees;
    *   - timestamp_ntz (micros, no tz annotation): cast to timestamp — all
    *     graft sessions pin UTC, so the cast preserves the wall-clock value
    *     and epoch exactly, and downstream operators keep seeing the
    *     TimestampType they were written against;
    *   - timestamp: already native, no conversion.
    *
    * TIMESTAMP(NANOS) files fail schema inference without the legacy flag,
    * so a failed flag-less read is retried ONCE with the flag set — a
    * session-global effect (any other NANOS column reads as long
    * afterwards), but one that only triggers when the first read actually
    * fails; micros-era sessions are left untouched. The retry is
    * unconditional rather than gated on the exception text (failure
    * wrapping and message wording vary across Spark versions); if the
    * retry fails too, the flag is restored to its prior value (so a
    * failure unrelated to nanos — missing dir, corrupt file — cannot
    * leave the session-global flag flipped) and the ORIGINAL error is
    * rethrown.
    */
  private def loadEventsRaw(spark: SparkSession, dir: String): DataFrame =
    try load(spark, dir, "events")
    catch {
      case e: Exception
          if !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true") =>
        val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try load(spark, dir, "events")
        catch {
          case _: Exception =>
            prior match {
              case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
              case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            }
            throw e
        }
    }

  /** The session tz whose wall clock the ntz layout's values carry is UTC
    * (the generator writes UTC instants with no zone annotation). A plain
    * ntz→ltz cast reinterprets the wall clock in the SESSION zone, so a
    * non-UTC session would silently shift every instant; routing through
    * convert_timezone('UTC', <session tz>, ts) first makes the cast exact
    * in any session zone (and is the identity when the session is UTC).
    */
  private def ntzToUtcInstant(spark: SparkSession): org.apache.spark.sql.Column = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    expr(s"cast(convert_timezone('UTC', '$tz', ts) as timestamp)")
  }

  private def toTimestamp(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", ntzToUtcInstant(raw.sparkSession))
      case TimestampType    => raw
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    toTimestamp(loadEventsRaw(spark, dir))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Time-range scan of events with the predicate applied to the RAW stored
    * column BEFORE any conversion, so it reaches the parquet reader as a
    * pushed range filter (PlanSpec asserts it). In the legacy nanos-long
    * layout a filter on the derived `ts` cannot push through
    * `timestamp_micros(ts div 1000)` and would scan every row group; the
    * timestamp layouts push a plain range on the stored column, with the
    * literal built in the column's own type (LocalDateTime for ntz, Instant
    * for ltz) so no cast blocks the pushdown. Bounds are ISO dates, UTC.
    * Equivalence in the nanos case: derived_ts >= T iff raw_ns >= epoch_us(T) * 1000.
    */
  def eventsRange(spark: SparkSession, dir: String,
                  fromIso: String, untilIso: String): DataFrame = {
    val raw = loadEventsRaw(spark, dir)
    // one bound builder per layout, in the stored column's own type, so the
    // comparison needs no cast and stays pushdown-eligible; the layout
    // dispatch itself lives in toTimestamp — this is the only other use
    def bound(iso: String): org.apache.spark.sql.Column = {
      val day = java.time.LocalDate.parse(iso).atStartOfDay()
      raw.schema("ts").dataType match {
        case LongType         => lit(day.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L)
        case TimestampNTZType => lit(day)
        case _                => lit(day.toInstant(java.time.ZoneOffset.UTC))
      }
    }
    toTimestamp(raw.filter(col("ts") >= bound(fromIso) && col("ts") < bound(untilIso)))
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
