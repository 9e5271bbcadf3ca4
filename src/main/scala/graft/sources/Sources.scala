package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink abstraction (SURVEY §7.5.6): the reference reads/writes Kafka
  * topics (S1/S2/S5) and Postgres tables (S3/S4/S6). This environment ships
  * neither the Kafka connector jar nor a JDBC driver, so the topology codes
  * against this trait; file and memory implementations run everywhere, and
  * the Kafka implementation activates only when the connector is present.
  */
trait EventSource {
  def batch(spark: SparkSession): DataFrame
  def stream(spark: SparkSession): DataFrame
}

/** Parquet directory source (the offline stand-in for a topic). */
final case class FileSource(path: String, schema: StructType) extends EventSource {
  override def batch(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}

/** Kafka topic source — compiled reflectively so the class loads without the
  * connector jar; fails with a clear message when used without it.
  */
final case class KafkaSource(bootstrap: String, topic: String, schema: StructType)
    extends EventSource {
  private def requireConnector(): Unit =
    try Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          "spark-sql-kafka connector jar not on the classpath; " +
            "use FileSource in this environment (SURVEY §7.2.8)")
    }

  private def parse(raw: DataFrame): DataFrame =
    raw.select(
      col("key").cast("string").as("record_key"),
      from_json(col("value").cast("string"), schema).as("v"))
      .select(col("record_key"), col("v.*"))

  override def batch(spark: SparkSession): DataFrame = {
    requireConnector()
    parse(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic).load())
  }

  override def stream(spark: SparkSession): DataFrame = {
    requireConnector()
    parse(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic).load())
  }
}

/** Batch replay pipelines — the Spark re-expression of the reference's
  * KafkaLoader/KafkaUserLoader (SURVEY §3.2/3.3): scan, time-range filter,
  * PII allow-list projection, null scrub, keyed JSON envelope, sink. The
  * reference's per-record producer loop with a 1 ms sleep becomes one
  * distributed write (its ~1k rec/s ceiling does not exist here).
  */
object Loaders {

  /** Keyed JSON envelope projection (shared by both replay paths). */
  def eventEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("record_key"),
      to_json(struct(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("props")))
        .as("record_value"))

  /** KafkaLoader analog: events in [from, until) as keyed JSON envelopes.
    * Source-agnostic form — the filter lands on the converted timestamp, so
    * over the raw events.parquet it CANNOT push past the nanos conversion;
    * use `eventReplayPruned` when reading from the testdata layout.
    */
  def eventReplay(events: DataFrame, from: String, until: String): DataFrame =
    eventEnvelope(events
      .filter(col("ts") >= lit(from).cast("timestamp") &&
        col("ts") < lit(until).cast("timestamp")))

  /** Replay over the testdata layout with the range predicate pushed into
    * the parquet scan (graft.Tables.eventsRange — PlanSpec asserts the
    * PushedFilters). Identical output to `eventReplay` on the same range.
    */
  def eventReplayPruned(spark: SparkSession, dir: String,
                        from: String, until: String): DataFrame =
    eventEnvelope(graft.Tables.eventsRange(spark, dir, from, until))

  /** KafkaUserLoader analog: user dimension wrapped as CREATE_UPDATE_USER
    * envelopes, PII-style columns excluded by the allow-list projection.
    */
  def userReplay(customer: DataFrame): DataFrame =
    customer
      .select(
        col("c_custkey").cast("string").as("record_key"),
        to_json(struct(
          lit("CREATE_UPDATE_USER").as("event_type"),
          struct(
            col("c_custkey").as("user_id"),
            coalesce(col("c_name"), lit("")).as("name"),
            coalesce(col("c_mktsegment"), lit("")).as("role"),
            col("c_nationkey").as("nation"))
            .as("event_details"))).as("record_value"))

  /** Sink: parquet stands in for the keyed Kafka producer (S5). */
  def sink(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
