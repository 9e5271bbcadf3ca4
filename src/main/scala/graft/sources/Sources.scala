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

/** JDBC batch source — the reference's Postgres ingress (S3/S4): a
  * time-range scan of logged_events (KafkaLoader.java:87-91) and a full
  * users read (KafkaUserLoader.java:82-86). Wired through
  * `spark.read.jdbc`, compiled always, fail-fast without a driver jar
  * (the KafkaSource posture — this environment ships none, so the option/
  * predicate construction is what SourcesSpec pins).
  *
  * Scale shape: the range filter is part of the pushed-down `dbtable`
  * subquery, so the database scans its index instead of shipping the
  * table; `partitionColumn`/bounds split the read into `numPartitions`
  * parallel range queries — the reference's single-connection
  * while(results.next()) loop becomes a partitioned distributed scan.
  * Predicates are assembled from caller-supplied column names and
  * LITERALS ONLY by these helpers (no user-input interpolation).
  */
final case class JdbcSource(url: String, table: String,
                            user: String, password: String,
                            driver: String = "org.postgresql.Driver",
                            rangeColumn: Option[String] = None,
                            rangeFrom: Option[String] = None,
                            rangeUntil: Option[String] = None,
                            partitionColumn: Option[String] = None,
                            lowerBound: Long = 0L, upperBound: Long = 0L,
                            numPartitions: Int = 1) {

  private def requireDriver(): Unit =
    try { Class.forName(driver); () }
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          s"JDBC driver $driver not on the classpath; " +
            "use FileSource in this environment (SURVEY §7.2.8)")
    }

  /** The reference's WHERE clause shape (KafkaLoader.java:88-91), as the
    * half-open range `col >= from AND col < until`.
    */
  def rangeClause: Option[String] =
    for (c <- rangeColumn; f <- rangeFrom; u <- rangeUntil)
      yield s"$c >= '$f' AND $c < '$u'"

  /** The pushed-down scan target: the bare table, or a subquery embedding
    * the range predicate so the database prunes before shipping rows.
    */
  def dbtable: String =
    rangeClause.fold(table)(w => s"(SELECT * FROM $table WHERE $w) graft_src")

  /** Options handed to `spark.read.format("jdbc")` — split out so the
    * construction is testable without a database.
    */
  def readOptions: Map[String, String] = {
    val base = Map(
      "url" -> url, "dbtable" -> dbtable, "user" -> user,
      "password" -> password, "driver" -> driver,
      // stream rows instead of buffering the whole result set per task
      "fetchsize" -> "10000")
    partitionColumn.fold(base)(pc => base ++ Map(
      "partitionColumn" -> pc,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString))
  }

  def batch(spark: SparkSession): DataFrame = {
    requireDriver()
    spark.read.format("jdbc").options(readOptions).load()
  }
}

/** JDBC upsert sink — the reference's achievements egress (S6,
  * ThresholdAchievedProcessor.java:80-89): one row per crossing into
  * user_achievements. The reference INSERTs per record on the driver; at
  * scale the write must be (a) distributed — each partition opens one
  * connection and writes a batched statement — and (b) idempotent under
  * replay, so the INSERT carries ON CONFLICT DO NOTHING keyed by the
  * achievement identity (the foreachBatch parquet stand-in's
  * dynamic-partition overwrite plays this role offline; see
  * streaming/Topology). Fail-fast without a driver jar.
  */
final case class JdbcSink(url: String, table: String,
                          user: String, password: String,
                          driver: String = "org.postgresql.Driver",
                          conflictColumns: Seq[String] = Nil,
                          batchSize: Int = 1000) {

  private def requireDriver(): Unit =
    try { Class.forName(driver); () }
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          s"JDBC driver $driver not on the classpath; " +
            "use Loaders.sink in this environment (SURVEY §7.2.8)")
    }

  /** The prepared-statement SQL: the reference's INSERT
    * (ThresholdAchievedProcessor.java:80-83) plus the ON CONFLICT clause
    * that makes redelivery a no-op instead of a duplicate row.
    */
  def upsertSql(columns: Seq[String]): String = {
    val cols = columns.mkString(", ")
    val marks = columns.map(_ => "?").mkString(", ")
    val conflict =
      if (conflictColumns.isEmpty) ""
      else s" ON CONFLICT (${conflictColumns.mkString(", ")}) DO NOTHING"
    s"INSERT INTO $table ($cols) VALUES ($marks)$conflict"
  }

  /** Distributed batched write: one connection and one addBatch loop per
    * partition (executor-side — rows never collect to the driver),
    * executed every `batchSize` rows. Used from foreachBatch for the
    * streaming path, or directly on a batch frame.
    */
  def write(df: DataFrame): Unit = {
    requireDriver()
    val columns = df.schema.fieldNames.toSeq
    val sql = upsertSql(columns)
    val (u, tUser, tPass, drv) = (url, user, password, driver)
    val bs = batchSize
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      Class.forName(drv)
      val conn = java.sql.DriverManager.getConnection(u, tUser, tPass)
      try {
        val pst = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          var i = 0
          while (i < columns.length) {
            pst.setObject(i + 1, r.get(i)); i += 1
          }
          pst.addBatch()
          n += 1
          if (n % bs == 0) { pst.executeBatch(); () }
        }
        pst.executeBatch()
        ()
      } finally conn.close()
    }
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
