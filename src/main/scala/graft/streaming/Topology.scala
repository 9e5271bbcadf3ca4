package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators._

/** The reference's streaming topology (LoggedEventsListener.java:81-231)
  * re-expressed as Structured Streaming: one event source fanned out to the
  * branch sink and the stateful aggregations, each in Update mode with a 10s
  * trigger (the reference's commit interval, LoggedEventsListener.java:72).
  *
  * The same operator functions used for batch verification are applied to a
  * streaming DataFrame unchanged — Spark's batch/streaming unification stands
  * in for the reference's KStream/KTable duality (SURVEY §7.1).
  *
  * Sources are abstracted (SURVEY §7.5.6): files/MemoryStream here, Kafka in
  * a deployment that ships the connector jar; the topology code is agnostic.
  *
  * Watermark policy (SURVEY §7.5.2): the reference keeps state forever; every
  * stateful op here takes an optional watermark so a 100 TB deployment can
  * bound state, with `None` reproducing reference semantics.
  */
object Topology {

  /** Schema of the testdata event stream (FIXTURES.md §B). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source with the event schema (the offline stand-in
    * for the Kafka source S1 — no Kafka connector jar ships here).
    */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  private def withOptionalWatermark(df: DataFrame, watermark: Option[String]): DataFrame =
    watermark.fold(df)(w => df.withWatermark("ts", w))

  /** The aggregation fan-out: store name -> streaming DataFrame, mirroring
    * the reference's named state stores (SURVEY §1.1).
    */
  def stores(events: DataFrame, userDim: DataFrame,
             watermark: Option[String] = None): Map[String, DataFrame] = {
    val main = Ingest.mainBranch(events)
    val wm = withOptionalWatermark(main, watermark)
    Map(
      "store_anonymous_events" -> Ingest.anonymousBranch(events),
      "store_user_data" -> Enrich.latestUserStreaming(main),
      // a watermark cannot evict a plain agg's keyed state (no window in the
      // key), so the bounded form swaps in a per-key fold with event-time TTL
      "store_user_last_seen" -> watermark.fold(Stats.lastSeenPerType(main))(
        w => Stats.lastSeenPerTypeTtl(main, w)),
      "store_log_event_counts" -> Stats.eventTypeCounts(main),
      "store_daily_log_events" -> Stats.dailyRoleCounts(wm, userDim),
      "store_user_streaks" -> Streaks.sessions(wm),
      "store_question_attempts" -> Questions.partRollup(main),
      "store_user_achievements" -> Achievements.answerCounts(main),
      // extension store: streaming exact dedup (state bounded by watermark)
      "store_deduped_events" -> graft.ext.Dedup.exactDedupRecords(
        main, watermark.getOrElse("10 minutes")))
  }

  /** Start one store as an in-memory Update-mode sink (smoke/test harness);
    * production would swap format("memory") for the real sink per store.
    */
  /** Output mode for a store: session-window aggregations only support
    * Append (sessions emit once, when the watermark closes them); other
    * aggregations run Update (the reference's changelog semantics);
    * stateless plans run Append. Session windows are detected structurally —
    * either the SessionWindow expression itself (pre-rewrite) or an attribute
    * carrying the analyzer's session-window marker metadata (post-
    * SessionWindowing rewrite) — never by plan-string matching, so a column
    * merely *named* "session_window" cannot misroute the sink.
    */
  def outputModeFor(df: DataFrame): OutputMode = {
    val analyzed = df.queryExecution.analyzed
    val hasAgg = analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined
    import org.apache.spark.sql.catalyst.expressions.{Attribute, SessionWindow}
    val isSessionWindow = analyzed.exists(_.expressions.exists(_.exists {
      case _: SessionWindow => true
      case a: Attribute => a.metadata.contains(SessionWindow.marker)
      case _ => false
    }))
    // a flatMapGroupsWithState declared in Update mode requires an Update sink
    val fmgwsUpdate = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState
          if f.outputMode == OutputMode.Update() => f
    }.isDefined
    if (df.isStreaming && (fmgwsUpdate || (hasAgg && !isSessionWindow))) OutputMode.Update()
    else OutputMode.Append()
  }

  def startMemorySink(df: DataFrame, name: String,
                      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val mode = outputModeFor(df)
    df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(trigger)
      .start()
  }

  /** foreachBatch sink for the achievements path (S6): batch-mode JDBC/
    * parquet write per micro-batch, the Spark analog of the reference's
    * per-record Postgres processor.
    */
  def startAchievementsSink(df: DataFrame, path: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Achievements.sinkToParquet(batch.sparkSession, batch, path, batchId)
      }
      .start()
}
