package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A7 + S6 — per-user answer counter and achievement-threshold detection
  * (QuestionAnswerCounter.java:33-45, QuestionAnswerInitializer.java:37-48,
  * ThresholdAchievedProcessor.java:68-99, thresholds config.properties:17).
  *
  * The reference declares this pipeline but never wires it (SURVEY §0); here
  * it is a first-class operator. Batch shape: one hash aggregation per user,
  * then a threshold lookup expressed as a Catalyst CASE chain (no join, no
  * extra shuffle). Streaming shape: the same aggregate in Update mode +
  * `foreachBatch` sink (`sinkToParquet` stands in for the reference's JDBC
  * upsert — no JDBC driver ships in this environment).
  */
object Achievements {

  /** config.properties:17 — ACHIEVEMENT_THRESHOLDS=1,5,10,20,30,50,75,100 */
  val Thresholds: Seq[Long] = Seq(1L, 5L, 10L, 20L, 30L, 50L, 75L, 100L)

  /** Highest threshold reached for a count column (0 if none). Folded in
    * ascending order so the largest threshold ends up as the outermost
    * (highest-priority) branch of the CASE chain.
    */
  def thresholdReached(count: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Thresholds.foldLeft(lit(0L)) { (acc, t) =>
      when(count >= t, lit(t)).otherwise(acc)
    }

  /** A7 — per-user correct-answer counter with the reference's achievement
    * record shape {userId, type, count, latestAttempt}.
    */
  def answerCounts(events: DataFrame): DataFrame =
    Ingest.questionAttempts(events)
      .filter(col("correct"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_correct"), max("ts").as("latest_attempt"))
      .withColumn("achievement_type", lit("QUESTIONS_ANSWERED_CORRECTLY"))
      .withColumn("threshold_achieved", thresholdReached(col("n_correct")))
      .select("user_id", "achievement_type", "n_correct", "latest_attempt", "threshold_achieved")

  /** A7 via the typed Aggregator surface (functions.AnswerCounter — the
    * Spark-native form of the reference's Initializer/Aggregator UDAF pair).
    * Must produce exactly what the untyped `answerCounts` path produces;
    * verified against the same oracle.
    */
  def typedAnswerCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.functions.AnswerCounter
    val ds = Ingest.questionAttempts(events)
      .filter(col("correct"))
      .select(col("user_id"), col("correct"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"))
      .as[AnswerCounter.AttemptIn]
    ds.groupByKey(_.user_id)
      .agg(AnswerCounter.agg.toColumn.name("buf"))
      .toDF("user_id", "buf")
      .select(col("user_id"), col("buf.count").as("n_correct"),
        expr("timestamp_micros(buf.latestUs)").as("latest_attempt"))
  }

  /** One row per threshold actually crossed (the reference inserts a row per
    * crossing into user_achievements — ThresholdAchievedProcessor.java:80-88).
    */
  def crossings(events: DataFrame): DataFrame = {
    val counts = answerCounts(events)
    val th = counts.sparkSession.createDataFrame(
      Thresholds.map(Tuple1.apply)).toDF("threshold")
    counts.join(broadcast(th), col("n_correct") >= col("threshold"))
      .select("user_id", "threshold", "latest_attempt")
  }

  /** USER_NOTIFICATIONS_STREAM — the final stage of the reference's declared
    * stream graph (config.properties:10-14), never wired in its topology:
    * one user-facing notification per crossed threshold.
    */
  def notifications(events: DataFrame): DataFrame =
    crossings(events)
      .withColumn("notification",
        concat(lit("Achievement unlocked: "), col("threshold"),
          lit(" questions answered correctly")))
      .select("user_id", "threshold", "notification", "latest_attempt")

  /** S6 — micro-batch sink in the reference's Processor shape; parquet
    * stands in for the JDBC upsert target. The upsert is naturally
    * replay-idempotent (ON CONFLICT re-applies the same row); the parquet
    * stand-in gets the same property by landing each batch under its own
    * `batch_id=` partition with dynamic partition overwrite, so a
    * checkpoint replay overwrites its own rows instead of appending
    * duplicates.
    *
    * Layout migration note: the partitioned layout is incompatible with a
    * sink directory still holding the pre-r13 FLAT append-mode files —
    * mixed partitioned/unpartitioned parquet under one root breaks
    * partition discovery on read. Point fresh sinks at empty directories;
    * migrate an existing flat sink by rewriting its rows under a
    * `batch_id=-1` partition (or clearing it) before upgrading.
    */
  def sinkToParquet(spark: SparkSession, df: DataFrame, path: String,
                    batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  // ---- streaming exactly-once crossing detection ----

  case class AchState(count: Long, lastThreshold: Long, latestUs: Long)
  case class CrossingOut(user_id: Long, threshold: Long, latest_attempt_us: Long)

  /** Per-micro-batch crossing detector: GroupState keeps (running correct
    * count, highest threshold already announced, latest attempt); each batch
    * emits one row per NEWLY crossed threshold. This is the reference's
    * insert-per-crossing semantics (ThresholdAchievedProcessor.java:78-97) —
    * which an Update-mode aggregate cannot express, since it re-emits the
    * whole row on every count change rather than once per crossing.
    */
  def detectCrossings(uid: Long, rows: Iterator[(Long, Long)],
                      state: org.apache.spark.sql.streaming.GroupState[AchState]): Iterator[CrossingOut] = {
    val prev = state.getOption.getOrElse(AchState(0L, 0L, Long.MinValue))
    var cnt = prev.count
    var latestUs = prev.latestUs
    rows.foreach { case (_, tsUs) =>
      cnt += 1
      if (tsUs > latestUs) latestUs = tsUs
    }
    val newly = Thresholds.filter(t => t > prev.lastThreshold && cnt >= t)
    state.update(AchState(cnt, newly.lastOption.getOrElse(prev.lastThreshold), latestUs))
    newly.iterator.map(t => CrossingOut(uid, t, latestUs))
  }

  /** USER_NOTIFICATIONS_STREAM in streaming: a stateless projection chained
    * onto the exactly-once crossing stream — the final stage of the
    * reference's declared graph RAW_LOG_STREAM → QPART_ATTEMPT_STREAMS →
    * … → USER_ACHIEVEMENTS_STREAM → USER_NOTIFICATIONS_STREAM
    * (config.properties:10-14), end-to-end.
    */
  def notificationsStreaming(spark: SparkSession, events: DataFrame): DataFrame =
    crossingsStreaming(spark, events)
      .withColumn("notification",
        concat(lit("Achievement unlocked: "), col("threshold"),
          lit(" questions answered correctly")))

  /** Streaming (or batch — state starts empty, yielding exactly the batch
    * `crossings`) wiring of the detector over correct question attempts.
    */
  def crossingsStreaming(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val ds = Ingest.questionAttempts(events)
      .filter(col("correct"))
      .select(col("user_id").cast("long"), unix_micros(col("ts")))
      .as[(Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(detectCrossings)
      .toDF()
  }
}
