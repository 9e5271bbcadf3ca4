package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.functions.Exact

/** A5 — activity-streak sessionization (DerivedStreams.java:63-117).
  *
  * The reference folds per-user events in arrival order, resetting the streak
  * when the gap since the last event exceeds a threshold (literally 8 seconds
  * in the reference despite the "weekly" naming — DerivedStreams.java:92-94),
  * and reports streak length as seconds / 7 (DerivedStreams.java:111-113).
  *
  * Spark-first formulation: `session_window(ts, gap)` — order-free, merges in
  * the state store, and identical to the reference's fold when events are
  * processed in event-time order. Gap and length divisor are parameters
  * (SURVEY §7.5.5): callers pick the literal 8s/÷7 for parity or sane values.
  *
  * Boundary semantics: a session breaks only when the gap is STRICTLY greater
  * than the threshold (Spark merges windows that touch at exactly the gap),
  * which matches the reference's `convertedTime > STREAK_THRESHOLD` check.
  *
  * Scale: one shuffle by user_id; session merging is per-key and streaming-
  * compatible (same code path works under `readStream` with a watermark).
  */
object Streaks {

  /** Batch/streaming sessionization. Output: one row per (user, session) with
    * exact integer streak length `streak_units` = floor(duration_sec / unitDivisor).
    */
  def sessions(events: DataFrame, gap: String = "4 hours", unitDivisor: Int = 7): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(min("ts").as("streak_start"), max("ts").as("streak_end"), count(lit(1)).as("n_events"))
      .withColumn(
        "streak_units",
        expr(s"((unix_micros(streak_end) - unix_micros(streak_start)) div 1000000) div $unitDivisor"))
      .select("user_id", "streak_start", "streak_end", "n_events", "streak_units")

  // ---- exact-fold parity variant (flatMapGroupsWithState-shaped) ----

  case class StreakState(startUs: Long, endUs: Long, n: Long)
  case class StreakOut(user_id: Long, streak_start_us: Long, streak_end_us: Long,
                       n_events: Long, streak_units: Long)

  /** The reference's literal per-key fold, for streaming Update-mode use and
    * as a differential check on `sessions`. Processes each user's events in
    * event-time order; emits every closed session plus the open one.
    */
  def foldSessions(spark: SparkSession, events: DataFrame,
                   gapSeconds: Long = 4 * 3600, unitDivisor: Int = 7): DataFrame = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val ds: Dataset[(Long, Long)] = events
      .select(col("user_id").cast("long"), unix_micros(col("ts")))
      .as[(Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long)]) =>
        val times = it.map(_._2).toArray.sorted
        val out = scala.collection.mutable.ArrayBuffer.empty[StreakOut]
        var st: Option[StreakState] = None
        times.foreach { t =>
          st = st match {
            case Some(s) if t - s.endUs <= gapUs => Some(StreakState(s.startUs, t, s.n + 1))
            case Some(s) =>
              out += StreakOut(uid, s.startUs, s.endUs, s.n,
                ((s.endUs - s.startUs) / 1000000L) / unitDivisor)
              Some(StreakState(t, t, 1))
            case None => Some(StreakState(t, t, 1))
          }
        }
        st.foreach(s => out += StreakOut(uid, s.startUs, s.endUs, s.n,
          ((s.endUs - s.startUs) / 1000000L) / unitDivisor))
        out.iterator
      }
      .toDF()
  }

  /** Streaming-native stateful fold for Update mode: keeps the open streak
    * per user in `GroupState`, emitting the current streak on every batch —
    * the changelog behavior of the reference's state store ("userStreaks",
    * DerivedStreams.java:108). Used by streaming.Topology.
    */
  def updateStreak(gapUs: Long)(
      uid: Long, rows: Iterator[(Long, Long)], state: GroupState[StreakState]): StreakOut = {
    val times = rows.map(_._2).toArray.sorted
    var s = state.getOption.getOrElse(StreakState(Long.MinValue, Long.MinValue, 0))
    times.foreach { t =>
      s = if (s.n == 0) StreakState(t, t, 1)
          else if (t - s.endUs <= gapUs) StreakState(s.startUs, math.max(s.endUs, t), s.n + 1)
          else StreakState(t, t, 1)
    }
    state.update(s)
    StreakOut(uid, s.startUs, s.endUs, s.n, ((s.endUs - s.startUs) / 1000000L) / 7)
  }
}
