package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A6 + J2 + completion — the reference's flagship pipeline: per-(user,
  * question-page) part-attempt rollup and question-completion detection
  * (DerivedStreams.java:119-246 + AugmentedQuestionDetailMapper.java:60-89).
  *
  * The reference mutates a JSON array of per-part counters record-by-record;
  * the Spark-first re-expression is a two-level aggregation (the shape the
  * reference's own dead code sketches, DerivedStreams.java:228-237):
  *   level 1: groupBy(user, page, part)  -> correct-attempt count, latest ts
  *   level 2: groupBy(user, page)        -> parts attempted/correct, latest ts
  * then a broadcast join against the question-metadata dimension and
  * `complete = parts_correct == question_part_count` (the reference treats a
  * missing question as part-count "size mismatch" → incomplete —
  * AugmentedQuestionDetailMapper.java:63-68,124-133).
  *
  * Scale: both aggregations shuffle on prefixes of the same key set
  * (user_id, q_page[, q_part]), so AQE/EnsureRequirements reuses the
  * partitioning for level 2 — one wide shuffle total, plus a broadcast.
  */
object Questions {

  /** Level-1 rollup: one row per (user, page, part). */
  def partRollup(events: DataFrame): DataFrame =
    Ingest.questionAttempts(events)
      .groupBy("user_id", "q_page", "q_part")
      .agg(
        count(lit(1)).as("n_attempts"),
        count(when(col("correct"), 1)).as("n_correct"),
        max(when(col("correct"), col("ts"))).as("latest_correct"),
        max("ts").as("latest_attempt"))

  /** Level-2 rollup: one row per (user, page), with the per-part detail kept
    * as a deterministically-sorted array (the reference's
    * `partAttemptsCorrect` array, DerivedStreams.java:193-216).
    */
  def pageRollup(events: DataFrame): DataFrame =
    partRollup(events)
      .groupBy("user_id", "q_page")
      .agg(
        count(lit(1)).as("parts_attempted"),
        count(when(col("n_correct") > 0, 1)).as("parts_correct"),
        sum("n_attempts").as("total_attempts"),
        max("latest_attempt").as("latest_attempt"),
        sort_array(collect_list(struct(
          col("q_part"),
          col("n_correct").as("correct_attempt_count")))).as("part_attempts"))

  /** Completion detection: join the question dimension (J2) and compare
    * distinct-correct-parts against the page's part count.
    */
  def completion(events: DataFrame, part: DataFrame): DataFrame =
    pageRollup(events)
      .join(broadcast(Enrich.questionMeta(part)), Seq("q_page"), "left")
      .withColumn("question_part_count", coalesce(col("question_part_count"), lit(0L)))
      .withColumn(
        "complete",
        col("question_part_count") > 0 && col("parts_correct") === col("question_part_count"))
      .select("user_id", "q_page", "parts_attempted", "parts_correct", "total_attempts",
        "latest_attempt", "question_part_count", "complete")
}
