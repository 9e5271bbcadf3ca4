package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact

/** Time-series similarity search over user activity — "which users behave
  * alike over time" (cohorting, anomaly triage, account-sharing signals).
  * The reference's domain keys everything by user; this is the behavioral
  * companion of the embedding-space operators, built on the events table.
  *
  * Candidate generation is the SAX recipe (Lin et al.; the EDBT'19
  * streaming-similarity line in PAPERS.md follows the same
  * sketch-then-verify shape): each user's fixed-length daily activity
  * vector reduces to a PAA summary (per-segment means), discretizes to a
  * small alphabet, and only users sharing the resulting WORD are compared
  * exactly — groupBy(word) is the bucketing, exactly the LSH/IVF posture
  * the dedup and ANN families use, never O(n²). All arithmetic is integer
  * fixed point (counts, ×100 segment means, min-max levels, squared
  * distances), so results hash-match the SQL twin.
  *
  * Scale: the per-user fold is one groupBy(user, day) + one groupBy(user);
  * buckets are Zipf-prone like every hash family here (a corpus-wide
  * "inactive" word is the hot key) — the established maxBucket
  * hash-sharding guard applies unchanged; PAA/SAX constants are corpus
  * knobs (more segments / bigger alphabet = finer buckets).
  */
object TimeSeries {

  /** Series length (days), PAA segment count, and discretization alphabet —
    * interpolated into the DuckDB oracle so the two sides cannot diverge.
    * 30 days / 6 segments of 5 matches the testdata's January span; at
    * other horizons these are the sizing knobs.
    */
  val TsDays = 30
  val TsSegs = 6
  val SegLen: Int = TsDays / TsSegs
  val Alphabet = 4

  /** Per-user daily activity vector: `v[d]` = events on day `d` counted
    * from the corpus's first day, fixed length [[TsDays]] with silent days
    * as zeros. One (user, day) aggregation, then one per-user fold into the
    * array (map assembly — collect order cannot matter).
    */
  def activityVectors(events: DataFrame): DataFrame = {
    val day0 = events.agg(min(to_date(col("ts"))).as("day0"))
    events
      .crossJoin(broadcast(day0))
      .select(col("user_id"),
        datediff(to_date(col("ts")), col("day0")).cast("long").as("day_idx"))
      .filter(col("day_idx") >= 0 && col("day_idx") < TsDays)
      .groupBy("user_id", "day_idx").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("day_idx"), col("cnt")))).as("m"))
      .select(col("user_id"),
        expr(s"transform(sequence(0L, ${TsDays - 1}L), d -> coalesce(element_at(m, d), 0L))")
          .as("v"))
  }

  /** PAA + SAX word per user: per-segment mean in ×100 fixed point, then
    * min-max discretization to [[Alphabet]] levels (0..Alphabet-1; a flat
    * series maps to all-zero levels). The word is the bucket key.
    */
  def saxWords(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("paa", expr(
        s"""transform(sequence(0, ${TsSegs - 1}),
           |  s -> (aggregate(slice(v, s * $SegLen + 1, $SegLen), 0L,
           |          (acc, x) -> acc + x) * 100) div $SegLen)""".stripMargin))
      .withColumn("mn", array_min(col("paa")))
      .withColumn("mx", array_max(col("paa")))
      .withColumn("word", concat_ws("", expr(
        s"transform(paa, p -> CAST(((p - mn) * $Alphabet) div (mx - mn + 1) AS STRING))")))
      .select("user_id", "v", "word")

  /** Top-1 behavioral neighbor per user: exact squared distance on the raw
    * daily vectors, compared only within SAX buckets — the shared
    * [[Similarity.bucketedTop1Neighbor]] kernel pipeline keyed by the SAX
    * word (winners-only; pair rows never materialize). Output (user_id,
    * neighbor_id, dist); ties break toward the smaller neighbor id.
    * `maxBucket` is the hot-bucket guard for the corpus-wide hot word (the
    * all-inactive cohort) — default ON here, unlike the ad-hoc embedding
    * operators: the gather-based kernel plan makes an unguarded hot
    * bucket a single Θ(hot²·dims) task with the 2 GB collect_list row as
    * its cliff, and user-behavior corpora reliably have an inactive
    * cohort. The adaptive [[Similarity.anyBucketOver]] gate keeps the
    * plain single-gather plan (one counts probe of overhead) until a
    * bucket actually exceeds the cap; results are identical either way.
    */
  def tsTopNeighbor(events: DataFrame,
                    maxBucket: Int = Similarity.MaxBucket): DataFrame =
    Similarity.bucketedTop1Neighbor(
      saxWords(activityVectors(events)), "word", "user_id", "v", maxBucket)

  /** Fixed-interval downsampling with OHLC semantics: per (event_type,
    * hour) — count, exact DECIMAL-routed sum, min/max (raw pass-through,
    * no float accumulation), and open/close picked by a TOTAL order
    * (`ts, event_id` — `min_by`-style tie behavior is engine-defined, a
    * row_number over a total order is not). The time-series family's
    * "resample" verb: the raw stream is too fine to train on or plot;
    * this is the one-pass reduction to a fixed grid.
    *
    * Plan shape: both row_numbers share one hash partitioning on the
    * grouping key (two sorts, ONE exchange — the second window and the
    * final hash aggregation reuse the first's partitioning), so the whole
    * operator is one shuffle of (key, value, ts, id) tuples — at 100 TB
    * the map side carries nothing but the grouping columns.
    */
  def resampleOhlc(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("h", date_trunc("hour", col("ts")))
    val part = Window.partitionBy(col("event_type"), col("h"))
    val asc = part.orderBy(col("ts").asc, col("event_id").asc)
    val desc = part.orderBy(col("ts").desc, col("event_id").desc)
    keyed
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("event_type", "h")
      .agg(
        count(lit(1)).as("n_events"),
        Exact.moneySum(col("value")).as("sum_value"),
        min("value").as("low_value"),
        max("value").as("high_value"),
        max(when(col("rn_a") === 1, col("value"))).as("open_value"),
        max(when(col("rn_d") === 1, col("value"))).as("close_value"))
  }

  /** Streaming form of [[resampleOhlc]]: watermarked tumbling-hour
    * aggregation. A streaming agg cannot rank within the hour, so
    * open/close come from `min_by`/`max_by` over the (ts, event_id)
    * struct — a TOTAL order (event ids are unique), so the pick is
    * deterministic and equal to the batch row_number formulation
    * regardless of arrival order across micro-batches (StreamingSpec
    * asserts the differential with out-of-order feeds). State is one row
    * per (event_type, hour) window, expired by the watermark — bounded
    * regardless of stream length.
    */
  def resampleOhlcStreaming(events: DataFrame,
                            watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.moneySum(col("value")).as("sum_value"),
        min("value").as("low_value"),
        max("value").as("high_value"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open_value"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close_value"))
      .select(col("event_type"), col("window.start").as("h"),
        col("n_events"), col("sum_value"), col("low_value"),
        col("high_value"), col("open_value"), col("close_value"))

  /** Series-key cohort width for [[gapfillHourly]] — interpolated into the
    * DuckDB oracle so grid shapes cannot diverge.
    */
  val GapfillCohorts = 23

  /** Hourly grid + forward-fill: every (cohort, event_type) series gets
    * one row per hour of the corpus span; silent hours carry `n_events=0`
    * and the LAST observed hourly sum (`last(..., ignoreNulls)` over a
    * running frame — hours before a series' first observation stay null).
    * This is the gap-fill / LOCF resample a feature pipeline runs before
    * windowed training joins: downstream as-of logic needs a dense grid.
    *
    * Scale: the grid is GENERATED (|series| × horizon rows from a
    * broadcast 1-row span — never shuffled into existence), the hourly
    * reduction is one shuffle, the grid join and fill window both hash on
    * the series key. Horizon × |series| bounds the output; the raw corpus
    * never re-shuffles.
    */
  def gapfillHourly(events: DataFrame, cohorts: Int = GapfillCohorts): DataFrame = {
    val keyed = events
      .withColumn("cohort", col("user_id") % cohorts)
      .withColumn("h", date_trunc("hour", col("ts")))
    val hourly = keyed.groupBy("cohort", "event_type", "h")
      .agg(count(lit(1)).as("n_obs"), Exact.moneySum(col("value")).as("sum_value"))
    // span and series derive from the HOURLY aggregate, not the raw
    // corpus: date_trunc preserves min/max and a series with zero events
    // has no grid either way. Catalyst COLLAPSES these agg-of-agg trees
    // into direct aggregations over column-pruned scans ((user_id,
    // event_type) / (ts) only), so the plan is three narrow map-side
    // passes whose exchanges all carry aggregated partials — raw rows
    // never cross the network (PlanSpec pins that shape)
    val span = hourly.agg(min("h").as("h0"), max("h").as("h1"))
    val grid = hourly.select("cohort", "event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("cohort"), col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val fill = Window.partitionBy(col("cohort"), col("event_type"))
      .orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("cohort", "event_type", "h"), "left")
      .select(col("cohort"), col("event_type"), col("h"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        last(col("sum_value"), ignoreNulls = true).over(fill).as("filled_sum"))
  }

  /** Rolling 24-hour window features over the hourly series — the
    * feature-engineering verb a training pipeline runs after
    * [[resampleOhlc]]-style downsampling: trailing count/sum/min/max and
    * an exact integer trailing mean, plus the hour-over-observed-hour
    * count delta. The frame is a RANGE frame over the integer hour index
    * (`epoch_us div 3.6e9`), so silent hours genuinely age out of the
    * window — a ROWS frame would silently stretch the trailing day over
    * gaps. The trailing mean is integer micros (`cents*100 div n`) and
    * the trailing sum accumulates as DECIMAL end-to-end, cast to double
    * once — both bit-identical in the oracle; `delta_n` is a row LAG
    * (previous OBSERVED hour, null at each series head) by contract.
    *
    * Shape: one hourly reduction (the only corpus-sized exchange), then
    * one series-keyed window partitioning shared by the range frame and
    * the lag — hourly cardinality is |series| x horizon regardless of
    * corpus size, so at 100 TB everything after the first agg is
    * metadata-scale.
    */
  def rollingFeatures(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("h", date_trunc("hour", col("ts")))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("sum_dec"),
        min("value").as("min_v"), max("value").as("max_v"))
      .withColumn("hr", expr("unix_micros(h) div 3600000000"))
    val part = Window.partitionBy(col("event_type"))
    val frame = part.orderBy(col("hr")).rangeBetween(-23, 0)
    val seq = part.orderBy(col("hr"))
    hourly
      .withColumn("roll_n", sum(col("n_events")).over(frame))
      .withColumn("roll_cents",
        (sum(col("sum_dec")).over(frame) * lit(10000)).cast("long"))
      .select(col("event_type"), col("h"), col("n_events"),
        col("roll_n"),
        (col("roll_cents").cast("double") / 10000.0).as("roll_sum"),
        min(col("min_v")).over(frame).as("roll_min"),
        max(col("max_v")).over(frame).as("roll_max"),
        // FLOOR division, not Spark's truncate-toward-zero `div`: the
        // DuckDB twin's `//` floors, and a negative trailing sum (values
        // are unconstrained — the histogram family clamps, this one does
        // not) would otherwise differ by 1 exactly on the negative rows.
        // pmod is non-negative for the positive divisor roll_n, so
        // subtracting it makes the quotient exact and `div` = floor.
        expr("(roll_cents * 100 - pmod(roll_cents * 100, roll_n)) div roll_n")
          .as("roll_mean_micros"),
        (col("n_events") - lag(col("n_events"), 1).over(seq)).as("delta_n"))
  }

  /** MAD outlier detection on the hourly count series: an hour is
    * anomalous when its count deviates from the per-series median by
    * more than 3 median-absolute-deviations. All arithmetic is exact
    * integer — medians of integer counts land on halves, so the median
    * is carried x2 (`med2`) and the MAD x4 (`mad4 = 2*median(|2n-med2|)`)
    * and the 3-sigma-equivalent test `|n-med| > 3*MAD` becomes
    * `2*|2n-med2| > 3*mad4`, identical in the oracle's `quantile_cont`.
    * A constant series has `mad4 = 0` and flags every deviating hour —
    * the conventional MAD degeneracy, deterministic on both engines.
    *
    * Shape: one corpus-sized hourly reduction; both median passes
    * aggregate the |series|-sized hourly frame to one row per series and
    * join back broadcast — the raw corpus is scanned once, and nothing
    * after the first agg scales with data volume.
    */
  def hourlyAnomalies(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("h", date_trunc("hour", col("ts")))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n_events"))
    val med = hourly.groupBy("event_type")
      .agg(expr("cast(2 * percentile(n_events, 0.5D) as bigint)").as("med2"))
    val dev = hourly.join(broadcast(med), "event_type")
      .withColumn("d", abs(lit(2) * col("n_events") - col("med2")))
    val mad = dev.groupBy("event_type")
      .agg(expr("cast(2 * percentile(d, 0.5D) as bigint)").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .filter(lit(2) * col("d") > lit(3) * col("mad4"))
      .select(col("event_type"), col("h"), col("n_events"),
        col("med2"), col("mad4"))
  }
}
