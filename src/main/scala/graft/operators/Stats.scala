package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Continuous keyed aggregations (reference §2.4: A2 last-seen, A3 global
  * event-type counts, A4 daily per-role per-type counts —
  * LoggedEventsListener.java:138-224).
  *
  * All are single-shuffle hash aggregations with map-side partial
  * aggregation; at 100 TB the shuffle carries only (key, partial) pairs whose
  * cardinality is bounded by |users| × |event types|, not by row count.
  */
object Stats {

  /** A2 — per-user last-seen time per event type, plus the reference's
    * synthetic "OVERALL" row (LoggedEventsListener.java:148-156). Emitted
    * flat (one row per user × type); `lastSeenMap` reshapes to the
    * reference's map form.
    */
  def lastSeen(events: DataFrame): DataFrame = {
    val perType = events
      .groupBy("user_id", "event_type")
      .agg(max("ts").as("last_seen"))
    // OVERALL = max over the per-type rows (identical result), NOT a second
    // aggregation over raw events: the union's branches then share one scan
    // and one wide shuffle (ReusedExchange), and the second aggregate reads
    // |users|x|types| rows instead of the fact table again
    val overall = perType
      .groupBy("user_id")
      .agg(max("last_seen").as("last_seen"))
      .withColumn("event_type", lit("OVERALL"))
      .select("user_id", "event_type", "last_seen")
    perType.unionByName(overall)
  }

  /** A2, streaming-safe form: a single aggregation (streaming queries cannot
    * union two aggregations); the OVERALL row is derived downstream (it is
    * the max over the per-type rows, see `lastSeen`).
    */
  def lastSeenPerType(events: DataFrame): DataFrame =
    events.groupBy("user_id", "event_type").agg(max("ts").as("last_seen"))

  case class LastSeenState(lastUs: Long)
  case class LastSeenTtlOut(user_id: Long, event_type: String, last_seen_us: Long)

  /** A2 with bounded state (SURVEY §7.5.2): the reference keeps every
    * (user, type) key forever (LoggedEventsListener.java:148-156); a 100 TB
    * deployment cannot. A plain streaming aggregation's state is NOT evicted
    * by a watermark (the group key carries no window), so the bounded form is
    * a per-key fold with an event-time timeout: a key idle for `ttl` past the
    * watermark is dropped from the store. Same output schema/rows as
    * `lastSeenPerType` while a key is live; state size is O(active keys).
    */
  def lastSeenPerTypeTtl(events: DataFrame, ttl: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // ts itself rides along untouched: the event-time-timeout checker
    // requires the watermarked attribute in the fmgws input's output set
    val ds = events
      .withWatermark("ts", ttl)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, java.sql.Timestamp, Long)]
    ds.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
         state: GroupState[LastSeenState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
            rows.foreach(r => if (r._4 > last) last = r._4)
            state.update(LastSeenState(last))
            state.setTimeoutTimestamp(last / 1000L, ttl)
            Iterator.single(LastSeenTtlOut(key._1, key._2, last))
          }
      }
      .toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("last_seen_us")).as("last_seen"))
  }

  /** A2 (map shape) — event_type -> last-seen epoch-micros map per user,
    * the literal reference state-store layout. Map column ordering is
    * engine-dependent, so this shape is test-only (oracle uses the flat
    * shape above).
    */
  def lastSeenMap(events: DataFrame): DataFrame =
    lastSeen(events)
      .groupBy("user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), Exact.epochUs(col("last_seen")).as("us")))))
        .as("last_seen_by_type"))

  /** A3 — global running count per event type
    * (LoggedEventsListener.java:165-172). The re-key `map` of the reference
    * is just the groupBy key here; Spark shuffles on it implicitly.
    */
  def eventTypeCounts(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count(lit(1)).as("n"))

  /** A4 — daily per-role per-event-type counts
    * (LoggedEventsListener.java:177-224). P5's manual Calendar truncation
    * becomes `date_trunc`; the nested map reshape is left to the sink —
    * the flat (day, role, type, n) relation is the scalable form.
    */
  def dailyRoleCounts(events: DataFrame, customer: DataFrame): DataFrame =
    Enrich.enriched(events, customer)
      .groupBy(
        date_trunc("day", col("ts")).as("day"),
        col("user_role"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** A4 (nested map shape) — the reference's literal state-store layout:
    * day -> role -> (event_type -> count), built with map_from_entries over
    * the flat relation. Map-valued output is for sinks/tests; the flat
    * relation above is the scalable, oracle-comparable form.
    */
  def dailyRoleCountsNested(events: DataFrame, customer: DataFrame): DataFrame =
    dailyRoleCounts(events, customer)
      .groupBy("day", "user_role")
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
        .as("type_counts"))
      .groupBy("day")
      .agg(map_from_entries(collect_list(struct(col("user_role"), col("type_counts"))))
        .as("role_type_counts"))

  /** ROLLUP totals (added surface — grouping sets are absent in the
    * reference, SURVEY §2.4): per (role, type), per role, and grand total,
    * with null grouping slots coalesced to 'ALL' so ordering is
    * engine-agnostic (null sort order differs between engines).
    */
  def roleTypeRollup(events: DataFrame, customer: DataFrame): DataFrame = {
    // via the SQL surface: resolving the coalesced grouping columns through
    // the Dataset API trips the ambiguous-self-join detector on the
    // rollup's Expand output; GROUP BY ROLLUP has no such problem
    val spark = events.sparkSession
    events.createOrReplaceTempView("rollup_events_v")
    customer.createOrReplaceTempView("rollup_customer_v")
    spark.sql(
      """SELECT coalesce(c_mktsegment, 'ALL') AS user_role,
        |  coalesce(event_type, 'ALL') AS event_type, count(*) AS n
        |FROM rollup_events_v e JOIN rollup_customer_v c ON e.user_id = c.c_custkey
        |GROUP BY ROLLUP (c_mktsegment, event_type)""".stripMargin)
  }

  /** Hopping-window counts (added windowing surface; the reference only has
    * tumbling-day and session windows): 1-day windows sliding every 12h —
    * each event lands in exactly two windows.
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"))

  /** Analytic lag window (added surface): per event, microseconds since the
    * user's previous event — the inter-arrival deltas the streak operator
    * summarizes, exposed row-level. Exact integer output.
    */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("delta_us"))
  }

  /** Added analytic surface (reference has none — SURVEY §2.6): top-k per
    * group via ranking window. Top spenders per market segment by exact
    * purchase total.
    */
  def topSpendersPerSegment(events: DataFrame, customer: DataFrame, k: Int): DataFrame = {
    val spend = Enrich.enriched(Ingest.filterByEventType(events, "purchase"), customer)
      .groupBy("user_role", "user_id")
      .agg(Exact.moneySum(col("value")).as("total_spend"), count(lit(1)).as("n_purchases"))
    val w = Window.partitionBy("user_role").orderBy(col("total_spend").desc, col("user_id").asc)
    spend
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("user_role", "rank", "user_id", "total_spend", "n_purchases")
  }

  /** Approximate analytics (the sketch tier a 100 TB engine needs when
    * exact distinct/quantiles would shuffle too much): HyperLogLog++
    * distinct users per event type and approximate value percentiles per
    * segment. Sketches are mergeable, so both are single-shuffle with
    * map-side partial sketches. Approximate by nature → verified by
    * tolerance tests against the exact forms, not the hash oracle.
    */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))

  def approxSpendPercentiles(events: DataFrame, customer: DataFrame): DataFrame =
    Enrich.enriched(Ingest.filterByEventType(events, "purchase"), customer)
      .groupBy("user_role")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
        lit(10000)).as("p50_p95_p99"))

  /** Distribution windows (ntile / cume_dist) over the same per-segment
    * spend: quartile assignment and cumulative-distribution percentile per
    * user. cume_dist is an exact rational k/n — identical double division on
    * both engines — surfaced as an integer percentage per the determinism
    * contract. Total tie-break (spend desc, user_id asc) makes ntile
    * assignment unambiguous.
    */
  def spendQuartiles(events: DataFrame, customer: DataFrame): DataFrame = {
    val spend = Enrich.enriched(Ingest.filterByEventType(events, "purchase"), customer)
      .groupBy("user_role", "user_id")
      .agg(Exact.moneySum(col("value")).as("total_spend"), count(lit(1)).as("n_purchases"))
    val w = Window.partitionBy("user_role").orderBy(col("total_spend").desc, col("user_id").asc)
    spend
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("cume_pct", floor(cume_dist().over(w) * 100).cast("long"))
      .select("user_role", "user_id", "total_spend", "n_purchases", "quartile", "cume_pct")
  }

  /** Ordered-funnel analysis: per user, the earliest time each step in
    * `steps` completes STRICTLY AFTER the previous step's completion (the
    * product-analytics "did signup → view → click → purchase, in order"
    * question; an out-of-order occurrence doesn't count — a purchase
    * before the first view completes no funnel). Emits one row per user
    * who entered step 1: the step timestamps (null once the funnel
    * stalls) and the reached depth.
    *
    * Shape: ONE corpus scan and ONE user-keyed exchange. The sequential-
    * min recurrence t_k = min{ts : type = step_k, ts > t_{k−1}} is a
    * stack of UNORDERED user-partition windows — each step's window min
    * references the previous step's window column, so all k levels ride
    * the same partitioning with no sort and no join — followed by a
    * per-user dedup aggregate on that same partitioning. (The r20 form
    * ran one filtered corpus scan + strict-inequality join + min-agg +
    * join-back PER step: k corpus scans and ~3k exchanges, 13 jobs at
    * k = 4; this shape measured it to one scan / one exchange with
    * identical rows.) Ties in event time break toward NOT completing
    * (strict `>`, null-propagating through an unset t_{k−1}),
    * identically in the oracle; only users who entered step 1 emit.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    val types = steps.toSet.toSeq
    val withSteps = steps.zipWithIndex.foldLeft(
      events.filter(col("event_type").isin(types: _*))
        .select("user_id", "event_type", "ts")) { case (acc, (st, i)) =>
      val cond =
        if (i == 0) col("event_type") === st
        else col("event_type") === st && col("ts") > col(s"t$i")
      acc.withColumn(s"t${i + 1}", min(when(cond, col("ts"))).over(w))
    }
    withSteps
      .filter(col("t1").isNotNull)
      .groupBy("user_id")
      .agg(max("t1").as("t1"),
        steps.indices.tail.map(i => max(s"t${i + 1}").as(s"t${i + 1}")): _*)
      .withColumn("depth",
        steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
  }

  /** Weekly cohort retention: users cohorted by signup week, one row per
    * (cohort_week, week_offset) with the distinct-active count, the
    * cohort size and the exact integer retention ppm — the companion
    * readout to [[funnel]]. Week offsets are day-difference div 7 over
    * week-TRUNCATED stamps (identical integer arithmetic in the oracle;
    * `date_diff('week', …)` counts boundary crossings differently per
    * engine and is avoided). Activity BEFORE the cohort week is dropped.
    *
    * Shape: the cohort map is a user-keyed min-agg; activity joins it on
    * user (broadcast at dimension scale, hash otherwise), then one
    * distinct + one count-agg per (cohort, offset) — cohort-sized
    * output, event-scan input, nothing per-user materializes.
    */
  def cohortRetention(events: DataFrame,
                      entryType: String = "signup"): DataFrame = {
    val cohort = events.filter(col("event_type") === entryType)
      .groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("w0"))
    val sizes = cohort.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
    val active = events
      .join(cohort, "user_id")
      .withColumn("wk",
        expr("datediff(date_trunc('week', ts), w0) div 7"))
      .filter(col("wk") >= 0)
      .select("user_id", "w0", "wk").distinct()
      .groupBy("w0", "wk").agg(count(lit(1)).as("n_active"))
    active.join(sizes, "w0")
      .select(col("w0").as("cohort_week"),
        col("wk").cast("long").as("week_offset"),
        col("n_active"), col("n_cohort"),
        expr("(n_active * 1000000L) div n_cohort").as("retained_ppm"))
  }

  /** Basket width cap for [[cooccurrence]] — interpolated into the DuckDB
    * oracle so both engines drop the same baskets.
    */
  val CooccurCap = 4

  /** In-basket ordered-pair generation over a sorted `types` array — ONE
    * definition shared by [[cooccurrence]] and [[cooccurrenceStreaming]]
    * so the twins cannot drift (the batch/stream equality the spec pins
    * is structural, not coincidental).
    */
  private val BasketPairsExpr =
    """flatten(transform(types, (a, i) ->
      |  transform(slice(types, i + 2, size(types)), b ->
      |    struct(a AS type_a, b AS type_b))))""".stripMargin

  /** Event-type co-occurrence over (user, day) baskets: how often two
    * event types appear in the same user-day, with the distinct-user
    * reach per pair — the market-basket / affinity readout next to
    * [[funnel]]. Baskets wider than `cap` distinct types are DROPPED
    * before pairing (the hub-cap guard): pair fan-out is quadratic in
    * basket width, and at 100 TB a bot account touching every item class
    * every day is exactly the row that would explode the join — capping
    * is the standard a-priori hygiene step and the cap is part of the
    * operator's contract (same filter in the oracle).
    *
    * Shape: ONE corpus-sized exchange — `collect_set` per (user, day)
    * basket, deduping map-side in the partial aggregate — then the pair
    * list is generated INSIDE each basket row with an array transform
    * (sorted set → ordered pairs, fan-out bounded at cap(cap-1)/2), so
    * there is no self-join, no window, and no second pass over the
    * corpus; the closing pair-keyed agg is |types|² at most. (The
    * obvious distinct + window + self-join formulation costs two
    * corpus-sized exchanges plus a join for the same answer.) The
    * per-basket set is bounded by the event-type vocabulary, so the
    * aggregation state cannot skew with a hot user's event volume.
    */
  def cooccurrence(events: DataFrame, cap: Int = CooccurCap): DataFrame = {
    // epoch-aligned day bucket (floor of unix micros to 86,400 s), NOT
    // date_trunc: date_trunc truncates in the session timezone while the
    // streaming twin's `window(ts, '1 day')` is epoch/UTC-aligned — under
    // any non-UTC session timezone the two would assign events near local
    // midnight to different baskets. The epoch form makes the twins'
    // basket equality a property of the code, not of a config pin (all
    // repo entry points do pin UTC, under which the two are identical).
    val baskets = events
      .select(col("user_id"),
        timestamp_micros(unix_micros(col("ts"))
          - pmod(unix_micros(col("ts")), lit(86400000000L))).as("dy"),
        col("event_type"))
      .groupBy("user_id", "dy")
      .agg(array_sort(collect_set(col("event_type"))).as("types"))
      .filter(size(col("types")) <= cap)
    baskets
      .select(col("user_id"), explode(expr(BasketPairsExpr)).as("p"))
      .select(col("user_id"), col("p.type_a").as("type_a"),
        col("p.type_b").as("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("pair_count"),
        countDistinct(col("user_id")).as("user_count"))
  }

  /** STREAMING twin of [[cooccurrence]]'s basket-pair stream: the (user,
    * day-window) basket aggregates under a watermark and emits ONCE when
    * the day closes (Append), the hub cap drops wide baskets exactly as
    * the batch form does, and the in-basket pair generation is the same
    * bounded array transform — a downstream fold (count per pair +
    * distinct users) rebuilds the batch matrix for closed days. State is
    * one ≤`cap`-element set per ACTIVE (user, day): watermark-evicted,
    * never history-sized — the same bounded-state posture as the session/
    * session twin (and the TTL transitions form); the NoTimeout
    * transitions and funnel folds instead grow with the ever-seen user
    * population — see their docs and the BehaviorStateProbe row.
    */
  def cooccurrenceStreaming(events: DataFrame, cap: Int = CooccurCap,
                            watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("dy"))
      .agg(array_sort(collect_set(col("event_type"))).as("types"))
      .filter(size(col("types")) <= cap)
      .select(col("user_id"), col("dy"),
        explode(expr(BasketPairsExpr)).as("p"))
      .select(col("user_id"), col("dy.start").as("day"),
        col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))

  /** Session gap for [[sessionStats]] in microseconds (30 minutes) —
    * interpolated into the DuckDB oracle so both engines cut identically.
    */
  val SessionGapUs = 1800L * 1000000L

  /** Gap-based sessionization with per-user session statistics: events
    * more than [[SessionGapUs]] apart start a new session (strict `>` — a
    * gap of exactly 30 min stays in-session, identically in the oracle);
    * per user, the session count, bounce count (single-event sessions),
    * total events, widest session, and summed session duration. The
    * engagement readout next to [[funnel]]/[[cohortRetention]] — and the
    * BATCH twin of the reference's 8 s streak fold
    * ([[Streaks]]; reference AchievementsProcessor session gap), widened
    * from "longest streak" to the full session profile.
    *
    * All time arithmetic runs on `unix_micros` longs (`epoch_us` in the
    * oracle) — no truncation to seconds, no interval types, so the
    * strict-gap comparison and the summed durations are integer-exact in
    * both engines. Order within a user is the (ts, event_id) TOTAL order:
    * same-timestamp ties cannot flip the lag.
    *
    * Shape: ONE corpus-sized exchange — the user-keyed window partition —
    * shared by the lag and the running session-id sum (same partition and
    * order, one Window chain). Both downstream aggregations are
    * post-window: the (user, session) partial agg collapses map-side
    * INSIDE the window's partitioning (every session is wholly within one
    * user partition), so only session-sized rows reach the second
    * exchange and user-sized rows the third. Nothing per-event shuffles
    * twice.
    */
  def sessionStats(events: DataFrame, gapUs: Long = SessionGapUs): DataFrame =
    sessionProfile(events, gapUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("ne") === 1, 1L).otherwise(0L)).as("bounce_sessions"),
        sum("ne").as("n_events"),
        max("ne").as("max_session_events"),
        sum("dur_us").as("total_session_us"))

  /** The per-SESSION rows under [[sessionStats]] — (user, session start/end
    * micros, event count, duration): the granularity the streaming twin
    * emits, factored so batch and stream compare row-for-row. Same single
    * user-keyed window chain; the (user, sid) partial agg still collapses
    * map-side inside the window's partitioning.
    */
  def sessionProfile(events: DataFrame, gapUs: Long = SessionGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
          .otherwise(when(lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("sid", sum("new_s").over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("ne"),
        min("us").as("start_us"), max("us").as("end_us"),
        (max("us") - min("us")).as("dur_us"))
      .drop("sid")
  }

  /** STREAMING twin of [[sessionProfile]]: `session_window` + watermark in
    * Append mode — each session row emits exactly once, when the watermark
    * passes its close (the reference is a streaming engine; the behavior
    * family's sessionization carries the same dual surface as the streak
    * family, [[Streaks.sessions]]). The strict-gap boundary agrees with
    * the batch form: a gap of exactly `gapUs` stays in-session in both
    * (session_window merges touching ranges; the batch lag breaks only on
    * `> gapUs`). State is watermark-bounded — one open session per active
    * user, closed and evicted as event time advances, so state size tracks
    * ACTIVE users, never history. Downstream, the per-user rollup of
    * [[sessionStats]] is a fold over these emitted rows.
    */
  def sessionProfileStreaming(events: DataFrame,
                              gapUs: Long = SessionGapUs,
                              watermark: String = "1 hour"): DataFrame = {
    require(gapUs % 1000000L == 0, s"gapUs must be whole seconds: $gapUs")
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapUs / 1000000L} seconds").as("sw"))
      .agg(count(lit(1)).as("ne"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("dur_us"))
      .select("user_id", "ne", "start_us", "end_us", "dur_us")
  }

  /** State for [[funnelStreaming]]: the earliest event-time (micros) at
    * which each funnel step was reached IN ORDER — `reached(i)` is the
    * batch [[funnel]]'s `t(i+1)`.
    */
  case class FunnelState(reachedUs: Seq[Long])
  case class FunnelOut(user_id: Long, depth: Long, t_depth_us: Long)

  /** Per-batch funnel fold for `flatMapGroupsWithState` (the
    * [[Achievements.detectCrossings]] state template): sorts the batch's
    * rows into event-time order and advances the per-user step vector —
    * a step counts only when its event is STRICTLY after the previous
    * step's time, the batch operator's `ts > t_prev` contract. Under
    * per-user event-time-ordered delivery (the reference's fold-order
    * guarantee, §2.8) the greedy fold equals the batch `min`-based
    * definition: the first qualifying event in time order IS the min.
    * Emits the user's current depth each batch — the Update-mode
    * changelog, exactly-once per depth change is the consumer's dedup.
    *
    * Cross-batch disorder: a row OLDER than the last reached step is
    * structurally inert — the `us > reached(d−1)` check refuses it — so
    * a late row can never falsely advance or reverse the vector; what an
    * unbuffered fold cannot recover is a late row that SHOULD have
    * counted (its depth stays unreached until a later in-order event
    * qualifies). [[funnelStreamingTtl]] is the watermark-bearing form
    * that bounds how much disorder a batch can carry.
    */
  def updateFunnel(steps: Array[String])(
      uid: Long, rows: Iterator[(Long, String, Long)],
      state: org.apache.spark.sql.streaming.GroupState[FunnelState])
      : Iterator[FunnelOut] = {
    val sorted = rows.toArray.sortBy(r => (r._3, r._1))
    var reached = state.getOption.map(_.reachedUs.toArray)
      .getOrElse(Array.empty[Long])
    sorted.foreach { case (_, et, us) =>
      val d = reached.length
      if (d < steps.length && et == steps(d) &&
          (d == 0 || us > reached(d - 1)))
        reached = reached :+ us
    }
    state.update(FunnelState(reached.toSeq))
    Iterator.single(FunnelOut(uid, reached.length.toLong,
      if (reached.nonEmpty) reached.last else Long.MinValue))
  }

  /** STREAMING funnel depth — works in batch too (state starts empty,
    * yielding exactly [[funnel]]'s depths under ordered input).
    */
  def funnelStreaming(spark: SparkSession, events: DataFrame,
                      steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val keyed = events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateFunnel(steps.toArray))
      .toDF()
  }

  /** State for [[funnelStreamingTtl]]: one OPEN attempt — the step-times
    * vector of the conversion window anchored at `reachedUs(0)`.
    */
  case class FunnelTtlState(reachedUs: Seq[Long])

  /** [[funnelStreamingTtl]]'s changelog row: one per funnel ATTEMPT —
    * `t0_us` identifies the attempt (the step-0 event time that opened
    * it), `depth`/`t_depth_us` its current progress, `closed` whether the
    * conversion window has expired (a closed attempt's row is final).
    * The per-(user, t0) last row is the attempt's answer; `closed=false`
    * rows are the Update-mode running changelog on the way there.
    */
  case class FunnelAttemptOut(user_id: Long, t0_us: Long, depth: Long,
                              t_depth_us: Long, closed: Boolean)

  /** [[funnelStreaming]] with a CONVERSION WINDOW (the funnel-analytics
    * TTL): an attempt opens at a step-0 event and only steps within
    * `ttl` of that anchor count — a later event first CLOSES the expired
    * attempt (its depths are final) and, if it is itself a step-0 event,
    * opens the user's next attempt. This is the product decision the
    * unbounded [[funnelStreaming]] doc defers: a funnel that must convert
    * within the window needs only the OPEN attempts as state.
    *
    * Determinism: a closed attempt's content (t0, depth, step times) is a
    * pure event-time function of the stream — whether the closure is
    * OBSERVED via the user's next event, via the event-time timeout, or
    * via the watermark-passed check only affects when the final row
    * emits, never what it says (the [[transitionsStreamingTtl]]
    * contract: enforce the window in the FOLD, use the timeout only as
    * state hygiene). Late rows older than the open attempt's last reached
    * step are structurally inert (the `us > reached(d−1)` check); rows
    * beyond the window close the attempt exactly as the fold defines.
    *
    * State bound: one row per OPEN attempt. An attempt opens at t0 and
    * its state evicts when the watermark (event-time max − `ttl`) passes
    * t0 + `ttl` — at most ~2×`ttl` of event time per attempt, so total
    * state is (attempt-opening rate) × ~2·ttl of ACTIVE users, never the
    * ever-seen population: FLAT under cohort churn (BehaviorStateProbe's
    * `funnel_ttl` row measures it next to the NoTimeout form's linear
    * growth). Works in batch too (single fold, no timeouts: open
    * attempts emit their running `closed=false` row).
    */
  def funnelStreamingTtl(spark: SparkSession, events: DataFrame,
                         ttl: String,
                         steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    require(iv.months == 0, s"ttl must be day-or-finer: $ttl")
    val ttlUs = iv.days * 86400000000L + iv.microseconds
    val stepArr = steps.toArray
    val ds = events
      .withWatermark("ts", ttl)
      .select(col("user_id").cast("long"), col("event_type"), col("ts"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Long)],
         state: GroupState[FunnelTtlState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAttemptOut]
          def closedRow(r: Array[Long]) =
            FunnelAttemptOut(uid, r(0), r.length.toLong, r.last, closed = true)
          if (state.hasTimedOut) {
            // watermark passed t0 + ttl with no further data: the open
            // attempt is final — emit its closed row and evict.
            state.getOption.foreach(s => out += closedRow(s.reachedUs.toArray))
            state.remove()
          } else {
            val prev = state.getOption.map(_.reachedUs).orNull
            var reached = state.getOption.map(_.reachedUs.toArray).orNull
            val sorted = rows.toArray.sortBy(r => (r._4, r._5))
            sorted.foreach { case (_, et, _, us, _) =>
              if (reached != null && us > reached(0) + ttlUs) {
                // first event beyond the window: the attempt's depths are
                // final — close it before considering this event afresh
                out += closedRow(reached)
                reached = null
              }
              if (reached == null) {
                if (et == stepArr(0)) reached = Array(us)
              } else {
                val d = reached.length
                if (d < stepArr.length && et == stepArr(d) && us > reached(d - 1))
                  reached = reached :+ us
              }
            }
            // the same watermark reasoning as the arrival-closure above:
            // once the watermark passed the horizon no in-window event
            // can still arrive, so the attempt is final NOW — emitting
            // here (instead of registering a timeout the watermark has
            // already passed, which Spark rejects) keeps closure content
            // identical, only earlier.
            val wm = try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            if (reached != null && wm != Long.MinValue &&
                wm > (reached(0) + ttlUs) / 1000L) {
              out += closedRow(reached)
              reached = null
            }
            if (reached == null) state.remove()
            else {
              // emit the running `closed=false` row only when the fold
              // actually CHANGED the reached vector: a batch whose rows
              // were all structurally inert (late events below the depth
              // frontier) must not re-emit the identical changelog row —
              // harmless for last-row-per-key consumers, but it inflates
              // Update output with rows no reader needed
              val seq = reached.toSeq
              if (prev == null || prev != seq) {
                state.update(FunnelTtlState(seq))
                out += FunnelAttemptOut(uid, reached(0), reached.length.toLong,
                  reached.last, closed = false)
              }
              // the event-time timeout must be re-registered every
              // invocation — Spark clears an unset timeout when the
              // function runs for a key, changed state or not
              if (wm != Long.MinValue)
                state.setTimeoutTimestamp((reached(0) + ttlUs) / 1000L + 1)
            }
          }
          out.iterator
      }
      .toDF()
  }

  /** RFM segmentation — the classic recency/frequency/monetary user
    * scoring over purchase events: per user, days since last purchase
    * (against the corpus's latest purchase as the anchor, so the operator
    * is a pure function of the data), purchase count, exact money sum,
    * the three quartile codes, and the composite `rfm_code`
    * (r·100 + f·10 + m; quartile 1 = best on every axis — most recent,
    * most frequent, highest spend). Quartiles are the exact type-1 kind:
    * rank rows 1..N in a TOTAL order (metric, then user_id — ties cannot
    * flip across engines) and take `((rank−1)·4) div N + 1` — identical
    * integer arithmetic in the oracle, sidestepping engine-specific
    * `ntile` remainder placement.
    *
    * Shape: one corpus-filtered user aggregation (the only corpus-sized
    * exchange — pushed `event_type = 'purchase'` filter feeds a user-keyed
    * agg with map-side combine), checkpointed once at USER size, then ONE
    * [[graft.ext.Ranks.globalRankPerGroup]] pass over the 3×-exploded
    * (axis, key) frame ranks all three quartile axes in a single range
    * exchange — never a SinglePartition window, which is what a global
    * `ntile` would plan and the reason this avoids it: at 10⁹ users a
    * single-partition sort is one task. (The r20 form ran three
    * independent globalRank passes — three range exchanges, three offset
    * broadcasts, three user-keyed joins, 36 jobs; the fused pass measured
    * it down to ~1/3 with identical output.) Each axis's sort key is
    * normalized to ASCENDING decimal — recency as-is, frequency and
    * monetary negated — so one composite (axis, key, user) range order
    * embeds all three per-axis total orders; the per-user codes pivot
    * back in one user-keyed agg and join the checkpointed base. The
    * checkpoint matters structurally: the rank's offsets branch re-reads
    * its input, and off the checkpoint that is a user-sized in-memory
    * leaf, not a corpus rescan. The anchor (max purchase ts, user count)
    * is a 1-row broadcast.
    */
  def rfm(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
    val per = p.groupBy("user_id").agg(
      max("ts").as("last_ts"),
      count(lit(1)).as("n_purchases"),
      Exact.moneySum(col("value")).as("monetary"))
    val anchor = per.agg(max("last_ts").as("t_max"),
      count(lit(1)).as("n_users"))
    val base = per.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("t_max"), col("last_ts")).cast("long"))
      .localCheckpoint(true)
    // decimal(38,4) holds every axis key exactly (longs and the
    // DECIMAL(18,4) money sum), and negation flips desc axes to asc
    val axes = base.select(col("user_id"), col("n_users"),
      explode(array(
        struct(lit(0L).as("axis"),
          col("recency_days").cast("decimal(38,4)").as("k")),
        struct(lit(1L).as("axis"),
          (-col("n_purchases")).cast("decimal(38,4)").as("k")),
        struct(lit(2L).as("axis"),
          (-col("monetary")).cast("decimal(38,4)").as("k")))).as("a"))
      .select(col("user_id"), col("n_users"),
        col("a.axis").as("axis"), col("a.k").as("k"))
    val codes = graft.ext.Ranks
      .globalRankPerGroup(axes, "axis", "_rk", col("k"), col("user_id"))
      .withColumn("q", expr("(_rk - 1L) * 4L div n_users + 1L"))
      .groupBy("user_id").agg(
        max(when(col("axis") === 0L, col("q"))).as("r_q"),
        max(when(col("axis") === 1L, col("q"))).as("f_q"),
        max(when(col("axis") === 2L, col("q"))).as("m_q"))
    base
      .join(codes, "user_id")
      .select(col("user_id"), col("recency_days"), col("n_purchases"),
        col("monetary"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100L + col("f_q") * 10L + col("m_q")).as("rfm_code"))
  }

  /** A/B conversion lift over a deterministic user hash split: variant =
    * `user_id % 2` (the same id-arithmetic split convention the stratified
    * sampler and the oracle corpora use — reproducible across engines and
    * runs, no RNG), exposure = any event, conversion = at least one
    * `purchase`. Per variant: exposed users, converters, the exact integer
    * conversion rate in ppm, and the signed lift vs the OTHER variant —
    * the experiment readout next to [[funnel]]/[[cohortRetention]].
    *
    * Shape: one corpus-sized exchange — the user-keyed converted-or-not
    * aggregation (map-side combine; the purchase test folds into the
    * partial agg) — then a 2-row variant agg; the lift derives from a
    * window over THAT 2-row frame (mine − other = 2·mine − total), so the
    * whole readout is one corpus scan. A first cut self-joined byVariant
    * to its own projection — the two branches canonicalize differently
    * (aggregate order flips), exchange reuse does NOT kick in, and the
    * corpus was scanned twice; the window form makes the single scan
    * structural rather than an optimizer courtesy (PlanSpec-pinned). The
    * window's SinglePartition exchange moves two rows. A single-parity
    * corpus keeps its lone variant row with a null lift (no counterpart).
    */
  def abLift(events: DataFrame): DataFrame = {
    val w = Window.partitionBy()
    events
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_converters"))
      .withColumn("conv_ppm",
        expr("n_converters * 1000000L div n_users"))
      .withColumn("lift_ppm",
        when(count(lit(1)).over(w) === 2,
          col("conv_ppm") * 2 - sum("conv_ppm").over(w)))
      .select("variant", "n_users", "n_converters", "conv_ppm", "lift_ppm")
  }

  /** First-order Markov transition matrix over the event-type alphabet:
    * for each consecutive event pair within a user's (ts, event_id)-ordered
    * stream, the (src → dst) count, the source's outgoing total, and the
    * exact integer transition probability in ppm — the "what happens next"
    * readout next to [[funnel]] (which asks about one fixed order). Pairs
    * never cross users; a user's last event emits nothing.
    *
    * Shape: one corpus-sized user-keyed window exchange for the lead, then
    * a (src, dst) count-agg with map-side combine whose output is at most
    * |alphabet|² rows; the per-source total is a window over that
    * alphabet-sized frame, not a second corpus pass. At 100 TB the single
    * wide exchange carries (user, ts, event_id, type) only — the matrix
    * itself is bytes.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n_trans"))
    counts
      .withColumn("src_total",
        sum("n_trans").over(Window.partitionBy("src")))
      .withColumn("prob_ppm", expr("(n_trans * 1000000L) div src_total"))
  }

  /** State for [[transitionsStreaming]]: the user's LAST event in the
    * (ts, event_id) total order — one small row per active user, the
    * minimum state a first-order transition chain needs. (The tie-breaking
    * event_id orders rows WITHIN a batch; it is not stored — an
    * already-emitted pair cannot be reordered across batches.)
    */
  case class TransState(lastType: String, lastUs: Long)
  case class TransOut(user_id: Long, src: String, dst: String)

  /** Per-batch transition fold for `flatMapGroupsWithState` (the
    * [[updateFunnel]] pattern): sorts the batch's rows into the same
    * (ts, event_id) total order the batch window uses and emits one
    * (src, dst) INCREMENT row per consecutive pair, bridging across
    * batches through the saved last event. Under per-user event-time
    * ordered delivery the emitted multiset equals the batch lead-window
    * pairs exactly; downstream, a fold (foreachBatch sink or batch agg
    * over the emissions) rebuilds [[transitions]]' matrix.
    *
    * `gapUs` bounds the pair IN THE FOLD: a consecutive pair further than
    * `gapUs` apart in event time is not a transition (the TTL form's
    * semantics). Enforcing it here — not via the state timeout — makes
    * the contract event-time-DETERMINISTIC: whether a no-data batch
    * happened to fire the timeout before a user's return cannot change
    * the answer (flatMapGroupsWithState only reports hasTimedOut for
    * keys with no data in the batch, so a resuming user's own rows would
    * otherwise preempt the eviction and leak the bridging pair).
    */
  def updateTransitions(gapUs: Long = Long.MaxValue)(
      uid: Long, rows: Iterator[(Long, String, Long, Long)],
      state: org.apache.spark.sql.streaming.GroupState[TransState])
      : Iterator[TransOut] = {
    val sorted = rows.toArray.sortBy(r => (r._3, r._4))
    val out = scala.collection.mutable.ArrayBuffer.empty[TransOut]
    var last = state.getOption
    sorted.foreach { case (_, et, us, _) =>
      // late-row guard: a row OLDER than the saved frontier arrived in a
      // later micro-batch than its event time warrants (cross-batch
      // disorder — within a batch the sort above fixes order). Folding it
      // would emit a time-REVERSED pair (us − lastUs < 0, which any gap
      // bound accepts) and regress the frontier; the chain contract is
      // "transitions over the in-order stream", so late rows are dropped
      // rather than silently folded. The TTL form bounds how late a row
      // can be before this triggers (watermark); the NoTimeout form drops
      // unboundedly-late rows the same way.
      if (!last.exists(p => us < p.lastUs)) {
        last.foreach(p =>
          if (us - p.lastUs <= gapUs) out += TransOut(uid, p.lastType, et))
        last = Some(TransState(et, us))
      }
    }
    last.foreach(state.update)
    out.iterator
  }

  /** STREAMING twin of [[transitions]]' pair stream — works in batch too
    * (state starts empty, yielding exactly the lead-window pairs). State
    * is one last-event row per EVER-SEEN user: bounded by the user
    * population, not by event volume — at 10⁹ users that is real state,
    * which is what [[transitionsStreamingTtl]] bounds.
    */
  def transitionsStreaming(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateTransitions())
      .toDF()
  }

  /** [[transitionsStreaming]] with a TTL: consecutive events further
    * than `ttl` apart in event time are NOT a transition (a months-later
    * return is a new session — the wanted matrix semantics, and the same
    * contract the reference's TTL'd state stores carry), enforced in the
    * FOLD so the answer is event-time-deterministic regardless of
    * micro-batch timing. The event-time TIMEOUT is state hygiene on top:
    * an idle user's row evicts once the watermark passes
    * `lastEvent + ttl` — with the watermark delay also set to `ttl`,
    * that is up to ~2×ttl of event-time idleness (watermark =
    * maxEventTime − ttl), so the STATE bound is rate × ~2·ttl of active
    * users, measured in SCALE.md's BehaviorStateProbe row. Eviction can
    * never change an answer (the fold already refuses gap-spanning
    * pairs); it only caps the store.
    */
  def transitionsStreamingTtl(spark: SparkSession, events: DataFrame,
                              ttl: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    require(iv.months == 0, s"ttl must be day-or-finer: $ttl")
    val ttlUs = iv.days * 86400000000L + iv.microseconds
    val ds = events
      .withWatermark("ts", ttl)
      .select(col("user_id").cast("long"), col("event_type"), col("ts"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Long)],
         state: GroupState[TransState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = updateTransitions(ttlUs)(uid,
              rows.map(r => (r._1, r._2, r._4, r._5)), state)
            state.getOption.foreach(s =>
              state.setTimeoutTimestamp(s.lastUs / 1000L, ttl))
            out
          }
      }
      .toDF()
  }
}
