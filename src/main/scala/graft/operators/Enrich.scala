package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enrichment joins (reference §2.3: J1 stream–KTable join, J2 dimension
  * lookup join; and A1, the latest-value table the KTable materializes —
  * LoggedEventsListener.java:92-134, AugmentedQuestionDetailMapper.java).
  *
  * Scale notes:
  *  - The user/question dimensions are small relative to the event stream, so
  *    both joins broadcast the dimension (no shuffle of the 100 TB fact side).
  *  - `latestUser` is the only shuffle (by user_id); at scale the user-update
  *    stream is ~1e-3 of the fact volume, so this is cheap, and the result is
  *    reused (broadcast) by every downstream enrichment.
  */
object Enrich {

  /** A1 — latest-value-per-key table (KTable upsert semantics): reduce the
    * user-update stream (`signup` events here, CREATE_UPDATE_USER in the
    * reference) to each key's most recent record. Deterministic tie-break on
    * event_id; implemented with a ranking window (one shuffle by user_id).
    */
  def latestUser(events: DataFrame): DataFrame = {
    val updates = Ingest.filterByEventType(events, "signup")
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    updates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("ts").as("last_update_ts"),
        col("value").as("last_value"))
  }

  /** A1, streaming-safe form: `max_by` over a (ts, event_id) ordering struct
    * — a plain aggregation, legal in streaming Update mode (the ranking-
    * window form above is batch-only). Batch-equivalence is tested.
    */
  def latestUserStreaming(events: DataFrame): DataFrame =
    Ingest.filterByEventType(events, "signup")
      .groupBy("user_id")
      .agg(
        max_by(struct(col("ts").as("last_update_ts"), col("value").as("last_value")),
          struct(col("ts"), col("event_id"))).as("u"))
      .select(col("user_id"), col("u.last_update_ts"), col("u.last_value"))

  /** J1 — stream enrichment: each event joins the latest user record for its
    * key plus the static user dimension (role analog = c_mktsegment). Inner
    * join drops events with no user record, exactly the reference's KStream ⋈
    * KTable semantics. The dimension side is broadcast.
    */
  def enriched(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(
        col("c_custkey").as("user_id"),
        col("c_mktsegment").as("user_role"),
        col("c_nationkey").as("user_nation"))),
      Seq("user_id"), "inner")

  /** Stream–stream interval (attribution) join: each purchase pairs with
    * the same user's clicks in the preceding `window` — the classic
    * click-to-conversion attribution shape, and the §2.8 stream–stream
    * member of the join family (J1/J2 are stream–table). Batch and
    * streaming run the SAME code: on batch frames the watermark is skipped
    * and the time-range join is exact history; on streams the watermark +
    * event-time bounds let Spark expire both sides' state (a purchase can
    * stop waiting once the watermark passes its window) — unbounded
    * stream–stream joins are not deployable at scale.
    *
    * Scale shape: equi-key on user_id (one shuffle each side, or none if
    * both are bucketed by user), range predicate evaluated inside the
    * sort-merge join. Output carries the exact event-time lag in micros.
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
                   window: String = "1 hour",
                   watermark: Option[String] = None): DataFrame = {
    val c0 = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val p0 = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val c = watermark.fold(c0)(w => c0.withWatermark("click_ts", w))
    val p = watermark.fold(p0)(w => p0.withWatermark("purchase_ts", w))
    p.join(c, col("p_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("lag_us"),
        col("value"))
  }

  /** As-of join (added surface — an operator Spark has no native form of):
    * each event picks up the value of the latest `signup` update with
    * update_ts <= event_ts for its key. Composed from built-ins (preference
    * (a) in the custom-operator ladder): union the event and update streams,
    * sort per key by (time, side) — updates first on ties, giving <=
    * semantics — and carry the last non-null update value forward with an
    * ignore-nulls `last` window. One shuffle on the key, no custom plan
    * node; at scale this is the standard union-scan formulation whose cost
    * is a single sort-within-partitions of events+updates.
    */
  def asOfJoin(events: DataFrame): DataFrame = {
    val updates = Ingest.filterByEventType(events, "signup")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), col("value").as("upd_value"))
    val facts = events
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(null).cast("double").as("upd_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    facts.unionByName(updates)
      .withColumn("asof_value", last(col("upd_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_value"))
  }

  case class AsOfState(value: Double)
  case class AsOfOut(event_id: Long, user_id: Long, ts_us: Long, asof_value: Option[Double])

  /** J1 with the reference's EXACT state-store semantics (SURVEY §7.5.1
    * option (b)): the user-update stream folds into per-key GroupState, and
    * every event reads the state AS OF ITS ARRIVAL — a Kafka Streams
    * KStream⋈KTable lookup, not a periodically refreshed static snapshot.
    * Within a micro-batch, rows apply in (event-time, updates-first,
    * event_id) order, so a single-batch run reproduces `asOfJoin` exactly;
    * across micro-batches the semantics are per-ARRIVAL (a late event sees
    * the newest state — precisely what the reference's state-store lookup
    * does, and the documented deviation from the event-time batch form).
    */
  def asOfEnrichStateful(spark: org.apache.spark.sql.SparkSession,
                         events: DataFrame,
                         ttl: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    // ttl (SURVEY §7.5.2): the reference keeps per-user state forever; with a
    // ttl, a user idle for that long past the watermark is evicted — the next
    // event for that user re-reads as state-less (asof_value null), exactly
    // what the reference's store would answer after a state-store purge.
    val src = ttl.fold(events)(t => events.withWatermark("ts", t))
    val timeout = if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout
    // ts rides along untouched: event-time timeout requires the watermarked
    // attribute to be present in the fmgws input
    val ds = src
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"), col("ts"))
      .as[(Long, Long, Long, String, Double, java.sql.Timestamp)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String, Double, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[AsOfState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray
              .sortBy(r => (r._3, if (r._4 == "signup") 0 else 1, r._1))
            var st = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
            var maxUs = Long.MinValue
            sorted.foreach { case (eid, _, tsUs, et, v, _) =>
              if (et == "signup") st = Some(AsOfState(v))
              if (tsUs > maxUs) maxUs = tsUs
              out += AsOfOut(eid, uid, tsUs, st.map(_.value))
            }
            st.foreach(state.update)
            if (state.exists) ttl.foreach(t => state.setTimeoutTimestamp(maxUs / 1000L, t))
            out.iterator
          }
      }
      .toDF()
  }

  /** J2 — dimension lookup join replacing the reference's per-record HTTP
    * lookup (AugmentedQuestionDetailMapper.java:100-134): left join so a
    * missing question yields default metadata (part count 0 → incomplete),
    * mirroring the reference's missing-key behavior.
    */
  def questionMeta(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("q_page"),
      least(col("p_size"), lit(10)).cast("long").as("question_part_count"))
}
