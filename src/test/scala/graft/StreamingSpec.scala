package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators._
import graft.streaming.Topology

/** Streaming-semantics tests (SURVEY §5.4): MemoryStream feeds the same
  * operator functions used in batch; Update-mode emissions must converge to
  * the batch recomputation (the KTable changelog equivalence), including
  * out-of-order arrivals.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = TestEv

  private def ev(id: Long, t: String, u: Long, et: String): Ev =
    TestEv(id, Timestamp.valueOf(t), u, et, 1.0, """{"k": 1}""")

  /** Continuous trigger: AvailableNow would snapshot the (empty) source at
    * start and terminate before addData calls land.
    */
  private val tick = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds")

  test("A3 streaming counts converge to batch counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      Stats.eventTypeCounts(mem.toDF()), "counts_test", tick)

    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:00:01", 1, "view"))
    q.processAllAvailable()
    mem.addData(ev(3, "2024-01-01 00:00:02", 2, "click"))
    q.processAllAvailable()
    q.stop()

    // memory sink in Update mode appends updated rows; latest row per key wins
    val got = spark.table("counts_test")
      .groupBy("event_type").agg(max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("click" -> 2L, "view" -> 1L))
  }

  test("streaming decontamination: stateless filter matches batch bloom counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Curation
    val benchmark = Seq(
      (900L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = Curation.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), benchmark)
    // stateless narrow op: append mode, no watermark needed
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName("decon_stream_test").trigger(tick).start()

    mem.addData((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words with nothing shared here at all"))
    q.processAllAvailable()
    mem.addData((3L, "jumps over the lazy dog today and more besides that"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("decon_stream_test")
      .select("doc_id", "n_shingles", "n_overlap")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // doc 1 copies the benchmark verbatim: every shingle hits the sketch
    assert(got(1L)._1 == got(1L)._2 && got(1L)._2 > 0L)
    // doc 2 is disjoint; 2^23-bit sketch over 8 shingles has ~0 fp odds
    assert(got(2L)._2 == 0L)
    // doc 3 shares a suffix: some but not all shingles hit
    assert(got(3L)._2 > 0L && got(3L)._2 < got(3L)._1)
    assert(spark.table("decon_stream_test")
      .filter($"is_contaminated").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L))
  }

  test("A2 streaming last-seen handles out-of-order events (late data folds in)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      mem.toDF().groupBy("user_id", "event_type").agg(max("ts").as("last_seen")),
      "lastseen_test", tick)

    mem.addData(ev(1, "2024-01-05 00:00:00", 1, "click"))
    q.processAllAvailable()
    // late event, earlier ts: must NOT regress last_seen
    mem.addData(ev(2, "2024-01-01 00:00:00", 1, "click"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("lastseen_test")
      .groupBy("user_id", "event_type").agg(max("last_seen").as("ls"))
      .as[(Long, String, Timestamp)].collect()
    assert(got.length == 1 && got(0)._3 == Timestamp.valueOf("2024-01-05 00:00:00"))
  }

  test("branch fan-out: anonymous branch mirrors to its own sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      Ingest.anonymousBranch(mem.toDF()), "anon_test", tick)
    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "view"),
      ev(2, "2024-01-01 00:00:01", 1, "click"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("anon_test").select("event_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("streaming stream-static enrichment join (J1) works per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dim = Seq((1L, "SEG", 7)).toDF("c_custkey", "c_mktsegment", "c_nationkey")
    val q = Topology.startMemorySink(
      Enrich.enriched(mem.toDF(), dim), "enrich_test", tick)
    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:00:00", 99, "click")) // no dim row -> dropped
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_test").select("event_id", "user_role")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "SEG")))
  }

  test("streaming sessionization (A5) with watermark emits sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = Streaks.sessions(mem.toDF().withWatermark("ts", "1 minute"))
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory").queryName("streaks_test")
      .trigger(tick)
      .start()
    mem.addData(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:30:00", 1, "click"),
      ev(3, "2024-01-01 09:00:00", 1, "click"))
    q.processAllAvailable()
    // advance watermark far past the sessions so they close and emit
    mem.addData(ev(4, "2024-02-01 00:00:00", 2, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("streaks_test")
      .filter(col("user_id") === 1L)
      .select("n_events").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("streaming session profile (Append) equals batch sessionProfile on replay") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.sessionProfileStreaming(mem.toDF(), watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessprof_test")
      .trigger(tick).start()
    // user 1: two sessions split by a >30min gap, with an EXACT-30min gap
    // inside session 1 (stays in-session in both engines — the strict-gap
    // boundary contract); user 2: a bounce
    val batchEvents = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:30:00", 1, "view"),   // gap == 30min: in-session
      ev(3, "2024-01-01 02:00:00", 1, "click"),  // > 30min: new session
      ev(4, "2024-01-01 02:10:00", 1, "click"),
      ev(5, "2024-01-01 00:05:00", 2, "view"))
    mem.addData(batchEvents.take(2): _*)
    q.processAllAvailable()
    mem.addData(batchEvents.drop(2): _*)
    q.processAllAvailable()
    // watermark-advancing sentinel (excluded from the compare)
    mem.addData(ev(99, "2024-02-01 00:00:00", 999, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessprof_test")
      .filter(col("user_id") =!= 999L)
      .select("user_id", "ne", "start_us", "end_us", "dur_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Stats.sessionProfile(batchEvents.toDF())
      .select("user_id", "ne", "start_us", "end_us", "dur_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want && want.size == 3)
    // and the per-user rollup of the emitted rows equals batch sessionStats
    val rolled = spark.table("sessprof_test")
      .filter(col("user_id") =!= 999L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("ne") === 1, 1L).otherwise(0L)).as("bounce_sessions"),
        sum("ne").as("n_events"),
        max("ne").as("max_session_events"),
        sum("dur_us").as("total_session_us"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val wantStats = Stats.sessionStats(batchEvents.toDF())
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(rolled == wantStats)
  }

  test("streaming funnel depth equals batch funnel on ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.funnelStreaming(spark, mem.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream_test")
      .trigger(tick).start()
    // user 1 completes all four steps across batches; user 2 stalls at
    // view (its click PRECEDES its view, so depth must stop at 2 — the
    // strict in-order contract); user 3 has only a click (depth 0)
    val batchEvents = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:01:00", 1, "view"),
      ev(3, "2024-01-01 00:00:30", 2, "click"),
      ev(4, "2024-01-01 00:01:30", 2, "signup"),
      ev(5, "2024-01-01 00:02:00", 1, "click"),
      ev(6, "2024-01-01 00:03:00", 1, "purchase"),
      ev(7, "2024-01-01 00:02:30", 2, "view"),
      ev(8, "2024-01-01 00:04:00", 3, "click"))
    // per-user event-time order is preserved across these batch splits
    mem.addData(batchEvents.take(4): _*)
    q.processAllAvailable()
    mem.addData(batchEvents.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    // depth is monotone per user: the max update is the final state
    val got = spark.table("funnel_stream_test")
      .groupBy("user_id").agg(max("depth").as("depth"))
      .filter(col("depth") > 0)
      .as[(Long, Long)].collect().toMap
    val want = Stats.funnel(batchEvents.toDF())
      .select("user_id", "depth").as[(Long, Long)].collect().toMap
    assert(got == want && want == Map(1L -> 4L, 2L -> 2L))
  }

  test("streaming co-occurrence: closed-day baskets equal the batch pairs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.cooccurrenceStreaming(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("cooccur_stream_test")
      .trigger(tick).start()
    // user 1's day-1 basket accumulates ACROSS batches {signup,view,click};
    // user 2 cycles FIVE types — over the cap, dropped whole, exactly the
    // batch hub-cap contract
    val day1 = Seq(
      ev(1, "2024-01-01 01:00:00", 1, "signup"),
      ev(2, "2024-01-01 02:00:00", 1, "view"),
      ev(3, "2024-01-01 03:00:00", 2, "signup"),
      ev(4, "2024-01-01 04:00:00", 2, "view"),
      ev(5, "2024-01-01 05:00:00", 2, "click"),
      ev(6, "2024-01-01 06:00:00", 2, "purchase"),
      ev(7, "2024-01-01 07:00:00", 2, "login"),
      ev(8, "2024-01-01 08:00:00", 1, "click"))
    mem.addData(day1.take(5): _*)
    q.processAllAvailable()
    mem.addData(day1.drop(5): _*)
    q.processAllAvailable()
    // watermark-advancing sentinel closes day 1 (excluded from compare)
    mem.addData(ev(99, "2024-02-01 00:00:00", 999, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cooccur_stream_test")
      .filter(col("user_id") =!= 999L)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("pair_count"),
        countDistinct(col("user_id")).as("user_count"))
      .as[(String, String, Long, Long)].collect().toSet
    val want = Stats.cooccurrence(day1.toDF())
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == want && want == Set(
      ("click", "signup", 1L, 1L), ("click", "view", 1L, 1L),
      ("signup", "view", 1L, 1L)))
  }

  test("streaming transitions equal the batch lead-window pairs on replay") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.transitionsStreaming(spark, mem.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("trans_stream_test")
      .trigger(tick).start()
    // user 1's chain SPANS the batch split (view -> click bridges through
    // the saved last-event state); user 2 has a single event (no pair)
    val batchEvents = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:01:00", 1, "view"),
      ev(3, "2024-01-01 00:00:30", 2, "view"),
      ev(4, "2024-01-01 00:02:00", 1, "click"),
      ev(5, "2024-01-01 00:03:00", 1, "view"),
      ev(6, "2024-01-01 00:04:00", 1, "click"))
    mem.addData(batchEvents.take(3): _*)
    q.processAllAvailable()
    mem.addData(batchEvents.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    // fold the emitted increments into the matrix and compare to batch
    val got = spark.table("trans_stream_test")
      .groupBy("src", "dst").agg(count(lit(1)).as("n_trans"))
      .as[(String, String, Long)].collect().toSet
    val want = Stats.transitions(batchEvents.toDF())
      .select("src", "dst", "n_trans")
      .as[(String, String, Long)].collect().toSet
    assert(got == want &&
      want == Set(("signup", "view", 1L), ("view", "click", 2L),
        ("click", "view", 1L)))
  }

  test("transitions TTL form evicts idle users: no pair bridges the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.transitionsStreamingTtl(spark, mem.toDF(), "10 minutes")
      .writeStream.outputMode("update")
      .format("memory").queryName("trans_ttl_test")
      .trigger(tick).start()
    mem.addData(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:01:00", 1, "view"))
    q.processAllAvailable()
    // a DIFFERENT user's much-later event advances the watermark past
    // user 1's ttl — its last-event state must evict
    mem.addData(ev(3, "2024-01-01 02:00:00", 2, "click"))
    q.processAllAvailable()
    // user 1 returns after the idle gap: a fresh chain, NOT view -> click
    mem.addData(ev(4, "2024-01-01 02:30:00", 1, "click"),
      ev(5, "2024-01-01 02:31:00", 1, "purchase"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_ttl_test")
      .select("src", "dst").as[(String, String)].collect()
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    // signup->view before the gap, click->purchase after; the bridge
    // view->click must NOT exist (state evicted) — the unbounded form
    // would emit it
    assert(got == Map(("signup", "view") -> 1L, ("click", "purchase") -> 1L),
      got.toString)
    val unbounded = Stats.transitions(Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:01:00", 1, "view"),
      ev(4, "2024-01-01 02:30:00", 1, "click"),
      ev(5, "2024-01-01 02:31:00", 1, "purchase")).toDF())
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(unbounded.contains(("view", "click"))) // the pair TTL drops
  }

  test("behavior stores route through the topology: structural modes, replay equals batch") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val stores = Topology.behaviorStores(mem.toDF(),
      watermark = "1 hour", ttl = "10 minutes")
    // output modes chosen structurally per store: session windows and
    // watermarked day-window baskets -> Append (emit once on close),
    // the two TTL folds -> Update (changelog)
    assert(Topology.outputModeFor(stores("store_session_profiles")) == OutputMode.Append())
    assert(Topology.outputModeFor(stores("store_cooccur_baskets")) == OutputMode.Append())
    assert(Topology.outputModeFor(stores("store_transition_pairs")) == OutputMode.Update())
    assert(Topology.outputModeFor(stores("store_funnel_attempts")) == OutputMode.Update())
    val qs = stores.toSeq.sortBy(_._1).map { case (n, df) =>
      Topology.startMemorySink(df, s"topo_$n", tick)
    }
    // user 1: one tight session walking the funnel inside the conversion
    // window; user 2: two events 5 min apart (one transition pair)
    val batchEvents = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "signup"),
      ev(2, "2024-01-01 10:01:00", 1, "view"),
      ev(3, "2024-01-01 10:02:00", 1, "click"),
      ev(4, "2024-01-01 10:03:00", 1, "purchase"),
      ev(5, "2024-01-01 11:00:00", 2, "click"),
      ev(6, "2024-01-01 11:05:00", 2, "purchase"))
    mem.addData(batchEvents.take(3): _*)
    qs.foreach(_.processAllAvailable())
    mem.addData(batchEvents.drop(3): _*)
    qs.foreach(_.processAllAvailable())
    // two watermark sentinels: close the sessions/day windows, then give
    // the TTL folds' timeouts a later batch to fire in
    mem.addData(ev(99, "2024-02-01 00:00:00", 999, "click"))
    qs.foreach(_.processAllAvailable())
    mem.addData(ev(100, "2024-02-02 00:00:00", 999, "click"))
    qs.foreach(_.processAllAvailable())
    qs.foreach(_.stop())

    val batch = batchEvents.toDF()
    // sessions: emitted closed sessions equal the batch profile
    val gotSess = spark.table("topo_store_session_profiles")
      .filter(col("user_id") =!= 999L)
      .select("user_id", "ne", "start_us", "end_us", "dur_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val wantSess = Stats.sessionProfile(batch)
      .select("user_id", "ne", "start_us", "end_us", "dur_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(gotSess == wantSess && wantSess.size == 2)
    // co-occurrence: folded closed-day pairs equal the batch matrix
    val gotCo = spark.table("topo_store_cooccur_baskets")
      .filter(col("user_id") =!= 999L)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("pair_count"),
        countDistinct(col("user_id")).as("user_count"))
      .as[(String, String, Long, Long)].collect().toSet
    val wantCo = Stats.cooccurrence(batch)
      .as[(String, String, Long, Long)].collect().toSet
    assert(gotCo == wantCo && wantCo.nonEmpty)
    // transitions: emitted increments fold to the batch matrix (every
    // consecutive pair here is inside the 10-minute gap bound)
    val gotTr = spark.table("topo_store_transition_pairs")
      .filter(col("user_id") =!= 999L)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val wantTr = Stats.transitions(batch)
      .select("src", "dst", "n_trans")
      .as[(String, String, Long)].collect().toSet
    assert(gotTr == wantTr && wantTr.nonEmpty)
    // funnel: user 1's closed attempt converted at depth 4 inside the
    // window; user 2 never entered (no signup)
    val gotFu = spark.table("topo_store_funnel_attempts")
      .filter(col("closed") && col("user_id") =!= 999L)
      .select("user_id", "depth")
      .as[(Long, Long)].collect().toSet
    assert(gotFu == Set((1L, 4L)), gotFu.toString)
  }

  test("funnel TTL: in-window conversions match, expired attempts close and reopen") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.funnelStreamingTtl(spark, mem.toDF(), "10 minutes")
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_ttl_test")
      .trigger(tick).start()
    // user 1 converts fully INSIDE the window; user 2's first attempt dies
    // at depth 1 (its view lands past the horizon — the arrival closes the
    // attempt and, not being a step-0 event, opens nothing), then a later
    // signup opens a SECOND attempt that reaches depth 2
    val u1 = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:01:00", 1, "view"),
      ev(3, "2024-01-01 00:02:00", 1, "click"),
      ev(4, "2024-01-01 00:03:00", 1, "purchase"))
    val u2 = Seq(
      ev(5, "2024-01-01 00:00:00", 2, "signup"),
      ev(6, "2024-01-01 00:20:00", 2, "view"),
      ev(7, "2024-01-01 00:21:00", 2, "signup"),
      ev(8, "2024-01-01 00:22:00", 2, "view"))
    mem.addData(u1 ++ u2.take(1): _*)
    q.processAllAvailable()
    mem.addData(u2.drop(1): _*)
    q.processAllAvailable()
    // two watermark-advancing sentinels: the first carries the watermark
    // past user 1's horizon (timeouts fire one batch later), the second
    // past user 2's second-attempt horizon
    mem.addData(ev(99, "2024-01-01 01:00:00", 999, "click"))
    q.processAllAvailable()
    mem.addData(ev(100, "2024-01-01 01:30:00", 999, "click"))
    q.processAllAvailable()
    q.stop()
    def us(t: String): Long = Timestamp.valueOf(t).getTime * 1000L
    // every attempt eventually CLOSES (timeout or arrival); the closed
    // rows are the final per-attempt answer
    val closed = spark.table("funnel_ttl_test")
      .filter(col("closed") && col("user_id") =!= 999L)
      .select("user_id", "t0_us", "depth", "t_depth_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(closed == Set(
      (1L, us("2024-01-01 00:00:00"), 4L, us("2024-01-01 00:03:00")),
      (2L, us("2024-01-01 00:00:00"), 1L, us("2024-01-01 00:00:00")),
      (2L, us("2024-01-01 00:21:00"), 2L, us("2024-01-01 00:22:00"))),
      closed.toString)
    // in-window conversions equal the unbounded batch funnel (user 1's
    // whole journey fits the window)
    val batchDepth = Stats.funnel((u1 ++ u2).toDF())
      .filter(col("user_id") === 1L)
      .select("depth").as[Long].collect().head
    assert(batchDepth == 4L)
    // batch execution of the SAME operator (single fold, no timeouts)
    // yields the same per-attempt values — closed flags differ only for
    // attempts still open at end-of-data
    val batchRun = Stats.funnelStreamingTtl(spark, (u1 ++ u2).toDF(),
        "10 minutes")
      .groupBy("user_id", "t0_us")
      .agg(max("depth").as("depth"), max("t_depth_us").as("t_depth_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batchRun == closed, batchRun.toString)
  }

  test("funnel TTL: inert late batches do not re-emit the running row") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.funnelStreamingTtl(spark, mem.toDF(), "10 minutes")
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_ttl_inert")
      .trigger(tick).start()
    mem.addData(
      ev(1, "2024-01-01 00:00:00", 5, "signup"),
      ev(2, "2024-01-01 00:01:00", 5, "view"))
    q.processAllAvailable()
    // an INERT batch: a repeated view (the frontier expects click) and a
    // stale signup below the depth frontier — the fold cannot change the
    // reached vector, so no new changelog row may appear (the update-mode
    // memory sink appends every batch's emissions, making re-emits
    // directly countable)
    mem.addData(
      ev(3, "2024-01-01 00:00:30", 5, "view"),
      ev(4, "2024-01-01 00:00:10", 5, "signup"))
    q.processAllAvailable()
    val afterInert = spark.table("funnel_ttl_inert")
      .filter(col("user_id") === 5L).count()
    // a real advance still emits
    mem.addData(ev(5, "2024-01-01 00:02:00", 5, "click"))
    q.processAllAvailable()
    q.stop()
    assert(afterInert == 1L, s"inert batch re-emitted: $afterInert rows")
    val rows = spark.table("funnel_ttl_inert")
      .filter(col("user_id") === 5L)
      .select("depth", "closed").as[(Long, Boolean)].collect().toSeq
    assert(rows.sortBy(_._1) == Seq((2L, false), (3L, false)), rows.toString)
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = graft.operators.Enrich.intervalJoin(
      clicks.toDF(), purchases.toDF(),
      window = "30 seconds", watermark = Some("10 seconds"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("interval_test")
      .trigger(tick)
      .start()
    clicks.addData(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:00:20", 1, "click"),
      ev(3, "2024-01-01 00:00:20", 2, "click"))
    purchases.addData(
      ev(10, "2024-01-01 00:00:30", 1, "purchase"))
    q.processAllAvailable()
    // click 40s BEFORE the purchase is outside the window; a later purchase
    // by user 2 still matches its older click within 30s
    purchases.addData(ev(11, "2024-01-01 00:00:45", 2, "purchase"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("interval_test")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (11L, 3L)))
  }

  test("streaming exact dedup drops semantic duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      graft.ext.Dedup.exactDedupRecords(mem.toDF(), "10 minutes"), "dedup_test", tick)
    // ids 1 and 2 are semantic duplicates (same user/type/props; surrogate
    // event_id deliberately excluded from the content hash)
    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:00:10", 1, "click"))
    q.processAllAvailable()
    // a later micro-batch re-sends the duplicate within the watermark delay
    mem.addData(ev(3, "2024-01-01 00:01:00", 1, "click"),
      ev(4, "2024-01-01 00:01:00", 2, "view"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_test").select("user_id", "event_type")
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "click"), (2L, "view")))
    // batch form agrees on the surviving key set
    val batch = graft.ext.Dedup.exactDedupRecords(
      Seq(ev(1, "2024-01-01 00:00:00", 1, "click"),
        ev(2, "2024-01-01 00:00:10", 1, "click"),
        ev(4, "2024-01-01 00:01:00", 2, "view")).toDF())
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq.sorted
    assert(batch == got)
  }

  test("streaming sequence packing carries per-source token offsets across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val packed = graft.ext.Curation.sequencePackStreaming(
      mem.toDF().toDF("doc_id", "source", "text"), seqLen = 4L)
    val q = Topology.startMemorySink(packed, "packed_test", tick)
    // batch 1: src a gets 3 + 2 tokens, src b gets 5
    mem.addData((1L, "a", "t1 t2 t3"), (2L, "a", "t4 t5"), (10L, "b", "u1 u2 u3 u4 u5"))
    q.processAllAvailable()
    // batch 2: src a continues AT OFFSET 5, not 0 — the state is the point
    mem.addData((3L, "a", "t6 t7 t8"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("packed_test")
      .select("doc_id", "start_off", "bin_first", "bin_last", "n_bins_spanned")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L),   // tokens [0,3) -> bin 0
      (2L, 3L, 0L, 1L, 2L),   // tokens [3,5) -> spans bins 0-1
      (3L, 5L, 1L, 1L, 1L),   // batch 2 resumes at offset 5 -> bin 1
      (10L, 0L, 0L, 1L, 2L))) // source b has its own offset stream
    // and the single-batch prefix agrees with the batch operator
    val batch = graft.ext.Curation.sequencePack(
      Seq((1L, "a", "t1 t2 t3"), (2L, "a", "t4 t5"), (10L, "b", "u1 u2 u3 u4 u5"))
        .toDF("doc_id", "source", "text"), seqLen = 4L)
      .select("doc_id", "start_off", "bin_first", "bin_last", "n_bins_spanned")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(batch.toSeq == got.toSeq.filter(_._1 != 3L))
  }

  test("chunker runs unchanged on a stream (stateless narrow op, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Topology.startMemorySink(
      graft.ext.Curation.chunkDocuments(
        mem.toDF().toDF("doc_id", "text"), chunkLen = 4, stride = 3),
      "chunk_stream", tick)
    mem.addData((1L, "a b c d e"))
    q.processAllAvailable()
    mem.addData((2L, "f g"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("chunk_stream")
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "a b c d"), (1L, 1L, "d e"), (2L, 0L, "f g")))
  }

  test("streaming threshold crossings emit exactly once per threshold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    def correct(id: Long, t: String, u: Long) =
      TestEv(id, Timestamp.valueOf(t), u, "click", 90.0, """{"k": 1}""")
    val q = Topology.startMemorySink(
      Achievements.crossingsStreaming(spark, mem.toDF()), "crossings_test", tick)
    // first correct answer -> crosses threshold 1
    mem.addData(correct(1, "2024-01-01 00:00:00", 1))
    q.processAllAvailable()
    // four more -> count 5 crosses threshold 5 (threshold 1 NOT re-emitted)
    mem.addData((2L to 5L).map(i => correct(i, s"2024-01-01 00:00:0$i", 1)): _*)
    q.processAllAvailable()
    // one more -> count 6, no new threshold, nothing emitted
    mem.addData(correct(6, "2024-01-01 00:01:00", 1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("crossings_test")
      .select("user_id", "threshold").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 5L)))

    // batch run of the same detector equals the declarative crossings query
    val e = Tables.events(spark, sfDir)
    val a = Achievements.crossingsStreaming(spark, e)
      .select("user_id", "threshold").as[(Long, Long)].collect().toSet
    val b = Achievements.crossings(e)
      .select("user_id", "threshold").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("declared stream graph end-to-end: raw -> attempts -> crossings -> notifications") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    def correct(id: Long, u: Long) =
      TestEv(id, Timestamp.valueOf("2024-01-01 00:00:00"), u, "click", 90.0, """{"k": 1}""")
    val q = Topology.startMemorySink(
      Achievements.notificationsStreaming(spark, mem.toDF()), "notif_stream_test", tick)
    mem.addData(correct(1, 7))
    q.processAllAvailable()
    mem.addData((2L to 5L).map(correct(_, 7)): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("notif_stream_test")
      .select("threshold", "notification").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, "Achievement unlocked: 1 questions answered correctly"),
      (5L, "Achievement unlocked: 5 questions answered correctly")))
  }

  test("stateful KStream-KTable join: arrival semantics across batches, asOfJoin parity within one") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      Enrich.asOfEnrichStateful(spark, mem.toDF()), "asof_state_test", tick)
    // batch 1: signup (value 10) then a click -> click sees 10
    mem.addData(TestEv(1, Timestamp.valueOf("2024-01-02 00:00:00"), 1, "signup", 10.0, "{}"),
      ev(2, "2024-01-03 00:00:00", 1, "click"))
    q.processAllAvailable()
    // batch 2: a LATE click (event-time before the signup) still sees 10 —
    // per-arrival state-store semantics, the reference's actual behavior
    mem.addData(ev(3, "2024-01-01 00:00:00", 1, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_state_test")
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(10.0), 2L -> Some(10.0), 3L -> Some(10.0)))

    // single-batch (= arrival order is event-time order): equals batch asOfJoin
    val e = Tables.events(spark, sfDir)
    val a = Enrich.asOfEnrichStateful(spark, e)
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().toMap
    val b = Enrich.asOfJoin(e)
      .select(col("event_id"), col("asof_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(a == b)
  }

  test("chained stateful aggs: hourly activity then daily active-hours in one streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // stage 1: tumbling-hour activity aggregation; stage 2: tumbling-day
    // count of active hours — two stateful operators chained in ONE
    // append-mode streaming query (the watermark propagates through the
    // first agg's window column — window-of-window)
    val hourly = mem.toDF().withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour").as("hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val daily = hourly
      .groupBy(window(col("hour"), "1 day").as("day"), col("user_id"))
      .agg(count(lit(1)).as("n_active_hours"))
    val q = daily.writeStream
      .outputMode("append")
      .format("memory").queryName("daily_sessions_test")
      .trigger(tick)
      .start()
    mem.addData(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:30:00", 1, "click"),  // same hour
      ev(3, "2024-01-01 09:00:00", 1, "click"))  // second active hour, same day
    q.processAllAvailable()
    // advance the watermark past both the hours and the day window
    mem.addData(ev(4, "2024-02-01 00:00:00", 2, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("daily_sessions_test")
      .filter(col("user_id") === 1L).select("n_active_hours").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("RocksDB state store provider runs the stateful aggregation (SCALE.md config flip)") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = Topology.startMemorySink(
        Stats.eventTypeCounts(mem.toDF()), "rocksdb_counts_test", tick)
      mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click"))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 00:00:01", 1, "click"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocksdb_counts_test")
        .groupBy("event_type").agg(max("n").as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == Map("click" -> 2L))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("store_user_last_seen TTL form evicts idle keys: state size is bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stats.lastSeenPerTypeTtl(mem.toDF(), "1 minute")
      .writeStream.outputMode("update")
      .format("memory").queryName("ttl_last_seen_test")
      .trigger(tick)
      .start()

    // 20 keys land at t0 -> 20 state rows
    mem.addData((1 to 20).map(u => ev(u.toLong, "2024-01-01 00:00:00", u.toLong, "click")): _*)
    q.processAllAvailable()
    val loaded = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(loaded == 20L, s"expected 20 state rows after load, got $loaded")

    // advance event time 1h (>> ttl); next batches must drop the idle 20
    mem.addData(ev(100, "2024-01-01 01:00:00", 100, "click"))
    q.processAllAvailable()
    mem.addData(ev(101, "2024-01-01 01:00:01", 101, "click"))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    assert(after <= 2L, s"idle keys not evicted: $after state rows remain")
    // the live rows are still correct while their keys are within ttl
    val got = spark.table("ttl_last_seen_test")
      .filter(col("user_id") === 100L).select("event_type").as[String].collect().toSeq
    assert(got == Seq("click"))
  }

  test("as-of enrich state evicts under TTL; unbounded form keeps all keys") {
    implicit val sqlCtx = spark.sqlContext
    def signup(id: Long, t: String, u: Long): Ev =
      TestEv(id, java.sql.Timestamp.valueOf(t), u, "signup", u.toDouble, """{"k": 1}""")
    val mem = MemoryStream[Ev]
    val q = Enrich.asOfEnrichStateful(spark, mem.toDF(), ttl = Some("1 minute"))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_ttl_test")
      .trigger(tick)
      .start()

    mem.addData((1 to 15).map(u => signup(u.toLong, "2024-01-01 00:00:00", u.toLong)): _*)
    q.processAllAvailable()
    val loaded = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(loaded == 15L, s"expected 15 state rows after load, got $loaded")

    mem.addData(signup(100, "2024-01-01 01:00:00", 100))
    q.processAllAvailable()
    mem.addData(ev(101, "2024-01-01 01:00:01", 101, "click"))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(after <= 2L, s"idle as-of state not evicted: $after rows remain")

    // an event for an evicted user reads state-less (asof_value null) — the
    // documented post-purge semantics
    mem.addData(ev(102, "2024-01-01 01:00:02", 5, "click"))
    q.processAllAvailable()
    q.stop()
    val v = spark.table("asof_ttl_test")
      .filter(col("event_id") === 102L).select("asof_value")
      .as[Option[Double]].collect().toSeq
    assert(v == Seq(None), s"evicted user's state leaked back: $v")
  }

  test("achievements foreachBatch sink writes crossings to parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = managedTempDir("ach_sink")
    val mem = MemoryStream[Ev]
    val counts = Achievements.answerCounts(
      mem.toDF().withColumn("value", lit(90.0)))
    val q = Topology.startAchievementsSink(counts, s"$dir/out")
    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click"))
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$dir/out")
    assert(written.count() >= 1)
    assert(written.columns.contains("threshold_achieved"))
    // crash-replay idempotence: re-sinking batch 0's OWN rows overwrites its
    // partition instead of appending duplicates (only batch-0 rows replay —
    // re-sinking the whole directory under one id would conflate batches if
    // the stream ever produced more than one)
    val cnt = written.count()
    val batch0 = written.filter(col("batch_id") === 0L)
    assert(batch0.count() >= 1)
    Achievements.sinkToParquet(spark, batch0.drop("batch_id"), s"$dir/out", 0L)
    assert(spark.read.parquet(s"$dir/out").count() == cnt)
  }

  test("streaming OHLC resample equals batch under out-of-order arrival") {
    import graft.ext.TimeSeries
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Topology.startMemorySink(
      TimeSeries.resampleOhlcStreaming(mem.toDF()), "ohlc_test", tick)
    // hour 10: the true open (10:01) arrives LAST, in a later micro-batch;
    // a same-timestamp tie (ids 12/13) must break by event_id both ways
    def e(id: Long, t: String, v: Double) =
      TestEv(id, Timestamp.valueOf(t), 1L, "click", v, "{}")
    mem.addData(
      e(12, "2024-01-01 10:30:00", 7.0),
      e(13, "2024-01-01 10:30:00", 9.0),
      e(20, "2024-01-01 11:15:00", 2.0))
    q.processAllAvailable()
    mem.addData(e(10, "2024-01-01 10:01:00", 4.0))
    q.processAllAvailable()
    q.stop()
    // Update-mode memory sink: latest emission per key wins
    val got = spark.table("ohlc_test")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type", "h").orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
      .select("event_type", "h", "n_events", "sum_value", "low_value",
        "high_value", "open_value", "close_value")
    val batch = TimeSeries.resampleOhlc(Seq(
      e(12, "2024-01-01 10:30:00", 7.0),
      e(13, "2024-01-01 10:30:00", 9.0),
      e(20, "2024-01-01 11:15:00", 2.0),
      e(10, "2024-01-01 10:01:00", 4.0)).toDF())
      .select("event_type", "h", "n_events", "sum_value", "low_value",
        "high_value", "open_value", "close_value")
    val g = got.orderBy("h").collect().toSeq
    val b = batch.orderBy("h").collect().toSeq
    assert(g == b, s"streaming $g vs batch $b")
    // and the hour-10 open is the late-arriving event, close is id 13
    val h10 = g.head
    assert(h10.getDouble(6) == 4.0 && h10.getDouble(7) == 9.0)
  }
}
