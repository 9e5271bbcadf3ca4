package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators._

/** Unit specs for the reference-parity operators on tiny in-memory frames,
  * covering the edge cases SURVEY §5.2 calls out.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkEvents(rows: (Long, String, Long, String, Double, String)*) =
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("P1 branch splits disjointly and exhaustively") {
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:00:01", 1L, "click", 1.0, "{}"))
    assert(Ingest.mainBranch(e).count() + Ingest.anonymousBranch(e).count() == e.count())
    assert(Ingest.anonymousBranch(e).select("event_id").as[Long].collect().toSet == Set(1L))
  }

  test("P10 scrub coalesces null strings to empty and keeps allow-list only") {
    val df = Seq((1L, null.asInstanceOf[String], "x")).toDF("id", "s", "secret")
    val out = Ingest.scrubbed(df, Seq("id", "s"))
    assert(out.columns.toSeq == Seq("id", "s"))
    assert(out.as[(Long, String)].head() == ((1L, "")))
  }

  test("props parsing tolerates missing k (.path() tolerance)") {
    val e = mkEvents((1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"))
    assert(Ingest.withPropsK(e).select("k").as[Long].head() == 0L)
  }

  test("props parsing tolerates malformed JSON and non-numeric k") {
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "not json at all"),
      (2L, "2024-01-01 00:00:01", 1L, "click", 1.0, """{"k": "abc"}"""),
      (3L, "2024-01-01 00:00:02", 1L, "click", 1.0, null.asInstanceOf[String]))
    val ks = Ingest.withPropsK(e).select("k").as[Long].collect().toSeq
    assert(ks == Seq(0L, 0L, 0L)) // every failure mode coalesces to default
  }

  test("A1 latest-user keeps the most recent signup per user with event_id tie-break") {
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 7L, "signup", 10.0, "{}"),
      (2L, "2024-01-02 00:00:00", 7L, "signup", 20.0, "{}"),
      (3L, "2024-01-02 00:00:00", 7L, "signup", 30.0, "{}"),
      (4L, "2024-01-03 00:00:00", 7L, "click", 99.0, "{}"))
    val out = Enrich.latestUser(e).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("last_value") == 30.0)
  }

  test("A2 last-seen adds OVERALL row equal to per-user max") {
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-05 00:00:00", 1L, "click", 1.0, "{}"))
    val rows = Stats.lastSeen(e).collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Timestamp]("last_seen"))).toMap
    assert(rows("OVERALL") == ts("2024-01-05 00:00:00.0"))
    assert(rows("view") == ts("2024-01-01 00:00:00.0"))
    assert(rows.size == 3)
  }

  test("A3 counts sum to input size (property)") {
    val e = Tables.events(spark, sfDir)
    val total = Stats.eventTypeCounts(e).agg(sum("n")).as[Long].head()
    assert(total == e.count())
  }

  test("A5 sessions: merge at exactly the gap, break strictly past it") {
    // diff == gap merges (Spark session_window and the reference's
    // `convertedTime > threshold` agree); diff > gap breaks
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 04:00:00", 1L, "click", 1.0, "{}"),
      (3L, "2024-01-01 08:00:00.000001", 1L, "click", 1.0, "{}"))
    val out = Streaks.sessions(e).orderBy("streak_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("A5 session_window formulation equals exact per-key fold (differential)") {
    val e = Tables.events(spark, sfDir)
    val a = Streaks.sessions(e)
      .select(col("user_id"), unix_micros(col("streak_start")).as("s"),
        unix_micros(col("streak_end")).as("e"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Streaks.foldSessions(spark, e)
      .select(col("user_id"), col("streak_start_us"), col("streak_end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("A6 completion: missing question dimension row means incomplete (J2 missing-key)") {
    val e = mkEvents(
      // q_page = 999 not in part dim; correct attempt on part 1
      (1L, "2024-01-01 00:00:00", 1L, "click", 90.0, """{"k": 9991}"""))
    val part = Seq((1L, 3)).toDF("p_partkey", "p_size")
    val out = Questions.completion(e, part).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("question_part_count") == 0L)
    assert(!out(0).getAs[Boolean]("complete"))
  }

  test("A6 completion true when all parts correct") {
    val part = Seq((5L, 2)).toDF("p_partkey", "p_size")
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "click", 90.0, """{"k": 50}"""),
      (2L, "2024-01-01 00:00:01", 1L, "click", 91.0, """{"k": 51}"""))
    val out = Questions.completion(e, part).collect()
    assert(out.length == 1 && out(0).getAs[Boolean]("complete"))
  }

  test("A7 threshold chain picks the highest crossed threshold") {
    val cnts = Seq(0L, 1L, 4L, 5L, 99L, 100L, 1000L).toDF("c")
    val got = cnts.select(Achievements.thresholdReached(col("c"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 5L, 75L, 100L, 100L))
  }

  test("A7 crossings contains one row per crossed threshold") {
    val e = mkEvents(
      (1L, "2024-01-01 00:00:00", 1L, "click", 90.0, """{"k": 1}"""),
      (2L, "2024-01-01 00:00:01", 1L, "click", 91.0, """{"k": 2}"""),
      (3L, "2024-01-01 00:00:02", 1L, "click", 92.0, """{"k": 3}"""),
      (4L, "2024-01-01 00:00:03", 1L, "click", 93.0, """{"k": 4}"""),
      (5L, "2024-01-01 00:00:04", 1L, "click", 94.0, """{"k": 5}"""))
    val th = Achievements.crossings(e).select("threshold").as[Long].collect().toSet
    assert(th == Set(1L, 5L))
  }

  test("J1 enrichment is inner: events without a user record drop (containment)") {
    val e = Tables.events(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val enriched = Enrich.enriched(e, c)
    assert(enriched.count() <= e.count())
    // all event users exist in this testdata, so it is actually equal
    assert(enriched.count() == e.count())
  }

  test("funnel: strict order enforced, stalls emit nulls, pre-step events ignored") {
    def e(id: Long, t: String, u: Long, et: String) =
      (id, Timestamp.valueOf(t), u, et, 1.0, "{}")
    val evs = Seq(
      // user 1: full funnel in order — but ALSO a purchase BEFORE the
      // click (10:02), which must not count (strict after t3=10:03)
      e(1, "2024-01-01 10:00:00", 1, "signup"),
      e(2, "2024-01-01 10:01:00", 1, "view"),
      e(3, "2024-01-01 10:02:00", 1, "purchase"),
      e(4, "2024-01-01 10:03:00", 1, "click"),
      e(5, "2024-01-01 10:04:00", 1, "purchase"),
      // user 2: stalls after view (clicks BEFORE the view only)
      e(6, "2024-01-01 09:00:00", 2, "click"),
      e(7, "2024-01-01 09:30:00", 2, "signup"),
      e(8, "2024-01-01 09:45:00", 2, "view"),
      // user 3: never signs up — not a funnel entrant at all
      e(9, "2024-01-01 08:00:00", 3, "view"),
      e(10, "2024-01-01 08:05:00", 3, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Stats.funnel(evs).orderBy("user_id")
      .select("user_id", "depth").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L), (2L, 2L)))
    val u1 = Stats.funnel(evs).filter(col("user_id") === 1L)
      .select("t4").as[Timestamp].head()
    assert(u1 == Timestamp.valueOf("2024-01-01 10:04:00"),
      "the pre-click purchase must not complete the funnel")
  }

  test("retention: cohorted by signup week, drop-off counted, pre-week activity ignored") {
    def e(id: Long, t: String, u: Long, et: String) =
      (id, Timestamp.valueOf(t), u, et, 1.0, "{}")
    // 2024-01-01 is a Monday. users 1,2 cohort that week; user 2 is
    // active in week 1 too, user 1 is not. user 3 signs up week 1 and
    // has activity BEFORE its cohort week (must not count anywhere).
    val evs = Seq(
      e(1, "2024-01-02 10:00:00", 1, "signup"),
      e(2, "2024-01-03 10:00:00", 2, "signup"),
      e(3, "2024-01-09 10:00:00", 2, "click"),
      e(4, "2024-01-04 10:00:00", 3, "click"),
      e(5, "2024-01-10 10:00:00", 3, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Stats.cohortRetention(evs)
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "n_active", "n_cohort", "retained_ppm")
      .as[(Timestamp, Long, Long, Long, Long)].collect().toSeq
    val w1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = Timestamp.valueOf("2024-01-08 00:00:00")
    assert(out == Seq(
      (w1, 0L, 2L, 2L, 1000000L),   // both cohort users active week 0
      (w1, 1L, 1L, 2L, 500000L),    // only user 2 retained
      (w2, 0L, 1L, 1L, 1000000L)))  // user 3: pre-cohort click ignored
  }

  test("SCD2: consecutive runs merge, recurring status reopens a version") {
    def d(s: String) = Timestamp.valueOf(s"$s 00:00:00")
    val orders = Seq(
      // customer 1: O,O -> F -> O again (status recurs: three versions)
      (101L, 1L, "O", 10.0, d("1995-01-01"), "x"),
      (102L, 1L, "O", 10.0, d("1995-02-01"), "x"),
      (103L, 1L, "F", 10.0, d("1995-03-01"), "x"),
      (104L, 1L, "O", 10.0, d("1995-04-01"), "x"),
      // customer 2: single order, open-ended interval
      (201L, 2L, "P", 10.0, d("1995-06-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Relational.scd2OrderStatus(orders)
      .orderBy("o_custkey", "scd_ver")
      .select("o_custkey", "o_orderstatus", "valid_from", "valid_to",
        "n_orders", "scd_ver")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "O", d("1995-01-01"), Some(d("1995-03-01")), 2L, 1L),
      (1L, "F", d("1995-03-01"), Some(d("1995-04-01")), 1L, 2L),
      (1L, "O", d("1995-04-01"), None, 1L, 3L),
      (2L, "P", d("1995-06-01"), None, 1L, 1L)))
    // intervals chain: every valid_to equals the NEXT version's valid_from
    out.groupBy(_._1).values.foreach { runs =>
      runs.sortBy(_._6).sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }

  test("rolling features: RANGE frame ages out across a gap, lag crosses it") {
    def e(id: Long, t: String, v: Double) =
      (id, Timestamp.valueOf(t), 1L, "x", v, "{}")
    val evs = Seq(
      e(1, "2024-01-01 10:00:00", 1.0),
      e(2, "2024-01-01 10:30:00", 2.0),
      e(3, "2024-01-01 11:00:00", 4.0),
      // 30 h later: outside the trailing-24h RANGE frame of both hours
      e(4, "2024-01-02 17:00:00", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.TimeSeries.rollingFeatures(evs).orderBy("h")
      .select("n_events", "roll_n", "roll_sum", "roll_min", "roll_max",
        "roll_mean_micros")
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      (2L, 2L, 3.0, 1.0, 2.0, 1500000L),
      (1L, 3L, 7.0, 1.0, 4.0, 2333333L),
      // the gap hour sees ONLY itself — a ROWS frame would still carry 7.0
      (1L, 1L, 8.0, 8.0, 8.0, 8000000L)))
    val deltas = graft.ext.TimeSeries.rollingFeatures(evs).orderBy("h")
      .select("delta_n").as[Option[Long]].collect().toSeq
    // row-lag contract: the gap hour's delta is vs the previous OBSERVED hour
    assert(deltas == Seq(None, Some(-1L), Some(0L)))
  }

  test("MAD anomalies: only the spike crosses 3 MADs, integer med2/mad4") {
    // hourly counts 1,2,3,4,100 -> med2=6, d=[4,2,0,2,194], mad4=4:
    // flag iff 2d > 12, i.e. only the 100-count hour
    val rows = Seq(1, 2, 3, 4, 100).zipWithIndex.flatMap { case (n, hr) =>
      (0 until n).map(i => (hr * 1000L + i,
        Timestamp.valueOf(f"2024-01-01 1$hr%d:${i % 60}%02d:00"), 1L, "y",
        1.0, "{}"))
    }
    val evs = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.TimeSeries.hourlyAnomalies(evs)
      .select("h", "n_events", "med2", "mad4")
      .as[(Timestamp, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (Timestamp.valueOf("2024-01-01 14:00:00"), 100L, 6L, 4L)))
  }

  test("co-occurrence: pairs within (user, day) baskets, hub cap drops wide baskets") {
    // same day for everyone — distinct-set semantics carry the structure
    def r(id: Long, u: Long, et: String) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), u, et, 1.0, "{}")
    val evs = (Seq(
      r(1, 1, "a"), r(2, 1, "b"), r(3, 1, "c"), r(4, 1, "a"), // dup distinct-ed
      r(5, 2, "a"), r(6, 2, "b")) ++
      // user 3: 5 distinct types — wider than CooccurCap=4, dropped whole
      Seq("a", "b", "c", "d", "e").zipWithIndex.map { case (t, i) =>
        r(10 + i, 3, t)
      })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Stats.cooccurrence(evs).orderBy("type_a", "type_b")
      .select("type_a", "type_b", "pair_count", "user_count")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 2L),
      ("a", "c", 1L, 1L),
      ("b", "c", 1L, 1L)))
  }

  test("sessions: strict 30-min gap, exact-gap stays, bounces and durations exact") {
    def r(id: Long, u: Long, t: String) = (id, t, u, "view", 1.0, "{}")
    val evs = mkEvents(
      // user 1: [00:00, 00:10] one session, then 00:40:01 starts a new
      // single-event (bounce) session — gap 30m1s > 30m
      r(1, 1, "2024-01-01 00:00:00"), r(2, 1, "2024-01-01 00:10:00"),
      r(3, 1, "2024-01-01 00:40:01"),
      // user 2: gap of EXACTLY 30 min stays in-session (strict >)
      r(4, 2, "2024-01-01 00:00:00"), r(5, 2, "2024-01-01 00:30:00"))
    val out = Stats.sessionStats(evs).orderBy("user_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 3L, 2L, 600L * 1000000L),
      (2L, 1L, 0L, 2L, 2L, 1800L * 1000000L)))
  }

  test("transitions: per-user consecutive pairs only, exact ppm, ts ties by event_id") {
    def r(id: Long, u: Long, t: String, tp: String) = (id, t, u, tp, 1.0, "{}")
    val evs = mkEvents(
      // user 1: a -> b -> c (b and c share a timestamp; event_id orders them)
      r(1, 1, "2024-01-01 00:00:00", "a"),
      r(2, 1, "2024-01-01 00:00:01", "b"),
      r(3, 1, "2024-01-01 00:00:01", "c"),
      // user 2: a -> c; the c is terminal — no pair crosses into user 1
      r(4, 2, "2024-01-01 00:00:00", "a"),
      r(5, 2, "2024-01-01 00:00:05", "c"))
    val out = Stats.transitions(evs).orderBy("src", "dst")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 1L, 2L, 500000L),
      ("a", "c", 1L, 2L, 500000L),
      ("b", "c", 1L, 1L, 1000000L)))
  }

  test("ab lift: hash split deterministic, ppm exact, lift antisymmetric") {
    def r(id: Long, u: Long, tp: String) =
      (id, "2024-01-01 00:00:00", u, tp, 1.0, "{}")
    val evs = mkEvents(
      r(1, 1, "purchase"), r(2, 2, "view"), r(3, 3, "view"),
      r(4, 4, "purchase"), r(5, 5, "view"), r(6, 6, "purchase"),
      r(7, 6, "purchase")) // second conversion of one user counts once
    // variant 0: users 2,4,6 -> converters 4,6 (2/3); variant 1: users
    // 1,3,5 -> converter 1 (1/3)
    val out = Stats.abLift(evs).orderBy("variant")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 2L, 666666L, 333333L),
      (1L, 3L, 1L, 333333L, -333333L)))
    // single-parity corpus: the lone variant's row survives, lift null
    val solo = Stats.abLift(mkEvents(r(1, 2, "purchase"), r(2, 4, "view")))
      .collect()
    assert(solo.length == 1 && solo.head.getLong(0) == 0L
      && solo.head.isNullAt(4), solo.mkString(","))
  }

  test("rfm: quartile codes exact per axis, anchor from the data, non-purchases ignored") {
    def r(id: Long, u: Long, t: String, tp: String, v: Double) =
      (id, t, u, tp, v, "{}")
    val evs = mkEvents(
      r(1, 1, "2024-01-01 00:00:00", "purchase", 10.0),
      r(2, 1, "2024-01-04 00:00:00", "purchase", 20.0), // u1: 2 buys, 30 total, last day 4
      r(3, 2, "2024-01-04 00:00:00", "purchase", 5.0),  // u2: recency 0
      r(4, 3, "2024-01-02 00:00:00", "purchase", 100.0),// u3: recency 2, top spend
      r(5, 4, "2024-01-03 00:00:00", "purchase", 1.0),  // u4: recency 1
      r(6, 3, "2024-01-04 12:00:00", "view", 999.0))    // ignored: not a purchase
    // n=4 -> quartile == rank on each axis.
    // recency asc, user asc: u1(0), u2(0), u4(1), u3(2)
    // frequency desc:        u1(2), u2(1), u3(1), u4(1)
    // monetary desc:         u3(100), u1(30), u2(5), u4(1)
    val out = Stats.rfm(evs).orderBy("user_id")
      .select("user_id", "recency_days", "n_purchases", "monetary",
        "r_q", "f_q", "m_q", "rfm_code")
      .as[(Long, Long, Long, Double, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 30.0, 1L, 1L, 2L, 112L),
      (2L, 0L, 1L, 5.0, 2L, 2L, 3L, 223L),
      (3L, 2L, 1L, 100.0, 4L, 3L, 1L, 431L),
      (4L, 1L, 1L, 1.0, 3L, 4L, 4L, 344L)))
  }
}
