package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** General relational/analytics surface over the star schema — the added
  * capabilities (§2.6 "Spark provides natively") proven at scale-shape:
  * scan→filter→agg, multi-way joins with broadcast dimensions, top-k.
  *
  * These are also the bench workhorses: filters/projections push to parquet,
  * dimensions broadcast, and each query is a single shuffle on its group key.
  */
object Relational {

  /** Pricing-summary style aggregate over lineitem (exact decimal sums). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.moneySum(col("l_quantity")).as("sum_qty"),
        Exact.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Exact.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Top-N orders by discounted revenue (agg + join + global top-k).
    *
    * The aggregation runs BELOW the join: the output grouping keys
    * (o_orderdate, o_orderpriority) are functionally dependent on the order
    * key, so revenue is aggregated per l_orderkey first — the shuffle
    * carries (key, decimal) pairs with map-side combine instead of
    * join-widened rows — and orders attaches to the 4×-smaller aggregate.
    * The agg's hash partitioning on the key also satisfies the join's
    * distribution, so the aggregate side is NOT re-shuffled; at fact-scale
    * (where orders is too big to broadcast) that is one narrow shuffle per
    * side and nothing re-partitioned twice. Top-k still plans as
    * TakeOrderedAndProject (asserted in PlanSpec), never a global sort.
    */
  def topRevenueOrders(spark: SparkSession, dir: String, n: Int): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    lineitem
      .groupBy("l_orderkey")
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(n)
  }

  /** Full-outer + left-outer join surface with null keys on BOTH sides —
    * the null-semantics audit the inner/semi/anti/as-of family doesn't
    * exercise. Keys are nulled deterministically (customer: every 7th key;
    * orders: every 3rd FK; nation FK: every 5th) so both engines construct
    * the same frames: null keys never equi-join (SQL three-valued logic),
    * so nulled customers surface as left-only rows, their orders as
    * right-only rows, and the nulled-FK group as one right-only row; the
    * trailing LEFT join keeps rows whose nation FK is null.
    *
    * Scale shape: the orders side pre-aggregates to one row per customer
    * BEFORE the full outer join (the shuffle carries (key, 2 longs), and
    * the agg's hash partitioning satisfies the join's distribution — same
    * posture as topRevenueOrders); the nation dimension broadcasts. Output
    * is integral/flag columns with a deterministic total order.
    */
  def outerJoinAudit(customer: DataFrame, orders: DataFrame,
                     nation: DataFrame): DataFrame = {
    val c = customer.select(
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_custkey"))
        .as("cust_key"),
      col("c_custkey").as("cust_id"),
      when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_nationkey"))
        .as("nat_key"))
    val o = orders.select(
        when(col("o_custkey") % 3 === 0, lit(null)).otherwise(col("o_custkey"))
          .as("o_cust_key"),
        col("o_orderkey"))
      .groupBy("o_cust_key")
      .agg(count(lit(1)).as("n_orders"), max(col("o_orderkey")).as("max_order"))
    c.join(o, col("cust_key") === col("o_cust_key"), "full_outer")
      .join(broadcast(nation), col("nat_key") === col("n_nationkey"), "left")
      .select(
        col("cust_id"),
        coalesce(col("n_orders"), lit(-1L)).as("n_orders"),
        coalesce(col("max_order"), lit(-1L)).as("max_order"),
        coalesce(col("n_name"), lit("NONE")).as("nation_name"),
        col("cust_id").isNotNull.cast("int").as("has_cust"),
        col("o_cust_key").isNotNull.cast("int").as("has_orders"))
      .orderBy(coalesce(col("cust_id"), lit(-1L)), col("max_order"))
  }

  /** Revenue per nation through the full join chain
    * customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation with the
    * local-supplier condition — exercises multi-join planning; all
    * dimensions broadcast, facts shuffle once.
    */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(Exact.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Set-operation surface (union / intersect / except — absent in the
    * reference, SURVEY §2.6): users who signed up or purchased, and clicked,
    * excluding any who hit errors.
    */
  def engagedUsers(events: DataFrame): DataFrame = {
    def users(t: String) =
      events.filter(col("event_type") === lit(t)).select("user_id").distinct()
    val errorProne = events.filter(col("event_type") === lit("error"))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 10).select("user_id")
    users("signup").union(users("purchase")).distinct()
      .intersect(users("click"))
      .except(errorProne)
  }

  /** The same engaged-users relation as ONE conditional aggregation — the
    * production form at 100 TB: the set-op surface above scans the fact
    * table once per branch (pushed filters prune, but it is still four
    * passes); this is one scan, one shuffle, bit-identical output
    * (equivalence tested).
    */
  def engagedUsersSinglePass(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("s"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        count(when(col("event_type") === "error", 1)).as("e"))
      .filter((col("s") === 1 || col("p") === 1) && col("c") === 1 && !(col("e") > 10))
      .select("user_id")

  /** Semi/anti join surface (absent in the reference — SURVEY §2.3; Spark
    * provides them natively): customers WITH error events (semi) and
    * customers with NO events at all (anti), tagged in one relation.
    */
  def customerEngagement(events: DataFrame, customer: DataFrame): DataFrame = {
    val keys = customer.select(col("c_custkey").as("user_id"))
    val withErrors = keys.join(
      events.filter(col("event_type") === lit("error")), Seq("user_id"), "left_semi")
      .withColumn("status", lit("HAS_ERRORS"))
    val inactive = keys.join(events, Seq("user_id"), "left_anti")
      .withColumn("status", lit("INACTIVE"))
    withErrors.unionByName(inactive)
  }

  /** P10 — null-scrub after a null-producing enrichment (the reference's
    * NullHandler, KafkaLoader.java:132-135): left join against a sparse
    * dimension, then coalesce string columns to "" via the scrub allow-list.
    */
  def scrubbedSupplierEnrich(events: DataFrame, supplier: DataFrame): DataFrame = {
    val joined = events.join(
      broadcast(supplier.select(col("s_suppkey"), col("s_name").as("supplier_name"))),
      col("user_id") === col("s_suppkey"), "left")
    Ingest.scrubbed(joined, Seq("event_id", "user_id", "supplier_name"))
  }

  /** Pivot: per-role event counts widened to one column per event type.
    * The value list is EXPLICIT (not inferred) — at scale, value inference
    * is an extra distinct scan, and a fixed list keeps the output schema
    * deterministic. Absent combinations are 0, not null (fill matches the
    * CASE-aggregation the oracle uses).
    */
  val PivotEventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  def eventTypePivot(events: DataFrame, customer: DataFrame): DataFrame =
    Enrich.enriched(events, customer)
      .groupBy("user_role")
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotEventTypes)

  /** Unpivot (melt): the per-source rollup narrowed to (source, metric,
    * value) rows — the inverse reshaping, via the native unpivot operator.
    */
  def sourceStatsUnpivot(sourceStats: DataFrame): DataFrame =
    sourceStats
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("min_chars").cast("long").as("min_chars"),
        col("max_chars").cast("long").as("max_chars"))
      .unpivot(Array(col("source")),
        Array(col("n_docs"), col("total_chars"), col("min_chars"), col("max_chars")),
        "metric", "metric_value")

  /** P6/P7 — composite-key build and split-back
    * (DerivedStreams.java:139-149, 240-242): concat user and page into
    * `{user}-{page}`, then recover both halves with substring_index. The
    * preferred form keeps separate grouping columns (SURVEY §2.2 P6); this
    * operator exists to prove the literal key algebra.
    */
  def compositeKeyRoundtrip(events: DataFrame): DataFrame =
    Ingest.questionAttempts(events)
      .withColumn("composite_key", concat(col("user_id"), lit("-"), col("q_page")))
      .groupBy("composite_key")
      .agg(count(lit(1)).as("n"))
      .withColumn("user_id_back", expr("substring_index(composite_key, '-', 1)").cast("long"))
      .withColumn("q_page_back", expr("substring_index(composite_key, '-', -1)").cast("long"))
      .select("composite_key", "user_id_back", "q_page_back", "n")

  /** SCD type-2 history build: collapse each customer's order-status
    * timeline into validity intervals `[valid_from, valid_to)` — the
    * dimension-history form of the reference's latest-value KTable (A1 is
    * SCD1: keep the last; this keeps them ALL, versioned). Consecutive
    * orders with the same status merge into one run; a status that recurs
    * later opens a NEW version (run-length islands, not a status groupBy).
    *
    * Run detection is the lag-change + running-sum formulation
    * (one window spec, total order `o_orderdate, o_orderkey`): the
    * change-flag, the run id, the run aggregation, AND the final
    * `lead(valid_from)` all hash on `o_custkey` alone, so the whole
    * operator is ONE exchange of the orders projection — the rn−rn_s
    * two-ranking alternative costs a second (custkey, status) shuffle for
    * the same result.
    */
  def scd2OrderStatus(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = orders
      .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(byCust).isNull
          || lag(col("o_orderstatus"), 1).over(byCust) =!= col("o_orderstatus"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(running))
    val byRun = Window.partitionBy(col("o_custkey")).orderBy(col("run_id"))
    seq.groupBy("o_custkey", "run_id")
      .agg(min("o_orderstatus").as("o_orderstatus"),
        min("o_orderdate").as("valid_from"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"), col("o_orderstatus"), col("valid_from"),
        lead(col("valid_from"), 1).over(byRun).as("valid_to"),
        col("n_orders"), col("run_id").as("scd_ver"))
  }
}
