package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank — the scalable replacement for
  * `row_number().over(Window.orderBy(...))`, whose unpartitioned window
  * funnels the whole input through ONE task. Fine for a k-row centroid
  * table; a straggler/OOM for a web-scale vocabulary (10⁸–10⁹ distinct
  * tokens).
  *
  * Shape: range-repartition on the sort keys (parallel sampling pass +
  * shuffle), sort within partitions, then the classic two-pass stamp —
  * per-partition counts roll into exclusive prefix offsets, and each row's
  * rank is its partition offset plus its position within the partition.
  * Both passes are DataFrame ops (no RDD drop-out): positions come from
  * `monotonically_increasing_id()`, whose value is partition-id << 33 plus
  * the row's 0-based position in partition order — evaluated AFTER the
  * within-partition sort, so the low bits ARE the local sort position.
  * The counts aggregate carries one row per partition; its running-sum
  * window and the offset join are metadata-scale (numShufflePartitions
  * rows, broadcast), so no stage ever funnels the DATA through one task,
  * and Catalyst/AQE plan the whole thing (the former `rdd.zipWithIndex`
  * form added an opaque extra job and blocked exchange reuse for
  * downstream consumers).
  *
  * The rank equals the unpartitioned `row_number` exactly whenever the
  * sort keys are a TOTAL order (no ties) — true for every call site here
  * (distinct tokens). Range-partitioner sample boundaries only decide
  * which partition a key lands in, never its global position. Positions
  * within a partition overflow their 33-bit field only past 8.5 billion
  * rows per partition — far beyond any partition a sized deployment
  * produces.
  */
private[graft] object Ranks {

  /** `df` plus a LongType `rankCol` numbering rows 1..N in `sortCols`
    * order. `sortCols` must be duplicate-free across rows or the rank is
    * sample-boundary-dependent.
    */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val localMask = (1L << 33) - 1
    val withMid = sortedInput(df, sortCols: _*)
      .withColumn("_graft_mid", monotonically_increasing_id())
    val offsets = withMid
      .groupBy(shiftright(col("_graft_mid"), 33).as("_graft_pid"))
      .agg(count(lit(1)).as("_graft_cnt"))
      .withColumn("_graft_offset",
        coalesce(sum("_graft_cnt").over(Window.orderBy("_graft_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_pid", "_graft_offset")
    withMid
      .join(broadcast(offsets),
        shiftright(col("_graft_mid"), 33) === col("_graft_pid"))
      .withColumn(rankCol,
        col("_graft_offset") + col("_graft_mid").bitwiseAND(localMask) + 1L)
      .drop("_graft_mid", "_graft_pid", "_graft_offset")
  }

  /** Per-group [[globalRank]]: numbers rows 1..N_g within each value of
    * `groupCol`, all groups in ONE range exchange — the multi-axis rank
    * for callers that need several independent global orderings of the
    * same frame (RFM's three quartile axes): instead of one
    * range-exchange + offsets-broadcast + join PER axis, the caller
    * explodes to (axis, key) rows and ranks every axis in a single pass.
    * Same two-pass stamp as [[globalRank]], with the offsets keyed
    * (group, partition): a group's rows are CONTIGUOUS within each
    * range-sorted partition (group leads the sort key), so the row's
    * in-group local index is `mid − min(mid | group, partition)` and its
    * global in-group rank adds the exclusive prefix of the group's
    * per-partition counts. The offsets frame is groups × partitions rows
    * — broadcast scale — and its prefix window partitions by group, so
    * nothing funnels the data through one task. Exact row_number
    * semantics under the same precondition as [[globalRank]]:
    * (sortCols) must totally order rows WITHIN each group. The offsets
    * join is NULL-SAFE on the group key, so rows whose group is NULL rank
    * as their own group instead of silently dropping (ADVICE r21; the rfm
    * caller uses non-null axis literals, but the helper is generic).
    */
  def globalRankPerGroup(df: DataFrame, groupCol: String, rankCol: String,
                         sortCols: Column*): DataFrame = {
    val keys = col(groupCol) +: sortCols
    val withMid = df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_graft_mid", monotonically_increasing_id())
    val offsets = withMid
      .groupBy(col(groupCol).as("_graft_g"),
        shiftright(col("_graft_mid"), 33).as("_graft_pid"))
      .agg(count(lit(1)).as("_graft_cnt"), min(col("_graft_mid")).as("_graft_min"))
      .withColumn("_graft_offset",
        coalesce(sum("_graft_cnt").over(Window.partitionBy("_graft_g")
          .orderBy("_graft_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_g", "_graft_pid", "_graft_offset", "_graft_min")
    withMid
      .join(broadcast(offsets),
        col(groupCol) <=> col("_graft_g") &&
          shiftright(col("_graft_mid"), 33) === col("_graft_pid"))
      .withColumn(rankCol,
        col("_graft_offset") + (col("_graft_mid") - col("_graft_min")) + 1L)
      .drop("_graft_mid", "_graft_g", "_graft_pid", "_graft_offset", "_graft_min")
  }

  /** The shuffle+sort stage under [[globalRank]], factored so PlanSpec can
    * pin its shape (range partitioning, never a SinglePartition exchange).
    */
  private[graft] def sortedInput(df: DataFrame, sortCols: Column*): DataFrame =
    df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
}
