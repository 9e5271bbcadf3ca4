package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global rank — the scalable replacement for
  * `row_number().over(Window.orderBy(...))`, whose unpartitioned window
  * funnels the whole input through ONE task. Fine for a k-row centroid
  * table; a straggler/OOM for a web-scale vocabulary (10⁸–10⁹ distinct
  * tokens).
  *
  * Shape: range-repartition on the sort keys (parallel sampling pass +
  * shuffle), sort within partitions, then `zipWithIndex` — one narrow
  * count job over partition sizes, then each partition stamps
  * `offset + local position`. No stage ever sees more than 1/P of the
  * data, and the second pass reuses the first's shuffle files (same
  * shuffle dependency, so the map stage is skipped).
  *
  * The rank equals the unpartitioned `row_number` exactly whenever the
  * sort keys are a TOTAL order (no ties) — true for every call site here
  * (distinct tokens). Range-partitioner sample boundaries only decide
  * which partition a key lands in, never its global position.
  */
private[graft] object Ranks {

  /** `df` plus a LongType `rankCol` numbering rows 1..N in `sortCols`
    * order. `sortCols` must be duplicate-free across rows or the rank is
    * sample-boundary-dependent.
    */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = sortedInput(df, sortCols: _*)
    val schema = sorted.schema.add(StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** The shuffle+sort stage under [[globalRank]], factored so PlanSpec can
    * pin its shape (range partitioning, never a SinglePartition exchange).
    */
  private[graft] def sortedInput(df: DataFrame, sortCols: Column*): DataFrame =
    df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
}
