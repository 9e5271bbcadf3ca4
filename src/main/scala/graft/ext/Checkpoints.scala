package graft.ext

import org.apache.spark.sql.DataFrame

/** Tracked eager localCheckpoints, shared by the iterative/fan-out operators
  * (Dedup's CC fixpoint, Similarity's recall harness): localCheckpoint blocks
  * live OUTSIDE the CacheManager (catalog clearCache never frees them), so
  * any operator that checkpoints an intermediate must release those blocks
  * explicitly once a later stage supersedes the data — otherwise a long-lived
  * session accumulates every invocation's blocks in executor storage.
  */
private[ext] object Checkpoints {

  /** Eager localCheckpoint that reports which RDD ids it persisted, so the
    * caller can release them once downstream results have materialized.
    *
    * The ids are read off the checkpointed DataFrame's own plan (the
    * `LogicalRDD` wrapping the persisted RDD), never by diffing the
    * session-global persistent-RDD map — a concurrent query (another
    * foreachBatch loop, a parallel bench query) persisting an RDD in the
    * same window must not get its blocks attributed here and torn down by
    * a later [[releaseTracked]].
    */
  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val out = df.localCheckpoint(true)
    val ids = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    (out, ids)
  }

  // A lazy localCheckpoint(false) variant existed in round 11; it was
  // removed after the round-11 driver bench showed concurrent first
  // consumers (broadcast threads in the recall harness fan-out) racing the
  // cache and duplicating the checkpointed subtree's final map work — a
  // nondeterministic ~10× on the O(N×Q) ground-truth scorer. Eager
  // materialization costs one small job per checkpoint and is deterministic.

  /** Unpersists checkpoint blocks by RDD id. Only call on ids whose data is
    * no longer reachable from any live plan (checkpointing truncated the
    * lineage, so unpersisted blocks cannot be recomputed).
    */
  def releaseTracked(df: DataFrame, ids: Set[Int]): Unit = {
    val persisted = df.sparkSession.sparkContext.getPersistentRDDs
    ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
  }
}
