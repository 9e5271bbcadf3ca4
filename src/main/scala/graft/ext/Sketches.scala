package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Exact, KmvSketch}

/** Deterministic cardinality sketches for corpus-scale profiling.
  *
  * KMV (k-minimum-values) distinct-count estimation, after Bar-Yossef et al.,
  * "Counting distinct elements in a data stream" (RANDOM 2002): hash every
  * value uniformly into [0, 2^60), keep the k smallest distinct hashes; the
  * k-th smallest h_(k) estimates the cardinality as (k-1) * 2^60 / h_(k).
  *
  * Why this over HLL (`approx_count_distinct`): with a fixed hash the KMV
  * sketch is a pure function of the input SET — bit-identical across engines,
  * partitionings and row orders — so it sits under the DuckDB oracle gate
  * like every exact operator, while still being a sketch a 100 TB profile
  * job would actually ship (the k-min survives as a mergeable summary; union
  * of sketches = k smallest of the merged sets).
  *
  * Scale shape (the reason to sketch at all): explode + hash is narrow; the
  * dedup shuffle keys on (group, hash) so it is uniform even when the group
  * key alone is skewed (a handful of langs over billions of tokens); the
  * per-group k-min then plans as WindowGroupLimit — each map task forwards at
  * most k rows per group, so the final per-group shuffle moves O(k × tasks)
  * rows, never the token stream. No stage materializes a per-group state
  * larger than k longs.
  */
object Sketches {

  /** Sketch size: 64 k-min values ≈ 12.5% standard error (1/sqrt(k)). */
  val KmvK = 64

  /** Size of the md5Hash60 hash space, 2^60. */
  val HashSpace: Long = 1L << 60

  /** Per-language KMV sketch + cardinality estimate over the distinct-token
    * universe of `documents`. Output: (lang, kth_min, k_used, distinct_est).
    * Groups holding fewer than k distinct values degrade to the exact count
    * (the sketch contains the whole set), mirroring the textbook estimator.
    *
    * The sketch is [[graft.functions.KmvSketch]]'s mergeable Aggregator, so
    * the whole job is ONE aggregation: map tasks fold the token stream into
    * ≤ k-long buffers (duplicates collapse inside the buffer — no distinct
    * shuffle exists anywhere), and the per-group exchange moves one small
    * array per map task. A first cut dedup-shuffled (group, hash) and
    * window-ranked the survivors; the aggregator form deletes that shuffle
    * — the difference between "profiles 100 TB" and "re-keys 100 TB".
    *
    * The estimate arithmetic stays integral end-to-end: (k-1) * 2^60
    * overflows BIGINT for k > 8, so both engines compute it in wide exact
    * types (DECIMAL(38,0) here, HUGEINT in the oracle) and floor-divide —
    * identical positive integral results, no float in sight.
    */
  def distinctKmv(documents: DataFrame, k: Int = KmvK): DataFrame =
    documents
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .select(col("lang"), Exact.md5Hash60(col("token")).as("hv"))
      .groupBy("lang")
      .agg(KmvSketch.kmv(col("hv"), k).as("mins"))
      .select(col("lang"),
        element_at(col("mins"), -1).as("kth_min"),
        size(col("mins")).cast("long").as("k_used"))
      .withColumn("distinct_est",
        when(col("k_used") < k, col("k_used")).otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0))) div kth_min AS BIGINT)")))
      .select("lang", "kth_min", "k_used", "distinct_est")

  /** Exact per-language distinct-token counts — the ground truth the sketch
    * approximates. Not a `queries` entry (it IS the expensive full-dedup the
    * sketch avoids); used by SketchesSpec to pin the estimator's error.
    */
  def distinctExact(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .select(col("lang"), Exact.md5Hash60(col("token")).as("hv"))
      .dropDuplicates("lang", "hv")
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("exact_distinct"))
}
