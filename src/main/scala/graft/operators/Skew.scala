package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale joins and aggregations.
  *
  * AQE's skew-join splitting (on by default) handles most cases at runtime;
  * these explicit forms are for the pathological hot-key cases AQE can't
  * fix — e.g. a shuffled join where one key holds 1% of all rows, or a
  * two-phase aggregation whose single hot group overwhelms one reducer.
  */
object Skew {

  /** Salted shuffled join for a skewed fact side: the fact's key is salted
    * into `saltBuckets` sub-keys (deterministically, by hashing a stable
    * tie-breaker column so results are reproducible), and the dimension is
    * replicated across every salt value. Use when the dimension is too big
    * to broadcast AND the fact key distribution is heavily skewed.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 factSaltSource: String, saltBuckets: Int): DataFrame = {
    val salted = facts.withColumn("__salt",
      pmod(hash(col(factSaltSource)), lit(saltBuckets)))
    val replicated = dim
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys: partial count per
    * (key, salt), then final combine per key. Spark's map-side partial
    * aggregation already does this for algebraic aggregates; this explicit
    * form is for aggregates that buffer per group (collect_list/percentile)
    * where one hot key would concentrate on a single reducer.
    */
  def saltedCount(df: DataFrame, key: String, saltSource: String,
                  saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
}
