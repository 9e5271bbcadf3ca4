package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB path for the
  * enrichment join (J1) when the user dimension outgrows broadcast range
  * (SCALE.md j1_enrich fallback).
  *
  * Writing both sides bucketed by the join key (same bucket count) lets
  * Spark's planner satisfy the join's distribution requirement from the
  * table layout: the sort-merge join reads co-located buckets directly and
  * NO Exchange appears in the plan — the shuffle is paid once at write time
  * and amortized over every subsequent join. With sortBy on the key the
  * per-bucket sort is also pre-paid.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Equi-join of two bucketed tables on their bucket key. When both sides
    * are bucketed with the same count, the plan is exchange-free.
    */
  def bucketedJoin(spark: SparkSession, fact: String, dim: String, key: String): DataFrame =
    spark.table(fact).join(spark.table(dim), Seq(key))
}
