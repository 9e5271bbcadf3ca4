package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Fuzzy

/** Scale-evidence probe for the SymSpell fuzzy join (SCALE.md): grows BOTH
  * universes together — |Q| = 100×s queries, |D| = 10,000×s dictionary
  * terms at s ∈ {1, 2, 4, 8} — and times the delete-neighborhood blocked join
  * against the brute-force length-banded `levenshtein` verify the DuckDB
  * oracle twin uses. Growing both sides is the regime that separates the
  * two: brute verify work is |Q|·|D| (quadratic in s, exponent ≈ 2), the
  * blocked join's work is neighborhood generation (linear) plus
  * shared-key candidates (the planted matches — linear), so its measured
  * exponent should stay ≈ lin.
  *
  * The synthesized universes are md5-hex 12-char terms (cross-pair
  * distance ≤ 1 collisions essentially never happen), with every query a
  * one-char deletion of a dictionary term — so the TRUE match set is the
  * planted one, identical for both formulations, and the probe asserts
  * result-set equality before timing.
  */
object FuzzyScaleProbe {

  def dict(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      substring(md5(concat(lit("d:"), col("id"))), 1, 12).as("term"))

  def queries(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      substring(md5(concat(lit("d:"), col("id"))), 1, 12).as("term"))
      .select(col("doc_id"), expr(
        """concat(substring(term, 1, CAST(doc_id % 12 AS INT)),
          |       substring(term, CAST(doc_id % 12 AS INT) + 2, 12))"""
          .stripMargin).as("q_term"))

  /** Brute-force twin: length-banded cross join + levenshtein — the
    * oracle's formulation, as a Spark job.
    */
  def brute(q: DataFrame, d: DataFrame): DataFrame =
    q.crossJoin(d.select(col("term").as("dict_term")))
      .filter(abs(length(col("q_term")) - length(col("dict_term"))) <= 1)
      .filter(levenshtein(col("q_term"), col("dict_term")) <= 1)
      .select(col("doc_id"), col("q_term"), col("dict_term"),
        levenshtein(col("q_term"), col("dict_term")).cast("long").as("dist"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (s <- Seq(1, 2, 4, 8)) {
      val d = dict(spark, 10000L * s)
      val q = queries(spark, 100L * s)
      // same result set before timing (the blocked join's losslessness
      // at scale, not just on the spec's mini-universe)
      val got = Fuzzy.fuzzyMatch(q, d)
        .select("doc_id", "dict_term").distinct().count()
      val want = brute(q, d)
        .select("doc_id", "dict_term").distinct().count()
      require(got == want, s"blocked=$got brute=$want at s=$s")
      val tBlocked = ProbeUtil.median3(Fuzzy.fuzzyMatch(q, d))
      val tBrute = ProbeUtil.median3(brute(q, d))
      println(s"""{"probe":"fuzzy","scale":$s,"dict":${10000 * s},""" +
        s""""queries":${100 * s},"matches":$got,""" +
        s""""blocked_s":${ProbeUtil.r2(tBlocked)},"brute_s":${ProbeUtil.r2(tBrute)}}""")
    }
    spark.stop()
  }
}
