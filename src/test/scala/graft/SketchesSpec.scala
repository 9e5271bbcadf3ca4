package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** Specs for the deterministic cardinality sketches. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands within the expected error band of exact distinct") {
    // k=64 -> ~12.5% standard error; the sketch is deterministic, so pin a
    // 3-sigma bound — a regression in the estimator arithmetic (wrong hash
    // space, off-by-one in k) lands far outside it
    val docs = Tables.documents(spark, sfDir)
    val est = Sketches.distinctKmv(docs)
      .select($"lang", $"distinct_est").as[(String, Long)].collect().toMap
    val exact = Sketches.distinctExact(docs)
      .select($"lang", $"exact_distinct").as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    for ((lang, ex) <- exact) {
      val relErr = math.abs(est(lang) - ex).toDouble / ex
      assert(relErr <= 0.375, s"$lang: est=${est(lang)} exact=$ex relErr=$relErr")
    }
  }

  test("groups below k distinct values degrade to the exact count") {
    val docs = Seq(
      (1L, "alpha beta gamma", "tiny"),
      (2L, "beta gamma delta", "tiny")).toDF("doc_id", "text", "lang")
    val row = Sketches.distinctKmv(docs).collect().head
    assert(row.getAs[Long]("k_used") == 4L)
    assert(row.getAs[Long]("distinct_est") == 4L) // alpha beta gamma delta
  }

  test("per-group k-min plans as WindowGroupLimit over one corpus scan") {
    // the sketch's scale contract: map tasks forward at most k rows per
    // group into the final per-group shuffle — never the token stream
    val df = Sketches.distinctKmv(Tables.documents(spark, sfDir))
    val p = df.queryExecution.executedPlan.toString // pre-collect: initial plan
    assert(p.contains("WindowGroupLimit"), p)
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
  }
}
