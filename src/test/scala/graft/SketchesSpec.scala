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

  test("sketch plans as one partial-combined aggregation, no distinct shuffle") {
    // the sketch's scale contract: map tasks fold tokens into ≤ k-long
    // buffers before the one per-group exchange — the token stream itself
    // is never shuffled and no dedup/window stage exists
    val df = Sketches.distinctKmv(Tables.documents(spark, sfDir))
    val p = df.queryExecution.executedPlan.toString // pre-collect: initial plan
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_kmvagg"), p) // map-side combine engaged
    assert(!p.contains("Window"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p) // one group-by shuffle only
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
  }

  test("MG candidates are a superset of true heavy hitters under any merge tree") {
    // adversarial stream: one item at ~1.2x the phi threshold buried in a
    // long tail of near-distinct noise, folded under three different
    // partition/merge shapes — the guarantee (freq > n/(m+1) => resident)
    // must hold for all of them even though surviving counters differ
    val m = 8
    val heavy = 1L
    val n = 1000
    val stream = (0 until n).map { i =>
      if (i % 7 == 0) heavy else 1000L + i // heavy freq 143 > 1000/9
    }
    val agg = graft.functions.MgSketch.agg(m)
    def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    val shapes = Seq(
      fold(stream),
      agg.merge(fold(stream.take(500)), fold(stream.drop(500))),
      stream.grouped(100).map(fold).reduce(agg.merge))
    shapes.foreach(s => assert(agg.finish(s).contains(heavy)))

    // end-to-end: two-pass heavy hitters == direct exact computation
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(col("text"), lit(". all rights reserved")).as("text"))
    val got = Sketches.heavyShingles(docs)
      .as[(String, Long)].collect().toSet
    val items = docs
      .select(col("doc_id"), graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("sh", graft.ext.TextAnalysis.shinglesFromTokens("toks"))
      .select(explode(col("sh")).as("shingle"))
    val total = items.count()
    val want = items.groupBy("shingle").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * Sketches.HhK > total)
      .as[(String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty) // the footer phrase must actually be phi-heavy here
  }

  test("CMS estimates over-count only, and are partition-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sketches.freqCms(docs)
      .select($"token", $"exact_freq", $"est_freq").as[(String, Long, Long)]
      .collect()
    assert(out.length == 20)
    // the textbook one-sided bound: a CMS cell only ever ADDS collisions
    for ((tok, exact, est) <- out)
      assert(est >= exact, s"$tok: est=$est < exact=$exact")
    // elementwise-sum merge => the matrix is a pure function of the input
    // multiset: a differently-partitioned stream yields the IDENTICAL rows
    val repart = Sketches.freqCms(docs.repartition(7))
      .select($"token", $"exact_freq", $"est_freq").as[(String, Long, Long)]
      .collect()
    assert(repart.sameElements(out), "CMS output depends on partitioning")
  }

  test("CMS point queries are exact when width swallows the key universe") {
    // 5 distinct tokens into a 256-wide row: P(any collision) is tiny but
    // not zero — this corpus is fixed and collision-free, so est == exact
    val docs = Seq(
      (1L, "a a a b c"),
      (2L, "b c d e a")).toDF("doc_id", "text")
    val out = Sketches.freqCms(docs, topK = 5)
      .select($"token", $"exact_freq", $"est_freq").as[(String, Long, Long)]
      .collect()
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map("a" -> 4L, "b" -> 2L, "c" -> 2L, "d" -> 1L, "e" -> 1L))
    for ((tok, exact, est) <- out) assert(est == exact, s"$tok: $est != $exact")
  }

  test("CMS sketch aggregates in streaming update mode; estimates track the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sketch = in.toDF().toDF("token")
      .select(Sketches.cmsCells(col("token")).as("cells"))
      .agg(graft.functions.CmsSketch.cms(col("cells"),
        Sketches.CmsD, Sketches.CmsW).as("sk"))
    val q = sketch.writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData("x", "y", "x")
      q.processAllAvailable()
      in.addData("x", "z")
      q.processAllAvailable()
      val sk = spark.table("cms_stream").select("sk").as[Seq[Long]].collect().last
      val est = Seq("x", "y", "z").toDF("token")
        .crossJoin(Seq(sk).toDF("sk"))
        .select(Sketches.cmsEstimate(col("sk"), col("token")))
        .as[Long].collect()
      assert(est(0) == 3L && est(1) == 1L && est(2) == 1L,
        s"streamed estimates ${est.toSeq} != Seq(3, 1, 1)")
    } finally q.stop()
  }

  test("trending tokens: per-window MG candidates, streaming matches batch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // window 1 spammed with "viral", window 2 with "quiet"; noise is distinct
    val rows = Seq(
      (t("2024-01-01 00:10:00"), "viral viral viral n1 n2"),
      (t("2024-01-01 00:40:00"), "viral viral n3"),
      (t("2024-01-01 01:20:00"), "quiet quiet quiet n4"))
    val batch = Sketches.trendingTokens(rows.toDF("ts", "text"), m = 4)
      .orderBy("win_start")
      .select("win_start", "candidates", "n_tokens")
      .as[(Timestamp, Seq[Long], Long)].collect()
    val hViral = Seq("viral").toDF("t")
      .select(graft.functions.Exact.md5Hash60(col("t"))).as[Long].head()
    val hQuiet = Seq("quiet").toDF("t")
      .select(graft.functions.Exact.md5Hash60(col("t"))).as[Long].head()
    assert(batch.length == 2)
    assert(batch(0)._2.contains(hViral) && batch(0)._3 == 8L)
    assert(batch(1)._2.contains(hQuiet) && batch(1)._3 == 4L)
    // streaming (update mode, watermark-bounded state) converges to batch
    val in = MemoryStream[(Timestamp, String)]
    val q = Sketches.trendingTokens(in.toDF().toDF("ts", "text"),
        m = 4, streaming = true)
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val fin = spark.table("trend_stream")
        .groupBy("win_start")
        .agg(last("candidates").as("c"), last("n_tokens").as("n"))
        .orderBy("win_start")
        .as[(Timestamp, Seq[Long], Long)].collect()
      assert(fin.map(r => (r._1, r._3)).toSeq == batch.map(r => (r._1, r._3)).toSeq)
      assert(fin(0)._2.contains(hViral) && fin(1)._2.contains(hQuiet))
    } finally q.stop()
  }

  test("MG sketch aggregates in streaming update mode; candidates stay a superset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val sketch = in.toDF().toDF("h")
      .agg(graft.functions.MgSketch.mg(col("h"), 4).as("cand"))
    val q = sketch.writeStream.format("memory").queryName("mg_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // heavy item 7 at ~40% of the stream, noise ids distinct
      in.addData(7L, 100L, 7L, 101L, 7L, 102L)
      q.processAllAvailable()
      in.addData(7L, 103L, 104L, 7L, 105L, 106L)
      q.processAllAvailable()
      val last = spark.table("mg_stream").select("cand")
        .as[Seq[Long]].collect().last
      assert(last.contains(7L), s"phi-heavy item evicted: $last")
      assert(last.size <= 4)
    } finally q.stop()
  }

  test("KMV sketch aggregates in streaming update mode with exact state") {
    // the buffer is mergeable + idempotent, so the same aggregator runs as
    // streaming state: two batches that re-send overlapping tokens must
    // land on the identical sketch a batch run produces
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val sketch = in.toDF().toDF("lang", "hv")
      .groupBy("lang").agg(graft.functions.KmvSketch.kmv(col("hv"), 4).as("mins"))
    val q = sketch.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(("en", 50L), ("en", 10L), ("en", 50L), ("de", 7L))
      q.processAllAvailable()
      in.addData(("en", 30L), ("en", 20L), ("en", 40L), ("en", 10L))
      q.processAllAvailable()
      // update mode emits one row per changed group per batch; assert both
      // the batch-1 partial state and the batch-2 final state appear
      val rows = spark.table("kmv_stream").select("lang", "mins")
        .as[(String, Seq[Long])].collect().toSet
      assert(rows.contains(("en", Seq(10L, 50L))))          // after batch 1
      assert(rows.contains(("en", Seq(10L, 20L, 30L, 40L)))) // 50 evicted, 10 deduped
      assert(rows.contains(("de", Seq(7L))))
    } finally q.stop()
  }

  test("histogram sketch aggregates in streaming update mode; quantiles track the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val sketch = in.toDF().toDF("event_type", "value")
      .select(col("event_type"), Sketches.histBin(col("value")).as("bin"))
      .groupBy("event_type")
      .agg(graft.functions.HistSketch.hist(col("bin"), Sketches.HistBins).as("h"))
    val q = sketch.writeStream.format("memory").queryName("hist_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(("x", 1.0), ("x", 9.0))
      q.processAllAvailable()
      in.addData(("x", 100.0), ("x", 9.5))
      q.processAllAvailable()
      // update mode re-emits the group's FULL merged histogram per batch;
      // the last row is the whole-stream multiset's histogram — the same
      // purity contract the batch merge-invariance test pins
      val h = spark.table("hist_stream").select("h")
        .as[Seq[Long]].collect().last
      assert(h(0) == 1L && h(1) == 2L && h(12) == 1L && h.sum == 4L,
        s"streamed bins ${h.zipWithIndex.filter(_._1 != 0)}")
    } finally q.stop()
  }

  test("histogram quantiles: rank/bin arithmetic exact, edges clamp, merge-invariant") {
    // bin width 8: values below 0 clamp to bin 0, above 512 to bin 63.
    // n=10 -> rank(p50)=5, rank(p90)=9, rank(p99)=10
    val vals = Seq(1.0, 1.0, 1.0, 1.0, -3.0, // 5 rows in bin 0
      100.0, 100.0, 101.0, 103.9,            // 4 rows in bin 12
      600.0)                                  // 1 row clamped to bin 63
    val evs = vals.map(("x", _)).toDF("event_type", "value")
      .repartition(8) // force cross-partition sketch merges
    val out = Sketches.histQuantiles(evs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("x", 10L, 0L, 12L, 63L)))
  }

  test("histogram sketch shuffles arrays, never the value stream") {
    val df = Sketches.histQuantiles(Tables.events(spark, sfDir))
    val p = df.queryExecution.executedPlan.toString
    // one partial-combined aggregation: per-group exchange carries the
    // bins-long buffers built map-side; no dedup/window/sort over values
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HistAgg"), p)
  }
}
