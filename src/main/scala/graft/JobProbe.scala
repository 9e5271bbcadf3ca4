package graft

import org.apache.spark.sql.SparkSession

/** Diagnostics main for stage-count work: runs the named queries (args;
  * default = the three stage-heaviest ANN queries) with a job/stage
  * listener and prints median wall, job count, stage count, and
  * stage-exec sums per query. Stage COUNT is the robustness metric for
  * loud-host bench windows: each job/stage launch pays a scheduler
  * round-trip that contention multiplies 5–15×, while data-bound work
  * only degrades ~1.3× (VERDICT r12). Use before/after any change meant
  * to collapse a serial stage chain:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProbe ann_ivfpq_top1"`.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val stageExec = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageExec.addAndGet(s.stageInfo.taskMetrics.executorRunTime); ()
      }
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("ann_kmeans_step", "ann_ivfpq_top1", "ann_recall")
    // warmup on the tiny SF exactly like Bench, so JIT/codegen is excluded
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { f =>
        try f(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        jobs.set(0); stages.set(0); stageExec.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, jobs.get, stages.get, stageExec.get)
      }
      val med = reps.sortBy(_._1).apply(1)
      println(f"$n%-22s median ${med._1}%6.2f s  jobs=${med._2}%3d stages=${med._3}%3d stage-exec=${med._4}ms")
    }
    spark.stop()
  }
}
