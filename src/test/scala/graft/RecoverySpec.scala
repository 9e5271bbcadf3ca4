package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats
import graft.streaming.Topology

/** Checkpoint-recovery semantics: a streaming aggregation stopped and
  * restarted from its checkpoint must resume state (not recount) and pick up
  * files that arrived while it was down — the effectively-once behavior that
  * replaces the reference's at-least-once Kafka 0.10 setup (SURVEY §2.8).
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("streaming agg restarts from checkpoint and resumes state") {
    val root = managedTempDir("recovery")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()

    def writeBatch(ids: Range): Unit =
      ids.map(i => TestEv(i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          i.toLong % 3, "click", 1.0, "{}"))
        .toDF().write.mode("append").parquet(srcDir)

    // parquet sink supports only Append; use foreachBatch to materialize the
    // running counts per micro-batch (the reference's store-flush shape)
    def startQuery() =
      Stats.eventTypeCounts(Topology.fileSource(spark, srcDir))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .start()

    writeBatch(0 until 10)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // files arriving while the query is down
    writeBatch(10 until 25)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val counts = spark.read.parquet(outDir)
      .agg(sum("n")).as[Long].head()
    // update-mode emission after restart carries the resumed total:
    // 25 events overall, all one event_type -> n = 25
    assert(counts == 25L)
  }

  test("crossing detector state survives restart: no threshold re-emitted") {
    import graft.operators.Achievements
    val root = managedTempDir("xrecovery")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()

    def writeCorrect(ids: Range): Unit =
      ids.map(i => TestEv(i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          1L, "click", 90.0, """{"k": 1}"""))
        .toDF().write.mode("append").parquet(srcDir)

    def startQuery() =
      Achievements.crossingsStreaming(spark, Topology.fileSource(spark, srcDir))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .start()

    // 3 correct answers -> crosses threshold 1 only
    writeCorrect(0 until 3)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // 4 more while down -> count 7 crosses threshold 5; GroupState restored
    // from the checkpoint must NOT re-emit threshold 1
    writeCorrect(3 until 7)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
      .select("user_id", "threshold").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 5L)))
  }
}
