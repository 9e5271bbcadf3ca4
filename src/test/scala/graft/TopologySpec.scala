package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.streaming.Topology

/** End-to-end streaming topology: one file source fanned out to EVERY named
  * store (the reference's full wired topology), processed to completion, and
  * spot-checked against batch recomputation. This is the test that catches
  * operators that are legal in batch but not in a streaming plan.
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  test("full store fan-out runs from a file source and converges to batch") {
    val dir = managedTempDir("topo")
    val batchEvents = Tables.events(spark, sfDir)
    // write with the streaming-readable schema (plain micros timestamps)
    batchEvents.write.mode("overwrite").parquet(s"$dir/events")
    val userDim = Tables.customer(spark, sfDir)

    val src = Topology.fileSource(spark, s"$dir/events")
    val stores = Topology.stores(src, userDim, watermark = Some("1 minute"))
    val queries = stores.map { case (name, df) =>
      name -> Topology.startMemorySink(df, name,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    }
    queries.values.foreach(_.processAllAvailable())
    queries.values.foreach(_.stop())

    // every store produced rows
    stores.keys.foreach { name =>
      assert(spark.table(name).count() > 0, s"store $name is empty")
    }

    // convergence spot-checks (memory sink keeps the update changelog; the
    // latest row per key is the converged value)
    val batchCounts = Stats.eventTypeCounts(Ingest.mainBranch(batchEvents))
      .as[(String, Long)].collect().toMap
    val streamCounts = spark.table("store_log_event_counts")
      .groupBy("event_type").agg(max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamCounts == batchCounts)

    val batchLatest = Enrich.latestUser(batchEvents)
      .select("user_id", "last_value").as[(Long, Double)].collect().toMap
    val streamLatest = spark.table("store_user_data")
      .groupBy("user_id").agg(last("last_value").as("v"))
      .as[(Long, Double)].collect().toMap
    assert(streamLatest == batchLatest)

    val batchAnon = Ingest.anonymousBranch(batchEvents).count()
    assert(spark.table("store_anonymous_events").count() == batchAnon)
  }

  test("output mode chosen structurally: session windows → Append, other aggs → Update") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = managedTempDir("mode")
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(s"$dir/events")
    val src = Topology.fileSource(spark, s"$dir/events").withWatermark("ts", "1 minute")

    // session-window aggregation → Append
    assert(Topology.outputModeFor(Streaks.sessions(src)) == OutputMode.Append())
    // plain aggregation → Update
    assert(Topology.outputModeFor(Stats.eventTypeCounts(src)) == OutputMode.Update())
    // stateless projection → Append
    assert(Topology.outputModeFor(src.select("event_id")) == OutputMode.Append())
    // a column merely NAMED session_window must not misroute to Append
    // (the plan-string-sniffing failure mode this detection replaces)
    val decoy = src.groupBy(col("event_type").as("session_window")).count()
    assert(Topology.outputModeFor(decoy) == OutputMode.Update())
  }

  test("streaming latestUser aggregation equals batch ranking form") {
    val e = Tables.events(spark, sfDir)
    val a = Enrich.latestUser(e)
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    val b = Enrich.latestUserStreaming(e)
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    assert(a == b)
  }
}
