package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Runnable smoke of the full streaming topology: replays the sf events
  * table through a file source, fans out to every named store, processes to
  * completion, and prints one line per store with its converged row count.
  *
  * Usage: `sbt "runMain graft.streaming.StreamSmoke [sfDir]"`
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("stream_smoke").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(s"$tmp/events")

    val src = Topology.fileSource(spark, s"$tmp/events")
    val stores = Topology.stores(src, Tables.customer(spark, sfDir),
      watermark = Some("1 minute"))
    val queries = stores.map { case (name, df) =>
      name -> Topology.startMemorySink(df, name, Trigger.ProcessingTime("100 milliseconds"))
    }
    queries.values.foreach(_.processAllAvailable())
    queries.values.foreach(_.stop())
    stores.keys.toSeq.sorted.foreach { name =>
      println(s"[stream-smoke] $name rows=${spark.table(name).count()}")
    }
    spark.stop()
  }
}
