package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-format ingestion (JSONL / CSV) with the 100 TB posture baked in:
  *
  *  - Schemas are ALWAYS explicit. Schema inference is a second full pass
  *    over the data before the real one — never acceptable at corpus scale —
  *    so these readers take a StructType and no inference path exists.
  *  - Malformed records are QUARANTINED, not silently dropped: the default
  *    PERMISSIVE mode captures the raw bad line in `_corrupt_record`, so an
  *    ingest job can count/route rejects (a curation pipeline must account
  *    for every input byte). `failFast = true` flips to FAILFAST for
  *    pipelines where any corruption should abort.
  *  - Both formats stay line-splittable (no multiline records), so a 100 TB
  *    directory parallelizes per HDFS/object-store block, not per file.
  */
object TextFormats {

  val CorruptCol = "_corrupt_record"

  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
                    failFast: Boolean = false): DataFrame = {
    val reader = spark.read
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    // the corrupt-record column must be part of the declared schema to be
    // populated; FAILFAST never emits it
    val s = if (failFast) schema else schema.add(CorruptCol, StringType)
    reader.schema(s).json(path)
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              failFast: Boolean = false): DataFrame = {
    val reader = spark.read
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    val s = if (failFast) schema else schema.add(CorruptCol, StringType)
    reader.schema(s).csv(path)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
