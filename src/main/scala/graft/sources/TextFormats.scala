package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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

  /** The corrupt-record column must be part of the declared schema to be
    * populated; FAILFAST never emits it. Callers may have declared it
    * themselves (standard Spark practice) — don't add a duplicate.
    */
  private def withCorrupt(schema: StructType, failFast: Boolean): StructType =
    if (failFast || schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, StringType)

  /** NOTE: under PERMISSIVE (the default) the returned frame's schema is the
    * caller's `schema` PLUS the appended `_corrupt_record` quarantine column —
    * a naive write(read(...)) round-trip carries the extra column, and schema
    * equality against the declared StructType fails. Use [[splitRejects]] to
    * recover frames in the declared schema; under FAILFAST no column is added.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
                    failFast: Boolean = false): DataFrame =
    spark.read
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema, failFast)).json(path)

  /** CSV is only lossless for flat values: free text with embedded newlines
    * needs `multiline = true`, which sacrifices block-level splittability
    * (one task per file) — put free-text columns in JSONL instead, which is
    * both line-splittable and lossless. Nulls are written as the \N sentinel
    * so an empty string ("") stays distinct from null on read (with the
    * default nullValue of "", the reader folds BOTH to null); whitespace is
    * preserved (the writer's default trimming is disabled).
    *
    * RESERVED VALUE: the sentinel makes the literal two-character string \N
    * unrepresentable in CSV — a field whose VALUE is \N is written verbatim
    * (nullValue only substitutes actual nulls on write) and reads back as
    * null. This is the standard cost of the MySQL-style \N convention; data
    * that can legitimately contain \N belongs in JSONL, which has a real
    * null token and no reserved string (same routing rule as embedded
    * newlines above). The quarantine-column caveat on [[readJsonLines]]
    * applies here too.
    */
  private val NullSentinel = "\\N"
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              failFast: Boolean = false, multiline: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", multiline.toString)
      .option("nullValue", NullSentinel)
      .schema(withCorrupt(schema, failFast)).csv(path)

  /** Split a PERMISSIVE read into (clean, rejects): clean rows in the
    * caller's DECLARED schema (quarantine column dropped — safe to write or
    * schema-compare), and reject rows carrying the raw corrupt line. Callers
    * route rejects to a dead-letter sink and account for every input line.
    *
    * The input frame is CACHED here: after column pruning, an action on
    * either half alone (`rejects.count()` — the advertised dead-letter
    * accounting use) would reduce the raw file scan's required schema to
    * just `_corrupt_record`, which Spark forbids
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Caching is Spark's documented
    * remedy: both halves then read materialized columns, not the raw scan.
    * The caller releases the entry with `df.unpersist()` on the frame it
    * passed in (same plan, same cache entry). Caching the read is only
    * sensible at interactive scale — a 100 TB ingest should make ONE pass
    * with [[writeQuarantined]] instead, which needs no cache at all.
    */
  def splitRejects(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptCol),
      s"no $CorruptCol column — was this read with failFast = true?")
    val materialized = df.cache()
    val clean = materialized.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val rejects = materialized.filter(col(CorruptCol).isNotNull)
    (clean, rejects)
  }

  /** The corpus-scale quarantine path: ONE scan writes clean rows under
    * `_is_reject=false/` and raw corrupt lines under `_is_reject=true/`
    * (Hive-style partition dirs — a downstream job reads either half with a
    * partition-pruned scan). No cache, no second pass: the write projects
    * every column, so the raw scan's required schema never collapses to
    * `_corrupt_record`. The raw line is renamed to [[RawLineCol]] on write —
    * `_corrupt_record` is a RESERVED name on any JSON/CSV scan (projecting
    * it alone from the re-read output would hit the same
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN rule).
    */
  val RejectPartCol = "_is_reject"
  val RawLineCol = "raw_line"
  def writeQuarantined(df: DataFrame, path: String): Unit = {
    require(df.columns.contains(CorruptCol),
      s"no $CorruptCol column — was this read with failFast = true?")
    df.withColumn(RejectPartCol, col(CorruptCol).isNotNull)
      .withColumnRenamed(CorruptCol, RawLineCol)
      .write.mode("overwrite").partitionBy(RejectPartCol).json(path)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      // the writer TRIMS whitespace by default — losslessness demands not
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", NullSentinel)
      .csv(path)
}
