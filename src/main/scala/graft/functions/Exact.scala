package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared across operators, designed so the same arithmetic is
  * bit-identical in Spark and in the DuckDB oracle (see SURVEY §5.1).
  *
  * Rationale: the driver hash-compares raw values. A plain `sum(double)` is
  * order-dependent across engines, so every money/measure sum is routed
  * through an exact DECIMAL(18,4) accumulation and only then converted back
  * to double — both engines round the (exactly representable) per-row values
  * to the same 4-decimal decimal, sum exactly, and produce the same double.
  */
object Exact {

  /** Order-independent, engine-independent sum of a "money-like" double
    * column (inputs have <= 4 decimal digits). Oracle SQL equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** 60-bit positive hash from md5 hex — identical in DuckDB via
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`. Used for MinHash / LSH /
    * fingerprints so oracle SQL can reproduce signatures exactly.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit positive hash (first 8 md5 hex chars). DuckDB:
    * `('0x' || substr(md5(s), 1, 8))::BIGINT`.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant for MinHash permutations: hash of "i:value". */
  def md5Hash60Seeded(seed: Int, c: Column): Column =
    md5Hash60(concat(lit(s"$seed:"), c))

  /** Epoch microseconds (exact long) — DuckDB `epoch_us(ts)`. */
  def epochUs(c: Column): Column = unix_micros(c)
}
