package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB the dominant cost is the scan, and a scan is only cheap when
  * file/row-group min-max statistics prune it. Sorting the layout by ONE
  * column makes pruning perfect on that column and useless on every other;
  * interleaving the bits of two filter columns (Morton 1966, the curve
  * behind every "OPTIMIZE ZORDER BY" implementation) bounds each written
  * file to a small rectangle in BOTH dimensions at once, so predicates on
  * either column — or both — skip most files. This is a LAYOUT operator:
  * it changes where rows live, never what any query returns.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative keys:
    * bit i of x lands at position 2i, bit i of y at 2i+1. A static
    * 2×`bits`-term fold of shifts and ORs — pure codegen'd column
    * arithmetic (no UDF, no lambda), identical in the oracle as a
    * `list_sum` over disjoint bits.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Per-quadtree-cell occupancy and bounding boxes for lineitem keyed by
    * (l_partkey, l_suppkey), both folded into `bits`-bit space. The top
    * 2×`cellDepth` z-value bits ARE the depth-`cellDepth` quadtree cell, so
    * `zval >> 2*(bits - cellDepth)` buckets rows into cells whose per-cell
    * (min, max) key ranges are exactly the statistics a writer would stamp
    * on each file — small boxes = effective pruning. One hash-agg over
    * ≤ 4^cellDepth groups; the interleave itself is narrow.
    */
  def zorderCells(lineitem: DataFrame, bits: Int = 8, cellDepth: Int = 2): DataFrame = {
    require(cellDepth >= 1 && cellDepth <= bits, s"bad cellDepth $cellDepth for $bits bits")
    val mask = (1L << bits) - 1
    lineitem
      .select(
        (col("l_partkey") % (mask + 1)).as("p"),
        (col("l_suppkey") % (mask + 1)).as("s"))
      .withColumn("zval", zValue(col("p"), col("s"), bits))
      .withColumn("cell", shiftright(col("zval"), 2 * (bits - cellDepth)))
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_rows"),
        min("p").cast("long").as("p_min"), max("p").cast("long").as("p_max"),
        min("s").cast("long").as("s_min"), max("s").cast("long").as("s_max"))
      .select("cell", "n_rows", "p_min", "p_max", "s_min", "s_max")
  }

  /** Write `df` z-ordered on (`xCol`, `yCol`) into `nFiles` parquet files:
    * range-partition on the z-value, sort within each partition, drop the
    * helper column. Each output file then covers one contiguous z-range =
    * a small rectangle in (x, y); readers filtering on either column prune
    * by footer min-max. The range exchange is the one shuffle — the same
    * price a single-column sort-write pays, spent on a curve that serves
    * two dimensions.
    */
  def writeZordered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int = 16, nFiles: Int = 16): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
