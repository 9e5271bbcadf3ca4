package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable equi-width histogram as a typed Aggregator — the quantile
  * member of the sketch family ([[KmvSketch]] distincts, [[MgSketch]] heavy
  * hitters, [[CmsSketch]] point frequencies; this answers "where does the
  * distribution sit"). The classic streaming-quantile structures (GK,
  * t-digest, KLL) trade determinism for adaptivity: their summaries depend
  * on arrival order and merge shape, so two runs of the same corpus can
  * disagree at the last rank. A fixed-domain equi-width histogram is the
  * member of the family that is a pure function of the input MULTISET —
  * bit-identical across partitionings, merge trees and engines — which is
  * what lets its quantiles sit under the DuckDB oracle gate exactly, at the
  * cost of fixed absolute (not relative) rank resolution: any quantile is
  * recovered to within one bin width.
  *
  * The buffer is one Array[Long] of `bins` counters. `reduce` increments
  * one cell (the input is the PRE-CLAMPED bin index — binning stays in
  * codegen'd column expressions outside the aggregator, so the JVM loop is
  * a single array increment); `merge` is elementwise addition, commutative
  * and associative, so map-side combine, any shuffle merge tree, and
  * streaming state updates all yield the same histogram.
  *
  * What it buys at corpus scale: per-group value-distribution quantiles in
  * `bins` longs of state — the shuffle carries one ~(bins·8)-byte array per
  * map task per group, never the value stream, where exact quantiles
  * (sort / `quantile_cont`) re-key every row. The finished array is
  * broadcast-sized and composable: histograms of shards sum to the
  * histogram of the union.
  */
object HistSketch {

  /** Named (not anonymous) so physical plans read `HistAgg` at the
    * aggregate nodes instead of an opaque `$$anon$1`. Cap mirrors
    * [[CmsSketch.CmsAgg]]'s per-group state bound.
    */
  final class HistAgg(bins: Int) extends Aggregator[Int, Array[Long], Array[Long]] {
    require(bins >= 1 && bins <= 65536,
      s"histogram needs bins in [1,65536]; got $bins")

    override def zero: Array[Long] = new Array[Long](bins)

    override def reduce(b: Array[Long], bin: Int): Array[Long] = {
      b(bin) += 1L
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def agg(bins: Int): Aggregator[Int, Array[Long], Array[Long]] = new HistAgg(bins)

  /** The histogram as an aggregate Column over a pre-clamped bin-index
    * column (build it with [[graft.ext.Sketches.histBin]] so both engines
    * bin identically). Output: the `bins`-long counter array.
    */
  def hist(c: Column, bins: Int): Column =
    udaf(agg(bins), org.apache.spark.sql.Encoders.scalaInt).apply(c)
}
