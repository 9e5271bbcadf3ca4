package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Count-Min sketch as a typed Aggregator, after Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min sketch and
  * its applications" (J. Algorithms 2005).
  *
  * The buffer is a d×w counter matrix flattened to one Array[Long]: row r of
  * the matrix occupies [r*w, (r+1)*w). `reduce` increments one cell per row
  * (the input is the row's PRE-HASHED cell index — hashing stays in codegen'd
  * column expressions outside the aggregator, so the JVM loop only ever does
  * d array increments); `merge` is elementwise addition — commutative and
  * associative, so map-side combine, any shuffle merge tree, and streaming
  * state updates all yield the SAME matrix: unlike Misra–Gries, the CMS is a
  * pure function of the input multiset, which is what lets point estimates
  * (min over rows of the addressed cell) sit under the DuckDB oracle gate
  * directly with no exact-recount second pass.
  *
  * What it buys at corpus scale: frequency estimates for EVERY key in
  * d×w longs of state — the shuffle carries one ~(d·w·8)-byte matrix per map
  * task, never the token stream, and the finished sketch is broadcast-sized.
  * Estimates only ever OVER-count (each cell adds non-negative collisions):
  * est(x) ≥ true(x), and est(x) ≤ true(x) + εn with ε = e/w at failure
  * probability e^-d. Complements [[MgSketch]] (candidate extraction) and
  * [[KmvSketch]] (distinct counts): MG answers "which keys are heavy",
  * CMS answers "how often did THIS key occur".
  */
object CmsSketch {

  /** Named (not anonymous) so physical plans read `CmsAgg` at the
    * aggregate nodes instead of an opaque `$$anon$1`.
    */
  final class CmsAgg(d: Int, w: Int) extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], cells: Seq[Int]): Array[Long] = {
      var r = 0
      val it = cells.iterator
      while (r < d && it.hasNext) {
        b(r * w + it.next()) += 1L
        r += 1
      }
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

  def agg(d: Int, w: Int): Aggregator[Seq[Int], Array[Long], Array[Long]] = new CmsAgg(d, w)

  /** The sketch as an aggregate Column over an array-of-cell-indices column
    * (element r ∈ [0, w) addresses row r; build it with
    * [[graft.ext.Sketches.cmsCells]] so both engines hash identically).
    * Output: the d×w matrix, row-major.
    */
  def cms(c: Column, d: Int, w: Int): Column =
    udaf(agg(d, w), ExpressionEncoder[Seq[Int]]()).apply(c)
}
