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
    *
    * Input is ONE long with the d cell indices bit-packed into 16-bit
    * lanes (row r's cell = bits [16r, 16r+16)) rather than a Seq[Int]:
    * the packed form crosses the udaf boundary as a primitive — no
    * per-row array allocation/deserialization in the hot loop. Measured
    * ~10% on the whole sf0.1 query (1.35 → 1.21 s — the two corpus scans
    * dominate there); the allocation-free boundary is what matters when
    * the aggregator IS the job, i.e. the 100 TB single-pass profile.
    * Caps: d ≤ 4, w ≤ 65536.
    */
  final class CmsAgg(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(d >= 1 && d <= 4 && w >= 1 && w <= 65536,
      s"packed CMS needs d in [1,4], w in [1,65536]; got d=$d w=$w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], packed: Long): Array[Long] = {
      var r = 0
      while (r < d) {
        b(r * w + ((packed >>> (16 * r)) & 0xFFFFL).toInt) += 1L
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

  def agg(d: Int, w: Int): Aggregator[Long, Array[Long], Array[Long]] = new CmsAgg(d, w)

  /** The sketch as an aggregate Column over a bit-packed cell column
    * (build it with [[graft.ext.Sketches.cmsCells]] so both engines hash
    * identically). Output: the d×w matrix, row-major.
    */
  def cms(c: Column, d: Int, w: Int): Column =
    udaf(agg(d, w), org.apache.spark.sql.Encoders.scalaLong).apply(c)
}
