package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable KMV (k-minimum-values) sketch as a typed Aggregator — the
  * `TypedImperativeAggregate`-style distinct sketch SURVEY §7.5 anticipated.
  *
  * The buffer is the sketch itself: the ≤ k smallest DISTINCT hash values,
  * kept sorted ascending. `reduce` is an O(log k) binary search + bounded
  * insert, `merge` a linear merge of two sorted runs — commutative,
  * associative, and idempotent on duplicates, so partial aggregation
  * (map-side combine) and streaming state updates are both exact. Per-group
  * state is capped at k longs no matter how many rows flow in: the shuffle
  * carries one ≤ k-element array per (group × map task), never the value
  * stream — this is what replaces a full distinct shuffle at corpus scale.
  */
object KmvSketch {

  /** Insert `v` into sorted-distinct `b`, keeping at most `k` smallest. */
  private def insert(b: Array[Long], v: Long, k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, v)
    if (idx >= 0) b // already in the sketch
    else {
      val ins = -idx - 1
      if (ins >= k) b // larger than every kept value in a full sketch
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Merge two sorted-distinct runs, keeping at most `k` smallest. */
  private def union(x: Array[Long], y: Array[Long], k: Int): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      // each input is internally distinct, so cross-array equality is the
      // only duplicate case: consume both heads, emit once
      out(n) =
        if (j >= y.length) { val v = x(i); i += 1; v }
        else if (i >= x.length) { val v = y(j); j += 1; v }
        else if (x(i) < y(j)) { val v = x(i); i += 1; v }
        else if (y(j) < x(i)) { val v = y(j); j += 1; v }
        else { val v = x(i); i += 1; j += 1; v }
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Named (not anonymous) so physical plans read `KmvAgg` at the
    * aggregate nodes instead of an opaque `$$anon$1`.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v, k)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = union(x, y, k)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def agg(k: Int): Aggregator[Long, Array[Long], Array[Long]] = new KmvAgg(k)

  /** The sketch as an aggregate Column: ascending array of the ≤ k smallest
    * distinct values of `c` (a long hash column).
    */
  def kmv(c: Column, k: Int): Column = udaf(agg(k), Encoders.scalaLong).apply(c)
}
