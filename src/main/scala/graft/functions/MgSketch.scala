package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra–Gries heavy-hitters sketch as a typed Aggregator.
  *
  * The buffer is at most `m` (item, counter) entries. `reduce` is the
  * classic MG step (increment if resident, insert if room, else decrement
  * every counter — amortized O(1): each global decrement is paid for by m
  * prior increments); `merge` is the Agarwal et al. "Mergeable Summaries"
  * (PODS 2012) rule — sum counts, then subtract the (m+1)-th largest count
  * and drop non-positive entries — which keeps the total undercount bounded
  * by n/(m+1) across ANY merge tree, so partial aggregation (map-side
  * combine) preserves the guarantee: every item with true frequency
  * > n/(m+1) is still in the sketch, whatever the partitioning.
  *
  * The CANDIDATE SET is therefore a deterministic superset of the true
  * heavy hitters, but the surviving counters (and any extra light
  * candidates) depend on merge order — which is why the heavy-hitters
  * operator ([[graft.ext.Sketches.heavyShingles]]) re-counts candidates
  * exactly in a second pass and thresholds on exact counts: the final
  * answer is then a pure function of the input multiset, oracle-checkable,
  * while the shuffle never carries more than m entries per map task.
  *
  * The buffer is an immutable Map (encoder-friendly, m is small — hundreds);
  * a corpus-scale deployment would swap an open-addressing long→long buffer
  * behind the same Aggregator contract.
  */
object MgSketch {

  final class MgAgg(m: Int) extends Aggregator[Long, Map[Long, Long], Array[Long]] {
    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] =
      b.get(v) match {
        case Some(c)            => b.updated(v, c + 1)
        case None if b.size < m => b.updated(v, 1L)
        case None =>
          // decrement-all (v itself is discarded): each such event removes
          // m+1 from the total mass — m resident counters plus v — so at
          // most n/(m+1) events occur and no item is undercounted by more
          b.collect { case (k, c) if c > 1 => k -> (c - 1) }
      }

    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
      val summed =
        if (x.size >= y.size) y.foldLeft(x) { case (acc, (k, c)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + c)
        }
        else merge(y, x)
      if (summed.size <= m) summed
      else {
        // subtract the (m+1)-th largest count; ≤ m entries stay positive
        val counts = summed.valuesIterator.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - (m + 1))
        summed.collect { case (k, c) if c > sub => k -> (c - sub) }
      }
    }

    /** Candidate items only, sorted for stable downstream plans — counts
      * are lower bounds and merge-order-dependent, so they stay internal.
      */
    override def finish(r: Map[Long, Long]): Array[Long] = {
      val ks = r.keysIterator.toArray
      java.util.Arrays.sort(ks)
      ks
    }

    override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def agg(m: Int): Aggregator[Long, Map[Long, Long], Array[Long]] = new MgAgg(m)

  /** The sketch as an aggregate Column over a long (hash) column: the ≤ m
    * candidate values, ascending.
    */
  def mg(c: Column, m: Int): Column = udaf(agg(m), Encoders.scalaLong).apply(c)
}
