package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared helpers for the scale probes (and their spec twins): the
  * dim-rotated corpus-scaling construction and the median-of-3 timing
  * protocol. One definition, so measurements from different probes stay
  * comparable and a fix to either lands everywhere (SCALE.md rows from
  * ScaleProbe and ClusterScaleProbe cite the same construction).
  */
object ProbeUtil {

  /** `times` dim-rotated copies of a 64-dim embedding frame: copy c's
    * dims are rotated by c % 64, so each copy's sign pattern / centroid
    * affinity differs — scaling by plain replication would replicate the
    * base bucket distribution and fake uniformity.
    */
  def rotatedCopies(base: DataFrame, times: Int): DataFrame =
    (0 until times).map { c =>
      val r = c % 64
      base.select(
        (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))")
          .as("embedding"))
    }.reduce(_ unionByName _)

  /** Median-of-3 wall time of materializing `mk` to a noop sink. */
  def median3(mk: => DataFrame): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(1)
  }

  /** Two-decimal rounding for the probes' JSON rows. */
  def r2(x: Double): Double = math.round(x * 100) / 100.0
}
