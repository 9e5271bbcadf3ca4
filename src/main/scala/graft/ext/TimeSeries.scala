package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series similarity search over user activity — "which users behave
  * alike over time" (cohorting, anomaly triage, account-sharing signals).
  * The reference's domain keys everything by user; this is the behavioral
  * companion of the embedding-space operators, built on the events table.
  *
  * Candidate generation is the SAX recipe (Lin et al.; the EDBT'19
  * streaming-similarity line in PAPERS.md follows the same
  * sketch-then-verify shape): each user's fixed-length daily activity
  * vector reduces to a PAA summary (per-segment means), discretizes to a
  * small alphabet, and only users sharing the resulting WORD are compared
  * exactly — groupBy(word) is the bucketing, exactly the LSH/IVF posture
  * the dedup and ANN families use, never O(n²). All arithmetic is integer
  * fixed point (counts, ×100 segment means, min-max levels, squared
  * distances), so results hash-match the SQL twin.
  *
  * Scale: the per-user fold is one groupBy(user, day) + one groupBy(user);
  * buckets are Zipf-prone like every hash family here (a corpus-wide
  * "inactive" word is the hot key) — the established maxBucket
  * hash-sharding guard applies unchanged; PAA/SAX constants are corpus
  * knobs (more segments / bigger alphabet = finer buckets).
  */
object TimeSeries {

  /** Series length (days), PAA segment count, and discretization alphabet —
    * interpolated into the DuckDB oracle so the two sides cannot diverge.
    * 30 days / 6 segments of 5 matches the testdata's January span; at
    * other horizons these are the sizing knobs.
    */
  val TsDays = 30
  val TsSegs = 6
  val SegLen: Int = TsDays / TsSegs
  val Alphabet = 4

  /** Per-user daily activity vector: `v[d]` = events on day `d` counted
    * from the corpus's first day, fixed length [[TsDays]] with silent days
    * as zeros. One (user, day) aggregation, then one per-user fold into the
    * array (map assembly — collect order cannot matter).
    */
  def activityVectors(events: DataFrame): DataFrame = {
    val day0 = events.agg(min(to_date(col("ts"))).as("day0"))
    events
      .crossJoin(broadcast(day0))
      .select(col("user_id"),
        datediff(to_date(col("ts")), col("day0")).cast("long").as("day_idx"))
      .filter(col("day_idx") >= 0 && col("day_idx") < TsDays)
      .groupBy("user_id", "day_idx").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("day_idx"), col("cnt")))).as("m"))
      .select(col("user_id"),
        expr(s"transform(sequence(0L, ${TsDays - 1}L), d -> coalesce(element_at(m, d), 0L))")
          .as("v"))
  }

  /** PAA + SAX word per user: per-segment mean in ×100 fixed point, then
    * min-max discretization to [[Alphabet]] levels (0..Alphabet-1; a flat
    * series maps to all-zero levels). The word is the bucket key.
    */
  def saxWords(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("paa", expr(
        s"""transform(sequence(0, ${TsSegs - 1}),
           |  s -> (aggregate(slice(v, s * $SegLen + 1, $SegLen), 0L,
           |          (acc, x) -> acc + x) * 100) div $SegLen)""".stripMargin))
      .withColumn("mn", array_min(col("paa")))
      .withColumn("mx", array_max(col("paa")))
      .withColumn("word", concat_ws("", expr(
        s"transform(paa, p -> CAST(((p - mn) * $Alphabet) div (mx - mn + 1) AS STRING))")))
      .select("user_id", "v", "word")

  /** Top-1 behavioral neighbor per user: exact squared distance on the raw
    * daily vectors, compared only within SAX buckets — the shared
    * [[Similarity.bucketedTop1Neighbor]] kernel pipeline keyed by the SAX
    * word (winners-only; pair rows never materialize). Output (user_id,
    * neighbor_id, dist); ties break toward the smaller neighbor id.
    * `maxBucket` is the hot-bucket guard for the corpus-wide hot word (the
    * all-inactive cohort) — default ON here, unlike the ad-hoc embedding
    * operators: the gather-based kernel plan makes an unguarded hot
    * bucket a single Θ(hot²·dims) task with the 2 GB collect_list row as
    * its cliff, and user-behavior corpora reliably have an inactive
    * cohort. The adaptive [[Similarity.anyBucketOver]] gate keeps the
    * plain single-gather plan (one counts probe of overhead) until a
    * bucket actually exceeds the cap; results are identical either way.
    */
  def tsTopNeighbor(events: DataFrame,
                    maxBucket: Int = Similarity.MaxBucket): DataFrame =
    Similarity.bucketedTop1Neighbor(
      saxWords(activityVectors(events)), "word", "user_id", "v", maxBucket)
}
