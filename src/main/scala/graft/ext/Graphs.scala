package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the corpus's URL graph — the crawl-
  * prioritization / source-quality-weighting half of web-corpus curation
  * ([[Curation.domainStats]] counts links; this ranks the graph they form).
  */
object Graphs {

  /** Co-citation domain PageRank (Page et al. 1999), exact-integer form.
    *
    * Graph: distinct (doc, domain) links → an edge between every pair of
    * domains co-cited by a document (both directions, deduplicated). Rank
    * iterates r' = teleport + d·Σ(r_in/outdeg_in) in parts-per-million
    * fixed point: every operation is BIGINT addition and floor division,
    * so after a FIXED iteration count the ranks are a pure function of the
    * edge set — identical on any engine, any partitioning, any join order
    * (floats would drift per engine; ppm floor-division cannot).
    *
    * Scale shape — the canonical distributed PageRank: per iteration, ONE
    * shuffle joining ranks to edges on src (broadcast here: the domain
    * universe is small; at web scale both sides shuffle on src) and ONE
    * agg shuffle on dst; the rank/edge tables are checkpointed across
    * iterations (the [[Checkpoints]] discipline the CC fixpoint uses), so
    * lineage stays flat and each round costs the same. The co-citation
    * pair-join is per-doc local (a doc cites k domains → k² pairs, k tiny);
    * a hub document would be capped upstream the same way LSH buckets are.
    */
  def domainRank(documents: DataFrame, iters: Int = 2,
                 dampingPpm: Long = 850000L): DataFrame = {
    val links = documents
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(Curation.UrlDomainRe), lit(1)))
          .as("domain"))
      .distinct()
    val (edges, edgeIds) = Checkpoints.checkpointTracked(
      links.as("a").join(links.as("b"), "doc_id")
        .where(col("a.domain") =!= col("b.domain"))
        .select(col("a.domain").as("src"), col("b.domain").as("dst"))
        .distinct())
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(outdeg, "src")
    val nodes = links.select("domain").distinct()
    val teleportPpm = 1000000L - dampingPpm

    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
    var prevIds = Set.empty[Int]
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(rank.withColumnRenamed("domain", "src"), "src")
        .select(col("dst").as("domain"), expr("rank_ppm div outdeg").as("c"))
        .groupBy("domain").agg(sum("c").as("in_ppm"))
      val next = nodes.join(contrib, Seq("domain"), "left")
        .select(col("domain"),
          (lit(teleportPpm) +
            expr(s"($dampingPpm * coalesce(in_ppm, 0L)) div 1000000")).as("rank_ppm"))
      val (ck, ids) = Checkpoints.checkpointTracked(next)
      Checkpoints.releaseTracked(rank, prevIds)
      rank = ck
      prevIds = ids
    }
    val out = rank.select(col("domain"), col("rank_ppm").cast("long").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("domain"))
      .localCheckpoint(true)
    Checkpoints.releaseTracked(out, prevIds ++ edgeIds)
    out
  }
}
