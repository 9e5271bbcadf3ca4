package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** BM25 inverted-index retrieval: ranking semantics on a hand-built corpus,
  * one-shot vs persisted-index equivalence, and the probe plan shape.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** doc_id 0 is the query doc (0 % 97 == 0): its tokens 3..6 are
    * "rare alpha beta gamma". Filler docs use vocabulary disjoint from the
    * query so they are never candidates.
    */
  private def corpus: DataFrame = Seq(
    (0L, "x x rare alpha beta gamma"),
    // tf winner: alpha three times, short doc
    (10L, "alpha alpha alpha pad pad pad"),
    // same length as 10 but tf 1 -> must rank below 10
    (11L, "alpha pad pad pad pad pad"),
    // no query term -> never retrieved
    (12L, "pad pad pad pad pad pad"),
    // tf 3 like doc 10 but much longer -> dl normalization ranks it below 10
    (13L, ("alpha alpha alpha " + Seq.fill(30)("pad").mkString(" "))),
    // fillers so df(alpha) is properly below n_docs
    (14L, "pad pad filler filler pad pad"),
    (15L, "filler filler filler pad pad pad"))
    .toDF("doc_id", "text")
    .withColumn("lang", lit("en")).withColumn("source", lit("t"))
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("bm25: tf raises, dl normalizes, non-matching docs never surface") {
    val out = Retrieval.bm25TopK(corpus, k = 6)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.toSeq == Seq(0L))
    val ranked = out.map(_._3)
    // doc 12/14/15 share no query term: excluded
    assert(!ranked.contains(12L) && !ranked.contains(14L) && !ranked.contains(15L))
    val rankOf = out.map(t => t._3 -> t._2).toMap
    // the query doc holds the rare terms (df=1) -> top hit here
    assert(rankOf(0L) == 1L, out.mkString(", "))
    // tf 3 beats tf 1 at equal dl
    assert(rankOf(10L) < rankOf(11L), out.mkString(", "))
    // equal tf, 6x the length: dl normalization demotes doc 13
    assert(rankOf(10L) < rankOf(13L), out.mkString(", "))
    // scores strictly ordered with rank (ties broken by doc_id are absent here)
    val scores = out.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: saturation keeps tf gains monotone but bounded") {
    // tf 1 vs 2 vs 8 at fixed dl: scores strictly increase, but the 2->8
    // jump gains less than 4x the 1->2 jump (k1 saturation)
    val docs = Seq(
      (0L, "f f f kw f f"), // query doc: tokens 3..6 = "kw","f","f" -> {kw, f}
      (10L, "kw " + Seq.fill(9)("z").mkString(" ")),
      (11L, "kw kw " + Seq.fill(8)("z").mkString(" ")),
      (12L, "kw kw kw kw kw kw kw kw z z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val postings = Retrieval.bm25Postings(docs)
    val q = Seq((0L, "kw")).toDF("query_id", "token")
    val s = Retrieval.bm25Rank(postings, q, k = 4)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(s(10L) < s(11L) && s(11L) < s(12L), s.toString)
    assert(s(12L) - s(11L) < 4 * (s(11L) - s(10L)), s.toString)
  }

  test("bm25: persisted index serves identical answers to the one-shot plan") {
    val docs = Tables.documents(spark, sfDir)
    val oneShot = Retrieval.bm25TopK(docs).orderBy("query_id", "rank").collect()
    Retrieval.buildBm25Index(docs, "graft_bm25_spec")
    val served = Retrieval
      .searchBm25Index(spark, "graft_bm25_spec", Retrieval.bm25Queries(docs))
      .orderBy("query_id", "rank").collect()
    assert(oneShot.nonEmpty)
    assert(oneShot.toSeq == served.toSeq)
  }

  test("bm25 probe plan: no corpus rescan, broadcast query join, top-k group limit") {
    val docs = Tables.documents(spark, sfDir)
    Retrieval.buildBm25Index(docs, "graft_bm25_spec_plan")
    val probe = Retrieval.searchBm25Index(spark, "graft_bm25_spec_plan",
      Retrieval.bm25Queries(docs))
    val p = probe.queryExecution.executedPlan.toString
    // the index side is the only big input: the documents parquet appears
    // once (the tiny query-derivation subtree), never as a postings rebuild
    // (a rebuild would scan it a second time and re-run two windows)
    assert("documents\\.parquet".r.findAllIn(p).length == 1, p)
    // the query side broadcasts into the postings scan
    assert(p.contains("BroadcastHashJoin"), p)
    // per-query top-k plans as WindowGroupLimit (partial before the shuffle)
    assert(p.contains("WindowGroupLimit"), p)
  }
}
