package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index keyword retrieval (BM25) — the lexical-search half of a
  * training-data pipeline (eval-set retrieval, hard-negative mining for
  * embedding training, RAG-context lookup, corpus QA "which docs answer
  * this").
  *
  * Scoring is Robertson/Spärck-Jones BM25 (k1 = 1.2, b = 0.75) computed in
  * EXACT integer fixed point — the idf's (N - df + 0.5)/(df + 0.5) odds
  * ratio is taken as a rational in ppm instead of through `ln` (whose
  * last-bit rounding is libm-specific, so a float score could rank
  * differently across engines; the repo-wide determinism rule is ids +
  * ranks + exact ints, never raw doubles). `ln` is monotone in the odds
  * ratio, so dropping it reorders nothing for single-term queries and only
  * re-weights the rare-vs-common trade-off for multi-term sums — the
  * variant is deterministic everywhere (Spark's DECIMAL `div` ≡ DuckDB's
  * `//` on non-negative BIGINTs), which is what makes the output
  * hash-checkable.
  *
  * Index shape at 100 TB: postings are keyed by token — the classic
  * inverted index, bucketed by token hash on disk ([[buildBm25Index]]), so
  * a query's terms prune to their buckets and the probe never rescans the
  * corpus. The per-token skew story is the usual one: Zipfian head terms
  * make long posting lists, and the standard mitigations compose with this
  * layout — a df ceiling (`maxDfPpm`) drops stopword-grade terms whose idf
  * contribution is noise (the WAND/impact-ordered family goes further and
  * truncates lists by score bound), exactly like the LSH/IVF hot-bucket
  * caps elsewhere in this package. Overflow headroom: contrib =
  * idf_ppm · sat_bp ≤ (2N/3)·10⁶ · 22000 ≈ 1.5·10¹⁰·N, so BIGINT holds to
  * N ≈ 6·10⁸ docs per index shard; beyond that, drop idf to per-mille or
  * sum in DECIMAL(38,0).
  */
object Retrieval {

  /** BM25 constants, ×100 fixed point (k1 = 1.2, b = 0.75). Interpolated
    * into the DuckDB oracle from here so the two sides cannot diverge.
    */
  val K1x100 = 120
  val Bx100 = 75

  /** Default result depth and the query-derivation parameters shared with
    * the oracle: every 97th doc asks a query made of its tokens 3..6 (the
    * same `% 97` carve the decontamination family uses for its benchmark
    * half).
    */
  val TopK = 5
  val QueryEvery = 97
  val QueryTokFrom = 3
  val QueryTokLen = 4

  /** Deterministic query set derived from the corpus: query_id = doc_id,
    * terms = the doc's tokens at positions 3..6 (1-based), de-duplicated.
    * (On a Zipfian corpus self-retrieval would be the expected top hit; the
    * test corpus's ~31-word uniform vocabulary makes every term common, so
    * ranking is dominated by tf/dl — the spec pins ranking on a
    * hand-computed corpus instead.)
    */
  def bm25Queries(documents: DataFrame): DataFrame =
    documents
      .filter(col("doc_id") % QueryEvery === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), QueryTokFrom, QueryTokLen))
          .as("token"))
      .filter(col("token") =!= "")
      .distinct()

  /** The postings relation: one row per (token, doc_id) with term frequency
    * `tf`, doc length `dl` (non-empty tokens), document frequency `df`, and
    * the denormalized global stats (`n_docs`, `avgdl_x100`) every scorer
    * needs. ONE corpus scan: tf is the explode + count, dl rides a doc_id
    * window over the tf rows (no second tokenize pass), df a token window —
    * the token window is the exchange that co-locates posting lists, i.e.
    * the index build's inherent shuffle. The global stats come from a
    * one-row aggregate of the per-doc lengths joined in by broadcast
    * (constant columns — parquet RLE stores them for free in the persisted
    * form).
    */
  def bm25Postings(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val withDl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy("doc_id")).cast("long"))
    val withDf = withDl.withColumn("df",
      count(lit(1)).over(Window.partitionBy("token")).cast("long"))
    // stats re-derive from a narrow re-scan (doc lengths only): the postings
    // lineage above is about to shuffle twice, and a multi-consumer fork of
    // it would either recompute the heavier subtree or force a checkpoint;
    // the one-row aggregate joins back by broadcast either way
    val stats = documents
      .select(size(filter(TextAnalysis.tokens(col("text")), t => t =!= ""))
        .cast("long").as("dl0"))
      .filter(col("dl0") > 0)
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(dl0) * 100 div count(1)").as("avgdl_x100"))
    withDf.crossJoin(broadcast(stats))
  }

  /** The exact fixed-point BM25 contribution of one (query term, doc)
    * posting row — requires columns tf, dl, df, n_docs, avgdl_x100.
    * All-integer: dl/avgdl in basis points, the saturation
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) in basis points, the idf
    * odds ratio in ppm, contrib their product.
    */
  private def contribExpr: Column = {
    val dlrBp = s"(dl * 1000000) div avgdl_x100"
    val denom = s"tf * 10000 + $K1x100 * ((100 - $Bx100) + ($Bx100 * ($dlrBp)) div 10000)"
    val satBp = s"(tf * ${(100 + K1x100) * 1000000}) div ($denom)"
    val idfPpm = s"((2 * n_docs - 2 * df + 1) * 1000000) div (2 * df + 1)"
    expr(s"($idfPpm) * ($satBp)")
  }

  /** Score every (query, candidate) pair reachable through a shared term and
    * keep the top `k` docs per query. `postings` must carry the
    * [[bm25Postings]] columns. The term join is keyed on token — against
    * the persisted index that is a pruned bucketed-scan join; the query
    * side is tiny and broadcasts. Per-query ranking is a window over
    * query_id, which plans as WindowGroupLimit: each partition keeps its
    * local top k before the query_id exchange.
    */
  def bm25Rank(postings: DataFrame, queries: DataFrame, k: Int = TopK): DataFrame = {
    val scored = postings
      .join(broadcast(queries), "token")
      .withColumn("contrib", contribExpr)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).cast("long").as("score_fp"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_fp").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_fp")
  }

  /** One-shot BM25 top-k: derive queries, build postings, rank. The oracle
    * query (`ext_bm25_topk`) runs exactly this.
    */
  def bm25TopK(documents: DataFrame, k: Int = TopK): DataFrame =
    bm25Rank(bm25Postings(documents), bm25Queries(documents), k)

  /** Persist the postings as a token-bucketed table — the on-disk inverted
    * index. Searches ([[searchBm25Index]]) then join query terms against
    * the bucketed scan: no corpus rescan, no postings-side exchange (the
    * bucket layout IS the token partitioning), index build cost amortized
    * over every query batch — the same build-once/probe-many posture as
    * [[Similarity.buildIvfIndex]] and [[Dedup.buildLshIndex]].
    */
  def buildBm25Index(documents: DataFrame, table: String, buckets: Int = 8): Unit =
    graft.sources.Bucketing.writeBucketed(
      bm25Postings(documents), table, "token", buckets)

  /** Top-k retrieval over a persisted index. Output is identical to
    * [[bm25TopK]] when `queries` is [[bm25Queries]] of the indexed corpus
    * (asserted by the equivalence spec); the plan touches only the
    * postings table.
    */
  def searchBm25Index(spark: SparkSession, table: String, queries: DataFrame,
                      k: Int = TopK): DataFrame =
    bm25Rank(spark.table(table), queries, k)
}
