package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Text-analysis operators for training-data pipelines over `documents`
  * (doc_id, text, lang, source, n_chars): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting.
  *
  * Determinism-by-construction: every score is integer-valued (counts and
  * integer comparisons, never float ratios) so the DuckDB oracle matches
  * bit-for-bit. All operators are narrow (no shuffle) — they scale linearly
  * and keep whole-stage codegen intact.
  */
object TextAnalysis {

  /** Default `unseenPct` for [[lmNovelty]], shared with the DuckDB oracle
    * (SparkEntry interpolates this constant into the `ext_lm_novelty` SQL)
    * so the two sides cannot silently diverge on the novelty threshold.
    */
  val DefaultUnseenPct: Int = 20

  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  def tokens(text: Column): Column = split(normalized(text), " ")

  /** 3-token shingles over a MATERIALIZED token-array column (`toksCol` must
    * be an attribute, not an expression tree — otherwise the tokenization is
    * re-evaluated per element inside the lambda, turning shingling into
    * O(tokens²) regex work). Docs shorter than 3 tokens fall back to the
    * whole normalized text (= tokens rejoined) as a single shingle.
    */
  def shinglesFromTokens(toksCol: String): Column =
    when(size(col(toksCol)) < 3, array(concat_ws(" ", col(toksCol))))
      .otherwise(expr(
        s"""transform(sequence(0, size($toksCol) - 3),
           |  j -> concat_ws(' ',
           |    element_at($toksCol, j + 1),
           |    element_at($toksCol, j + 2),
           |    element_at($toksCol, j + 3)))""".stripMargin))

  /** Exploded `(doc_id, shingle)` stream over raw text — the safe
    * composition of [[tokens]] + [[shinglesFromTokens]]: the Generate
    * (explode) node between the two projections stops CollapseProject
    * from inlining the tokenization into the shingle lambda. A
    * `withColumn(sh)`/`drop` convenience form used to live here and was
    * measured at 18× this form's wall at sf0.1 — the collapsed plan
    * re-tokenized per lambda element, exactly the O(tokens²) pathology
    * the [[shinglesFromTokens]] docstring warns about, so the trap API
    * is gone and callers get the exploded stream.
    */
  def shingleStream(df: DataFrame): DataFrame =
    df.withColumn("__toks", tokens(col("text")))
      .select(col("doc_id"), explode(shinglesFromTokens("__toks")).as("shingle"))

  /** Token / length / quality statistics. `is_quality` uses the usual
    * training-data gates (length band, stopword presence, mean-token-length
    * cap) expressed as pure integer arithmetic.
    */
  def stats(documents: DataFrame): DataFrame =
    withStatsColumns(documents)
      .select("n_chars_tokens", "doc_id", "n_chars_obs", "n_tokens",
        "n_distinct_tokens", "n_word_tokens", "n_stopwords", "is_quality")

  /** [[stats]]' derived columns appended to `documents` with every input
    * column RETAINED — the fusable form for composite pipelines
    * ([[Curation.pipelineKeep]]) that need is_quality/n_tokens alongside
    * source/lang/text in ONE corpus scan instead of a stats scan joined
    * back on doc_id. All columns are narrow per-row expressions, so unused
    * ones prune out of any consumer's plan.
    */
  def withStatsColumns(documents: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    documents
      .withColumn("n_chars_tokens",
        length(regexp_replace(normalized(col("text")), " ", "")).cast("long"))
      .withColumn("n_chars_obs", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("n_word_tokens",
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long"))
      .withColumn("n_stopwords",
        size(expr("filter(split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' '), " +
          "w -> w IN ('the','a','of','and','to','in','is'))")).cast("long"))
      .withColumn("is_quality",
        col("n_tokens") >= 10 && col("n_tokens") <= 100000 &&
          col("n_stopwords") > 0 &&
          col("n_chars_tokens") < col("n_tokens") * 12)
  }

  /** Marker-word language-ID heuristic (n-gram-frequency style): score each
    * candidate language by marker hits; argmax with a fixed tie order. The
    * marker sets are parameters — this proves the operator shape; a real
    * deployment loads per-language n-gram tables.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "fast", "key"),
    "es" -> Seq("data", "row"),
    "de" -> Seq("scan", "merge"),
    "fr" -> Seq("join", "filter"),
    "zh" -> Seq("spark", "query"))

  def langId(documents: DataFrame): DataFrame = {
    // Plan discipline: normalize ONCE into an attribute, and pack every
    // language's score into ONE array-of-structs attribute. The previous
    // per-column fold argmax let CollapseProject inline each language's full
    // regex scoring tree into every branch of the nested CASE — dozens of
    // regexp_replace evaluations per row. An alias that is non-cheap and
    // referenced more than once is NOT collapsed, so `__norm` and `__sc`
    // each evaluate exactly once; scores and the argmax are array lookups.
    def count1(w: String): Column =
      ((length(col("__norm")) -
        length(regexp_replace(col("__norm"), s" $w ", " "))) /
        (w.length + 1)).cast("long")
    // struct (score, -index, lang): lexicographic array_max = highest score,
    // tie broken to the EARLIEST language in langMarkers order — identical
    // to the old strict-> fold (which only replaced on score > best)
    val entries = langMarkers.zipWithIndex.map { case ((l, ws), i) =>
      struct(ws.map(count1).reduce(_ + _).as("s"), lit(-i).as("ni"), lit(l).as("l"))
    }
    val outCols = Seq(col("doc_id"), col("lang").as("labeled_lang"),
      // null text -> null scores -> 'und' (the oracle's CASE falls through
      // on null = null; struct-max alone would tie-break to a language)
      when(col("__sc").getItem(0).getField("s").isNull, lit("und"))
        .otherwise(array_max(col("__sc")).getField("l")).as("predicted_lang")) ++
      langMarkers.zipWithIndex.map { case ((l, _), i) =>
        col("__sc").getItem(i).getField("s").as(s"score_$l") }
    documents.select(col("doc_id"), col("lang"),
        concat(lit(" "), normalized(col("text")), lit(" ")).as("__norm"))
      .withColumn("__sc", array(entries: _*))
      .select(outCols: _*)
  }

  /** Language-ID confusion matrix: labeled vs predicted counts — the
    * evaluation rollup for the lang-ID heuristic (one agg shuffle over
    * tiny keys).
    */
  def langConfusion(documents: DataFrame): DataFrame =
    langId(documents)
      .groupBy("labeled_lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))

  /** Per-source corpus rollup (SURVEY §7.6 "per-source aggregates"):
    * volume, length and language mix per ingestion source.
    */
  def sourceStats(documents: DataFrame): DataFrame =
    documents.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("total_chars"),
      min("n_chars").as("min_chars"),
      max("n_chars").as("max_chars"),
      countDistinct("lang").as("n_langs"))

  /** Exact per-source token-length quantiles (p50/p90/p99) by rank
    * arithmetic — the length-distribution profile that sets truncation and
    * packing budgets for a training pipeline. The quantile is type-1
    * (value at rank ceil(q·n)), computed with INTEGER ceilings
    * ((q·n + q) div denom) so no float ever touches the rank — identical
    * on any engine, no interpolation ambiguity.
    *
    * Scale shape: one shuffle partitioned by source + an in-partition sort
    * (the window), then a per-source fold. Exact-by-rank is the right call
    * while the partition key is low-cardinality and each stratum fits a
    * partition's sort; a corpus with millions of strata or skew past that
    * would swap in a mergeable quantile sketch (KLL) behind the same
    * output shape — the [[Sketches]] posture.
    */
  def lengthQuantiles(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("source")
    documents
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(w.orderBy(col("n_tokens"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy("source")
      .agg(
        max(col("n")).as("n_docs"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_tokens"))).as("p50_tokens"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("n_tokens"))).as("p90_tokens"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("n_tokens"))).as("p99_tokens"))
  }

  /** One BPE training step: the `topK` most frequent ADJACENT token pairs
    * across the corpus — the argmax the byte-pair-encoding training loop
    * merges next (Sennrich et al. 2016, word-level granularity here). The
    * driver loop that applies merges and recounts is control flow; this
    * operator IS each iteration's distributed work.
    *
    * Scale shape: pair emission is narrow (posexplode over the token array
    * — one (pair) row per adjacent position, no self-join of positions);
    * the count is one hash-agg shuffle on the pair string with map-side
    * combine; top-k plans as TakeOrderedAndProject (never a global sort).
    * Rank ties break lexicographically so the merge choice is deterministic.
    */
  def bpeMergeStep(documents: DataFrame, topK: Int = 10): DataFrame = {
    val w = Window.orderBy(col("freq").desc, col("pair").asc)
    documents
      .select(tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(posexplode(expr(
        "transform(sequence(0, size(toks) - 2), j -> concat_ws(' ', slice(toks, j + 1, 2)))")))
      .toDF("p", "pair")
      .groupBy("pair")
      .agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("rank", "pair", "freq")
  }

  /** The OTHER half of the BPE training iteration: apply one learned merge
    * (a, b) to every document's token stream, leftmost-greedy and
    * non-overlapping — exactly the order a sequential tokenizer merges.
    *
    * The greedy recurrence merged(i) = match(i) ∧ ¬merged(i-1) looks
    * sequential, but has a closed form over windows: consecutive match
    * positions can only chain when a = b (match(i) ∧ match(i+1) forces
    * t(i+1) = a = b), so within each ISLAND of consecutive matches greedy
    * merges exactly the even offsets from the island start. Match flags,
    * island starts, the running island-start position, parity, and the
    * consumed-successor flag are all windows over ONE (doc_id, pos)
    * sort — a single shuffle, no recursion, no UDF; identical SQL runs in
    * the oracle. Merged pairs emit as "a_b"; the per-doc output carries
    * counts plus a 60-bit hash of the rebuilt stream, so the verification
    * pins the actual merged sequence, not just how often it merged.
    */
  def bpeApplyMerge(documents: DataFrame, a: String, b: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    documents
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("m",
        coalesce(col("tok") === lit(a) && lead("tok", 1).over(byDoc) === lit(b),
          lit(false)))
      .withColumn("isl_start",
        col("m") && !coalesce(lag("m", 1).over(byDoc), lit(false)))
      .withColumn("p0", max(when(col("isl_start"), col("pos"))).over(byDoc))
      .withColumn("merged", col("m") && (col("pos") - col("p0")) % 2 === 0)
      .withColumn("consumed", coalesce(lag("merged", 1).over(byDoc), lit(false)))
      .withColumn("out",
        when(col("merged"), lit(s"${a}_$b"))
          .when(!col("consumed"), col("tok")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_before"),
        sum(col("merged").cast("long")).as("n_merges"),
        (count(lit(1)) - sum(col("merged").cast("long"))).as("n_after"),
        graft.functions.Exact.md5Hash60(concat_ws(" ", transform(
          array_sort(collect_list(when(col("out").isNotNull,
            struct(col("pos"), col("out"))))),
          x => x.getField("out")))).as("merged_hash"))
  }

  /** [[bpeApplyMerge]] driven by the corpus's own argmax pair — one full
    * BPE training iteration (count → choose → apply). The top-1 pair is
    * driver-collected control flow, like the heavy-hitter sketch: one
    * broadcast-sized row decides the next distributed pass.
    */
  def bpeApplyStep(documents: DataFrame): DataFrame = {
    val top = bpeMergeStep(documents, 1).select("pair").collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "bpeApplyStep: no bigram to merge — no document has >= 2 tokens"))
      .getString(0)
    val Array(a, b) = top.split(" ", 2)
    bpeApplyMerge(documents, a, b)
  }

  /** BPE-ish token classes: counts of alpha runs, digit runs, and single
    * non-alphanumeric symbols — the regex-class pre-tokenization a BPE
    * tokenizer applies before merges. Integer outputs on both engines.
    */
  def tokenClasses(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long").as("n_alpha_runs"),
      size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").as("n_digit_runs"),
      size(expr("regexp_extract_all(lower(text), '[^a-z0-9 ]', 0)")).cast("long").as("n_symbols"))
      .withColumn("n_bpe_tokens",
        col("n_alpha_runs") + col("n_digit_runs") + col("n_symbols"))

  /** Repetition-based quality gates (Gopher-style "repetitive document"
    * filters): per doc, the frequency profile of its 2-grams — total
    * bigrams, the most-frequent bigram's count, how many distinct bigrams
    * repeat, and duplicate-token count. `is_repetitive` fires when the top
    * bigram covers over 20% of all bigrams (integer cross-multiplication, no
    * float ratio). Shape: explode bigrams → count per (doc, bigram) → roll
    * up per doc — two agg shuffles both keyed by doc_id (the second is a
    * sub-aggregation of the first, so AQE plans them back to back); at
    * corpus scale this is the standard explode-aggregate profile, never
    * quadratic.
    */
  def repetition(documents: DataFrame): DataFrame = {
    val base = documents
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(expr(
            """transform(sequence(0, size(toks) - 2),
              |  j -> concat_ws(' ', element_at(toks, j + 1), element_at(toks, j + 2)))"""
              .stripMargin)).as("bigrams"))
    // single pass: per-doc scalars ride through both aggregations as
    // grouping keys (functionally dependent on doc_id, so cardinality is
    // unchanged) instead of re-scanning base for a join-back — the
    // tokenize+bigram construction runs exactly once. explode_outer keeps
    // bigram-less docs as one null-bg row (c = count(bg) = 0), replacing
    // the old left join + coalesce(0).
    base
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        size(col("bigrams")).cast("long").as("n_2grams"),
        explode_outer(col("bigrams")).as("bg"))
      .groupBy("doc_id", "n_tokens", "n_distinct_tokens", "n_2grams", "bg")
      .agg(count(col("bg")).as("c"))
      .groupBy("doc_id", "n_tokens", "n_distinct_tokens", "n_2grams")
      .agg(
        max(col("c")).as("top_2gram_count"),
        count(when(col("c") > 1, 1)).as("n_repeated_2grams"))
      .withColumn("n_dup_tokens", col("n_tokens") - col("n_distinct_tokens"))
      .withColumn("is_repetitive",
        col("top_2gram_count") * 5 > col("n_2grams") && col("n_2grams") > 0)
      .select("doc_id", "n_tokens", "n_dup_tokens", "n_2grams",
        "top_2gram_count", "n_repeated_2grams", "is_repetitive")
  }

  /** Bigram language-model novelty score — the integer-exact analog of the
    * CCNet/KenLM perplexity filter every web-scale curation pipeline runs:
    * train an n-gram LM on a reference slice, score every document by how
    * familiar its n-grams are, and flag the tail. The reference slice here
    * is the even-`doc_id` half (a deterministic in-corpus split; production
    * would point `model` at a trusted corpus — the shapes are identical).
    *
    * Per document: `n_bigrams` (token-bigram occurrences), `n_unseen`
    * (occurrences whose bigram never appears in the model slice — the exact
    * integer surrogate for infinite-perplexity n-grams), `model_mass`
    * (Σ occ·model_count, a monotone familiarity proxy standing in for
    * Σ log p without the transcendental that could never hash-match across
    * engines), and `is_novel` = `n_unseen·100 > n_bigrams·unseenPct` in
    * exact cross-multiplied integers.
    *
    * Scale shape: the model is CORPUS-sized (1e9+ distinct bigrams at
    * 100 TB) so nothing broadcasts — the probe is a shuffled join on the
    * bigram key. Doc-side occurrences are pre-aggregated per (doc_id,
    * bigram) before the join (boilerplate-heavy docs repeat bigrams, so the
    * join input shrinks), the model aggregate gets map-side partial
    * aggregation, and bigram-less docs (<2 tokens) re-enter via a left join
    * from the doc-id spine rather than a second corpus scan.
    *
    * Integer bound: `model_mass` accumulates Σ occ·mcount in Long. Spark
    * (non-ANSI) wraps silently on overflow while DuckDB sums in HUGEINT and
    * raises casting to BIGINT, so past ~9.2e18 the engines DIVERGE rather
    * than both failing. That needs per-doc-Σ(occ·global-bigram-count) >
    * 2^63 — e.g. a million-occurrence bigram that also appears ~1e13 times
    * corpus-wide — beyond any real corpus (a 100 TB corpus has ~2e13 total
    * bigram OCCURRENCES across ALL bigrams). Callers feeding adversarial
    * token streams should pre-cap `occ` if they need the hash-exact
    * contract at that scale.
    */
  def lmNovelty(documents: DataFrame, unseenPct: Int = DefaultUnseenPct): DataFrame = {
    val docBg = documents
      .select(col("doc_id"), tokens(col("text")).as("raw_toks"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.filter(col("raw_toks"), t => t =!= "")
          .as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(expr(
            """transform(sequence(0, size(toks) - 2),
              |  j -> concat_ws(' ', element_at(toks, j + 1),
              |                      element_at(toks, j + 2)))""".stripMargin)))
          .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("occ"))
    // model counts ride a bigram-partition window instead of a separate
    // half-corpus aggregate joined back (r21): the join form shuffled
    // docBg on bg for the join ANYWAY, so the window has identical
    // colocation — minus the model branch, its groupBy exchange, and the
    // join. A bigram absent from the even-doc model half sums to NULL,
    // exactly the left-join miss the unseen test keys on.
    val scored = docBg
      .withColumn("mcount",
        sum(when(col("doc_id") % 2 === 0, col("occ")))
          .over(Window.partitionBy("bg")))
      .groupBy("doc_id")
      .agg(
        sum("occ").as("n_bigrams"),
        sum(when(col("mcount").isNull, col("occ")).otherwise(lit(0L)))
          .as("n_unseen"),
        sum(col("occ") * coalesce(col("mcount"), lit(0L))).as("model_mass"))
    documents.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("model_mass"), lit(0L)).as("model_mass"),
        (coalesce(col("n_unseen"), lit(0L)) * 100 >
          coalesce(col("n_bigrams"), lit(0L)) * unseenPct).as("is_novel"))
  }

  /** Winnowing fingerprints — Schleimer/Wilkerson/Aiken's MOSS algorithm
    * (SIGMOD 2003), the standard local document-fingerprinting scheme:
    * hash every shingle, slide a window of `w` consecutive hashes, select
    * each window's minimum. The selected set carries the guarantee the
    * [[fingerprints]] min/max sample lacks: ANY shared run of at least
    * `w + 2` tokens (w shingle hashes of 3-token shingles) contributes at
    * least one COMMON fingerprint to both documents, so substring-level
    * matches are detectable from fingerprints alone, at ~2/(w+1) sampling
    * density. The set-valued selection is pinned through SCALAR summaries
    * (count, min, max, xor — order-independent and collision-checkable)
    * so the oracle compare stays on scalar columns.
    *
    * Scale shape: map-only narrow pass — hashing AND window-min selection
    * run as ONE kernel call per doc ([[graft.functions.WinnowFps]], a
    * monotonic-deque O(shingles) loop; the HOF formulation's O(m·w)
    * interpreted array_min rescans measured 10× slower); no shuffle, no
    * explode. Docs with fewer than w shingles winnow as one
    * whole-sequence window, the paper's short-doc case.
    */
  val WinnowWindow = 4

  def winnowing(documents: DataFrame, w: Int = WinnowWindow): DataFrame =
    winnowingFrom(shingleHashStream(documents), w)

  /** Winnowing over the MATERIALIZED hash stream ([[shingleHashStream]]):
    * only the O(m) deque selection runs — tokenization, shingling, and the
    * md5 pass (the dominant cost) were paid once when the stream was built.
    * winnow_mins over the stored hashes is winnow_fps' own second half, so
    * output is bit-identical to the self-contained form.
    */
  def winnowingFrom(hashStream: DataFrame, w: Int = WinnowWindow): DataFrame = {
    graft.functions.HashExpressions.register(hashStream.sparkSession,
      Dedup.SimHashBits, Dedup.NumPerms, Dedup.permA, Dedup.permB, Dedup.MinhashP)
    hashStream
      .withColumn("fps", expr(s"winnow_mins(hashes, $w)"))
      .select(
        col("doc_id"),
        size(col("hashes")).cast("long").as("n_shingles"),
        size(col("fps")).cast("long").as("n_fp"),
        element_at(col("fps"), 1).as("fp_low"),
        element_at(col("fps"), -1).as("fp_high"),
        expr("aggregate(fps, 0L, (a, x) -> a ^ x)").as("fp_xor"))
  }

  /** Hashed-feature linear quality classifier — the fastText-style scorer
    * web-scale pipelines run after the heuristic rules ([[graft.ext.Curation.gopherRules]]):
    * the hashing trick maps each token to one of `ClassifierBuckets` feature
    * buckets, a linear model assigns each bucket an integer weight, and the
    * document's score is the sum of its tokens' weights. The WEIGHTS here
    * are a deterministic stand-in (bucket → `(bucket % ClassifierMod) - 8`,
    * i.e. integers in [-8, 8]) because no training corpus ships with the
    * repo — a real deployment broadcasts a trained weight array and swaps
    * the weight expression; every other part (tokenize → hash → bucket →
    * sparse dot product → threshold) is the production path. Integer logit
    * and cross-multiplied threshold keep the output hash-exact vs DuckDB.
    *
    * Scale shape: MAP-ONLY — the per-token work runs as ONE native kernel
    * call per document ([[graft.functions.HashedWeightSum]], the tight-loop
    * form of the md5→bucket→weight math), so a 100 TB corpus scores with
    * ZERO shuffle (contrast explode→groupBy, which shuffles one row per
    * token occurrence). The HOF formulation of the same sum (an interpreted
    * md5/substring/conv expression tree per token) measured 10× slower at
    * sf0.1 — the [[fingerprints]] lesson, same fix.
    */
  val ClassifierBuckets = 1024
  val ClassifierMod = 17

  def qualityClassifier(documents: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(documents.sparkSession,
      Dedup.SimHashBits, Dedup.NumPerms, Dedup.permA, Dedup.permB, Dedup.MinhashP)
    documents
      .select(col("doc_id"), tokens(col("text")).as("raw_toks"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.filter(col("raw_toks"), t => t =!= "")
          .as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr(s"hashed_weight_sum(toks, $ClassifierBuckets, $ClassifierMod)")
          .as("logit"))
      .withColumn("is_quality", col("logit") > 0)
  }

  /** Corpus vocabulary heavy hitters: the global top-k tokens by total term
    * frequency, with document frequency alongside — the "what is this corpus
    * made of" report every curation run starts with.
    *
    * Scale shape: explode → hash-aggregate with map-side partial aggregation
    * (the shuffle carries one row per distinct token per partition, not one
    * per occurrence), then top-k as TakeOrderedAndProject — never a global
    * sort of the vocabulary.
    */
  def vocabTop(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)

  /** Top bigram collocations by a PMI-equivalent exact score — the
    * collocation-extraction report (multi-word terms, named entities,
    * boilerplate phrases) that vocabulary analysis at corpus scale needs.
    * Score: `score_ppm = floor(1e6 · c(ab) · N / (c(a) · c(b)))`, with
    * c(a) unigram counts and N the non-empty token total. True PMI is
    * `log(c(ab)·N²/(N_bi·c(a)·c(b)))` — a per-corpus constant factor and a
    * monotone log away, so the RANKING is identical while the arithmetic
    * stays in exact BIGINT (a transcendental log could never hash-match
    * across engines; at trillion-token scale the product needs DECIMAL(38),
    * same shapes). `minCount` floors pair support — PMI's classic failure
    * mode is rare-pair noise at the top.
    *
    * Scale shape: TWO corpus scans total — one narrow pass builds
    * adjacent-pair rows from the materialized token array (no self-join on
    * positions), one builds the unigram counts. The unigram aggregate is
    * VOCABULARY-sized, so it is eagerly checkpointed and read three times
    * (join side a, join side b, the N total) instead of re-deriving each
    * from its own corpus scan — without it the plan scans the parquet four
    * times. Both token-aggregate join sides broadcast; top-k plans as
    * TakeOrderedAndProject — never a global sort. (The Bench/Verify
    * harness sweep releases the checkpoint blocks after consumption.)
    */
  def collocations(documents: DataFrame, minCount: Long = 5, topK: Int = 50): DataFrame = {
    // ONE corpus scan and ONE corpus-sized shuffle: every token emits
    // exactly one (token, successor-or-"" sentinel) row, so the bigram
    // aggregate — which a pair count pays anyway — also CONTAINS the
    // unigram counts (uni(a) = Σ_b cnt(a, b), the sentinel row carrying
    // each position with no successor). The former two-subtree form
    // scanned and tokenized the corpus once per granularity; everything
    // below the checkpoint is bigram-vocabulary-sized. Empty tokens
    // cannot occur ([[tokens]] never emits them mid-array for normalized
    // text), and "" as the no-successor sentinel cannot collide with a
    // real token for the same reason.
    val bi = documents
      .select(tokens(col("text")).as("toks"))
      .select(explode(expr(
        // try_element_at (1-based), not toks[j + 1]: ANSI mode throws on
        // an out-of-range array index, and the LAST position's successor
        // is exactly that — the sentinel must come from a null, not an
        // error (the ext_chat_validate precedent)
        "transform(sequence(0, size(toks) - 1), " +
          "j -> named_struct('a', toks[j], " +
          "'b', coalesce(try_element_at(toks, j + 2), '')))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= "")
      .groupBy("a", "b").agg(count(lit(1)).as("pair_n"))
      .localCheckpoint(true)
    val uni = bi.groupBy("a").agg(sum("pair_n").as("c"))
    val nTok = uni.agg(coalesce(sum("c"), lit(0L)).as("n"))
    bi
      .filter(col("b") =!= "" && col("pair_n") >= minCount)
      .join(uni.select(col("a"), col("c").as("ca")), "a")
      .join(uni.select(col("a").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(nTok))
      .select(col("a"), col("b"), col("pair_n"),
        expr("(pair_n * n * 1000000L) div (ca * cb)").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Per-doc out-of-vocabulary rate against the corpus's top-`vocabSize`
    * tokens — an integer-exact quality score (unlike log-prob LM scoring,
    * whose transcendental math cannot hash-match across engines): garbled /
    * boilerplate-heavy / wrong-language docs surface as high OOV. Empty
    * tokens are dropped on both sides (same convention as [[vocabTop]]).
    *
    * Scale shape: the vocabulary is a TakeOrderedAndProject over the token
    * aggregate (top-K never global-sorts) and broadcasts back to the token
    * stream — the corpus side is explode → broadcast left join → one agg
    * shuffle keyed by doc_id. Two corpus scans by design: a global top-K
    * SET cannot ride a window the way tfidf's per-token df does.
    */
  def oovRate(documents: DataFrame, vocabSize: Int = 16): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 100 div n_tokens").as("oov_pct"))
  }

  /** Per-doc keyword extraction, TF-IDF in rank form: each doc's top-k
    * tokens ordered by term frequency descending, then document frequency
    * ascending (rarer wins the tie — the idf direction), then token. Pure
    * integer/lexicographic ordering — no float idf, so the DuckDB oracle
    * matches exactly and the ranking is reproducible everywhere.
    *
    * Scale shape: ONE corpus scan. tf is an explode+aggregate keyed
    * (doc_id, token); df rides the same lineage as a count over a
    * token-partitioned window (the rows must co-locate by token to attach
    * df no matter what — the window is that one shuffle, where the obvious
    * df-table self-join would rescan the corpus for its second branch:
    * column pruning strips the count from the df subtree, the exchanges no
    * longer canonicalize equal, and AQE reuse never fires). The rank filter
    * plans as WindowGroupLimit, so each doc's partial top-k is taken
    * map-side before the doc_id shuffle.
    */
  def tfidfKeywords(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "df")
  }

  /** Document fingerprint: min/max 60-bit shingle hashes (min-sampling /
    * winnowing-style). Two docs share a fingerprint iff they share extremal
    * shingles — a cheap pre-dedup signal.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    fingerprintsFrom(shingleHashStream(documents))

  /** Fingerprints over the MATERIALIZED hash stream — two array extrema
    * and a pass-through of the stored whole-doc hash; all md5 work was
    * paid at stream build.
    */
  def fingerprintsFrom(hashStream: DataFrame): DataFrame =
    hashStream.select(
      col("doc_id"),
      array_min(col("hashes")).as("fp_min"),
      array_max(col("hashes")).as("fp_max"),
      col("fp_exact"))

  /** The shared shingle-hash stream under [[fingerprints]] and
    * [[winnowing]]: per doc, the md5h60 hash of every 3-token shingle plus
    * the whole-normalized-text hash. Both fingerprinting audits consume
    * exactly this — tokenize → shingle → md5-per-shingle is their common
    * dominant cost, so a pipeline that runs both materializes the stream
    * once (SparkEntry routes the two queries through one TrainedStore
    * artifact; hashes are deterministic, so the cached copy is
    * bit-identical to a fresh pass). Map-only narrow pass, no shuffle.
    */
  def shingleHashStream(documents: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(documents.sparkSession,
      Dedup.SimHashBits, Dedup.NumPerms, Dedup.permA, Dedup.permB, Dedup.MinhashP)
    documents
      .withColumn("toks", tokens(col("text")))
      .withColumn("shingle_arr", shinglesFromTokens("toks"))
      // native one-pass kernel (md5 per shingle dominates; the interpreted
      // per-element lambda form pays an expression-tree eval per shingle)
      .select(
        col("doc_id"),
        expr("md5h60_arr(shingle_arr)").as("hashes"),
        Exact.md5Hash60(normalized(col("text"))).as("fp_exact"))
  }
}
