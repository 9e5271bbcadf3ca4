package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy term matching at corpus scale — spell-correcting rare terms
  * against a trusted dictionary, linking near-identical phrases across
  * snapshots, OCR/transcription noise triage. The training-data use is the
  * same as the dedup family's: a vocabulary-normalization pass before
  * tokenizer training (a typo'd phrase must count toward its canonical
  * form, not fragment the distribution).
  *
  * Candidate generation is the SymSpell delete-neighborhood join (Garbe's
  * public algorithm; the FastSS line of work — Bocek et al. 2007 — proves
  * the bound): two terms within Levenshtein distance 1 ALWAYS share a key
  * in `{t} ∪ del1(t)` — an insertion means the query IS in the dictionary
  * term's delete set, a deletion the reverse, and a substitution means
  * deleting the differing position from both yields the same string. So an
  * equi-join on neighborhood keys has NO false negatives at distance ≤ 1,
  * and a `levenshtein` verify on the candidate pairs removes the false
  * positives (distance-2 pairs that share a key, e.g. transpositions) —
  * the PPJoin posture the exact-Jaccard join uses: lossless filter, exact
  * verify, never all-pairs.
  *
  * Scale: the neighborhood inflates each side by ~`len(term)+1` rows of
  * short strings — linear, not quadratic; the join shuffles on the key
  * (dictionary side buildable once and bucketed like every index here).
  * Hot keys come from SHORT terms (a 2-char term's deletes collide with
  * everything 1-char); [[MinTermLen]] is that guard — at distance 1 a
  * match needs `abs(len(q)-len(d)) <= 1`, so a length floor on both sides
  * bounds key fan-in without losing any qualifying pair among kept terms.
  */
object Fuzzy {

  /** Length floor for dictionary/query terms (see hot-key note above) —
    * interpolated into the DuckDB oracle so both sides prune identically.
    */
  val MinTermLen = 4

  /** Dictionary admission threshold: a term must appear in at least this
    * many corpus positions to be trusted as a correction target.
    */
  val DictMinCount = 2

  /** `{t} ∪ del1(t)`: the term plus every single-character deletion.
    * `array_union` also dedupes (deleting either of a doubled character
    * yields the same variant). Guarded for the degenerate empty term.
    */
  def deleteNeighborhood(termCol: String): Column =
    when(length(col(termCol)) < 1, array(col(termCol)))
      .otherwise(expr(
        s"""array_union(array($termCol),
           |  transform(sequence(1, length($termCol)),
           |    i -> concat(substring($termCol, 1, i - 1),
           |                substring($termCol, i + 1, length($termCol)))))"""
          .stripMargin))

  /** Trusted dictionary: distinct 3-token shingles seen at least
    * `minCount` times, length-floored. One tokenize→shingle pass + one
    * hash aggregation (partial+final) — the same dominant cost profile as
    * the fingerprint family.
    */
  def dictionary(documents: DataFrame, minCount: Int = DictMinCount): DataFrame =
    TextAnalysis.shingleStream(documents)
      .select(col("shingle").as("term"))
      .filter(length(col("term")) >= MinTermLen)
      .groupBy("term").agg(count(lit(1)).as("term_count"))
      .filter(col("term_count") >= minCount)

  /** Deterministic typo injection for the oracle corpus: every `mod`-th
    * doc contributes its lexicographically-first shingle, perturbed by one
    * edit chosen by `doc_id % 3` (delete / substitute-'q' / insert-'q') at
    * position `(doc_id div 3) % len` — pure integer column arithmetic the
    * DuckDB oracle reproduces verbatim, the [[graft.ext.Dedup.withPerturbedCopies]]
    * pattern for a corpus whose real vocabulary is uniform.
    */
  def typoQueries(documents: DataFrame, mod: Int = 5): DataFrame =
    TextAnalysis.shingleStream(documents.filter(col("doc_id") % mod === 0))
      .groupBy("doc_id").agg(min("shingle").as("term"))
      .filter(length(col("term")) >= MinTermLen)
      .select(col("doc_id"), expr(
        """CASE CAST(doc_id % 3 AS INT)
          |  WHEN 0 THEN concat(
          |    substring(term, 1, CAST((doc_id div 3) % length(term) AS INT)),
          |    substring(term, CAST((doc_id div 3) % length(term) AS INT) + 2, length(term)))
          |  WHEN 1 THEN concat(
          |    substring(term, 1, CAST((doc_id div 3) % length(term) AS INT)), 'q',
          |    substring(term, CAST((doc_id div 3) % length(term) AS INT) + 2, length(term)))
          |  ELSE concat(
          |    substring(term, 1, CAST((doc_id div 3) % length(term) AS INT) + 1), 'q',
          |    substring(term, CAST((doc_id div 3) % length(term) AS INT) + 2, length(term)))
          |END""".stripMargin).as("q_term"))

  /** Distance-≤1 fuzzy join: `queries(doc_id, q_term)` against
    * `dict(term, …)`. Delete-neighborhood equi-join generates candidates
    * (no false negatives — see object doc), one distinct collapses pairs
    * that share several keys, and a codegen'd `levenshtein` verifies.
    * Output `(doc_id, q_term, dict_term, dist)` — the exact set the
    * all-pairs `levenshtein <= 1` twin produces over the same universes.
    */
  def fuzzyMatch(queries: DataFrame, dict: DataFrame): DataFrame = {
    val qk = queries
      .select(col("doc_id"), col("q_term"),
        explode(deleteNeighborhood("q_term")).as("k"))
    val dk = dict
      .select(col("term").as("dict_term"),
        explode(deleteNeighborhood("term")).as("k"))
    qk.join(dk, "k")
      .select("doc_id", "q_term", "dict_term")
      .distinct()
      .filter(levenshtein(col("q_term"), col("dict_term")) <= 1)
      .withColumn("dist", levenshtein(col("q_term"), col("dict_term")).cast("long"))
  }

  /** The oracle-checked composition: typo'd queries vs the corpus
    * dictionary. At 100 TB the dictionary builds once (bucketed, like the
    * BM25/LSH index families) and only the query side is per-batch.
    */
  def spellMatch(documents: DataFrame): DataFrame =
    fuzzyMatch(typoQueries(documents), dictionary(documents))
}
