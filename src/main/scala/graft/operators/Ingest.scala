package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-side per-record operators (reference §2.2: P1 branch, P2/P3
  * filters, P10 null-scrub, P11 PII allow-list — see SURVEY.md).
  *
  * All operators are pure `DataFrame => DataFrame` so they run identically in
  * batch and Structured Streaming. Filters are plain Catalyst predicates, so
  * they push down to the parquet scan (verified via explain: PushedFilters).
  *
  * Reference behavior being re-expressed (studied, not copied):
  *  - branch on a boolean predicate (LoggedEventsListener.java:82-88)
  *  - filter-by-event-type (DerivedStreams.java:53-61)
  *  - null -> "" scrub at ingest (KafkaLoader.java:132-135)
  *  - PII column allow-list (KafkaUserLoader.java:119-141)
  */
object Ingest {

  /** The testdata analog of the reference's `anonymous_user` flag: `view`
    * events need no authentication. The predicate is injectable so the real
    * deployment can branch on an actual boolean column.
    */
  val anonymousPredicate = col("event_type") === lit("view")

  /** P1 — stream split. Spark has no `branch` primitive; the idiomatic
    * equivalent is two filters over one (cached / re-read) source. Returns
    * the frame tagged with the branch so a single pass covers both sides;
    * callers that need a physical split call `.filter` twice.
    */
  def branchTagged(events: DataFrame): DataFrame =
    events.withColumn("anonymous", anonymousPredicate)

  def mainBranch(events: DataFrame): DataFrame = events.filter(!anonymousPredicate)
  def anonymousBranch(events: DataFrame): DataFrame = events.filter(anonymousPredicate)

  /** P2 — keep records of one event type (pushed-down predicate). */
  def filterByEventType(events: DataFrame, eventType: String): DataFrame =
    events.filter(col("event_type") === lit(eventType))

  /** Parse the open-schema `props` JSON (reference `event_details`) into a
    * typed column. `.path()`-style tolerance: missing key -> null -> scrubbed
    * to a default by `coalesce` (reference KafkaLoader.java:132-135).
    */
  def withPropsK(events: DataFrame): DataFrame =
    events.withColumn(
      "k",
      // try_cast, not cast: ANSI mode (Spark 4 default) makes cast THROW on
      // a malformed value; .path() tolerance means null -> default instead
      coalesce(expr("try_cast(get_json_object(props, '$.k') as long)"), lit(0L)))

  /** The question-attempt analog stream (FIXTURES.md §C): `click` events,
    * with `props.k` split into page/part the way the reference splits
    * `questionId` at '|' (DerivedStreams.java:139-149), and `value > 50`
    * standing in for the `correct` boolean.
    */
  def questionAttempts(events: DataFrame): DataFrame =
    withPropsK(filterByEventType(events, "click"))
      .withColumn("q_page", expr("k div 10"))
      .withColumn("q_part", col("k") % 10)
      .withColumn("correct", col("value") > lit(50.0))

  /** P10/P11 — projection allow-list + null scrub: keep only the allowed
    * columns, coalescing nullable strings to "" like the reference's
    * NullHandler. PII-style columns are simply absent from the allow-list.
    */
  def scrubbed(df: DataFrame, allowList: Seq[String]): DataFrame = {
    val scrubOne = (name: String) => {
      val f = df.schema(name)
      if (f.dataType.typeName == "string") coalesce(col(name), lit("")).as(name)
      else col(name)
    }
    df.select(allowList.map(scrubOne): _*)
  }
}
