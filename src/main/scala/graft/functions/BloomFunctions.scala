package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.types.BinaryType

/** SQL surface over Spark's own bloom-filter expressions (the machinery
  * behind `InjectRuntimeFilter`'s row-level runtime filters, not exposed in
  * the public function registry):
  *
  *  - `bloom_agg(hash_long, est_items, num_bits)` — aggregates a bloom
  *    filter sketch (binary) over a LONG hash column. Bit-OR construction,
  *    so the result is identical under any partitioning or merge order.
  *  - `bloom_might_contain(bf, hash_long)` — membership probe; the filter
  *    side must be a constant or scalar subquery (Spark materializes the
  *    sketch once per query, exactly like its runtime filters).
  *
  * Returning the raw AggregateFunction from the builder is correct — the
  * analyzer wraps unwrapped aggregate functions in AggregateExpression, the
  * same path every built-in aggregate takes.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ifAbsent(name: String)(body: => Unit): Unit =
      if (!reg.functionExists(FunctionIdentifier(name))) body
    ifAbsent("bloom_agg") {
      reg.createOrReplaceTempFunction(
        "bloom_agg",
        (e: Seq[Expression]) => new BloomFilterAggregate(e.head, e(1), e(2)),
        "built-in")
    }
    ifAbsent("bloom_might_contain") {
      reg.createOrReplaceTempFunction(
        "bloom_might_contain",
        (e: Seq[Expression]) => BloomFilterMightContain(e.head, e(1)),
        "built-in")
    }
  }

  /** Registers `name(hash_long)` as a membership probe against a DRIVER-HELD
    * sketch, closed over as a binary LITERAL at the expression level. This
    * is how a probe reaches inside a higher-order-function lambda (where a
    * scalar subquery cannot appear) and how a long-running stream embeds a
    * build-once filter in its plan without re-planning the subquery per
    * batch. The registration must outlive every plan that references the
    * name — callers use a unique name per sketch and keep it for the
    * session (one registry entry holding the sketch bytes).
    */
  def registerConstProbe(spark: SparkSession, name: String,
                         sketch: Array[Byte]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (e: Seq[Expression]) =>
        BloomFilterMightContain(Literal(sketch, BinaryType), e.head),
      "built-in")
}
