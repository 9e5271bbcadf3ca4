package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SymSpell/FastSS key generator: `{t} ∪ del1(t) [∪ del2(t)]` as
  * one JVM call per term — the candidate-key side of the fuzzy-match
  * family (see [[graft.ext.Fuzzy]] for the losslessness argument).
  *
  * Why native: the SQL formulation is a nested `transform` (a higher-order
  * function, evaluated INTERPRETED per element — Catalyst does not codegen
  * lambda bodies) followed by `array_distinct` (pairwise O(n²) string
  * comparisons at array sizes ~len²/2 ≈ 120–250). Measured on the sf0.1
  * dictionary (22k terms, len ≈ 15): 5.1–5.5 s for the del≤2 explode vs
  * ~0.45 s through this kernel (~12×) — the [[SortedIntersectCount]] /
  * hashed_weight_sum posture of fusing a per-row loop into one call.
  *
  * Semantics: code-point-level deletions (matches SQL `substring`
  * character indexing, so the kernel form and the
  * [[graft.ext.Fuzzy.deleteNeighborhood2]] column form are element-set
  * equal — pinned by ExtSpec). Every 2-deletion is some i<j code-point
  * pair; dedup via a hash set, insertion-ordered (order is irrelevant to
  * the equi-join consumers). `maxEdits` must be a foldable int in {1, 2}.
  */
case class DeleteNeighborhoodKeys(child: Expression, maxEdits: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && (maxEdits == 1 || maxEdits == 2))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and maxEdits in {1,2}, " +
        s"got ${child.dataType.catalogString} / $maxEdits")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "del_keys"

  private def drop1(cps: Array[Int], skip: Int): String = {
    val sb = new java.lang.StringBuilder(cps.length)
    var i = 0
    while (i < cps.length) {
      if (i != skip) sb.appendCodePoint(cps(i))
      i += 1
    }
    sb.toString
  }

  private def drop2(cps: Array[Int], skipA: Int, skipB: Int): String = {
    val sb = new java.lang.StringBuilder(cps.length)
    var i = 0
    while (i < cps.length) {
      if (i != skipA && i != skipB) sb.appendCodePoint(cps(i))
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val out = new java.util.LinkedHashSet[String](
      1 + n + (if (maxEdits >= 2) n * (n - 1) / 2 else 0), 1.0f)
    out.add(s)
    var i = 0
    while (i < n) {
      out.add(drop1(cps, i))
      if (maxEdits >= 2) {
        var j = i + 1
        while (j < n) { out.add(drop2(cps, i, j)); j += 1 }
      }
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeleteNeighborhoodKeys {
  /** Registers `del_keys(term, maxEdits)`; maxEdits must be a literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "del_keys",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "del_keys(term, maxEdits) needs a literal maxEdits")
        DeleteNeighborhoodKeys(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      },
      "built-in")
}
