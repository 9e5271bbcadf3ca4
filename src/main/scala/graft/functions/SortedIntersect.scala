package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED-ascending integer
  * arrays via a single merge walk — the verification loop of the exact
  * τ-Jaccard joins. The built-in `size(array_intersect(a, b))` builds a
  * hash set of one side and materializes the intersection array per pair;
  * at millions of surviving candidate pairs that allocation IS the
  * verification cost. This is one fused no-allocation loop over the two
  * ArrayData buffers with whole-stage codegen, the [[IntDot]] pattern.
  * Element types may be int or bigint independently per side (the batch
  * join's tids are `row_number` ints; the persisted index stores bigint).
  *
  * PRECONDITION: both arrays sorted ascending with distinct elements —
  * exactly what the jaccard paths' `sort_array(collect_list(tid))` over
  * per-doc DISTINCT tokens produces. On unsorted input the count is an
  * undercount, not an error — callers own the invariant; the count equals
  * `size(array_intersect(...))` whenever it holds, which is what the
  * DuckDB oracle hash-checks end-to-end.
  *
  * Null if either side is null (BinaryExpression default). Null ELEMENTS
  * are skipped — the precondition requires non-null elements, but the
  * function is session-registered for arbitrary SQL, so a null slot must
  * not be read as a garbage value; note `array_intersect` counts a null
  * present on both sides, so on null-bearing input this intentionally
  * reports the non-null intersection instead.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int|bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  private def isLong(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == LongType
  private def mayHaveNulls(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xl = isLong(left.dataType)
    val yl = isLong(right.dataType)
    val xn = mayHaveNulls(left.dataType)
    val yn = mayHaveNulls(right.dataType)
    var i = 0
    var j = 0
    var c = 0L
    val n = x.numElements()
    val m = y.numElements()
    while (i < n && j < m) {
      if (xn && x.isNullAt(i)) i += 1
      else if (yn && y.isNullAt(j)) j += 1
      else {
        val xv = if (xl) x.getLong(i) else x.getInt(i).toLong
        val yv = if (yl) y.getLong(j) else y.getInt(j).toLong
        if (xv == yv) { c += 1L; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX =
        if (isLong(left.dataType)) s"$x.getLong($i)" else s"(long) $x.getInt($i)"
      val getY =
        if (isLong(right.dataType)) s"$y.getLong($j)" else s"(long) $y.getInt($j)"
      // null-slot skips only compile in when the type says nulls can occur,
      // so the internal (containsNull=false) callers keep the tight loop
      val skipXNull =
        if (mayHaveNulls(left.dataType))
          s"if ($x.isNullAt($i)) { $i++; continue; }" else ""
      val skipYNull =
        if (mayHaveNulls(right.dataType))
          s"if ($y.isNullAt($j)) { $j++; continue; }" else ""
      s"""
         |long $c = 0L;
         |int $i = 0;
         |int $j = 0;
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |while ($i < $n && $j < $m) {
         |  $skipXNull
         |  $skipYNull
         |  long $xv = $getX;
         |  long $yv = $getY;
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1)),
      "built-in")
}
