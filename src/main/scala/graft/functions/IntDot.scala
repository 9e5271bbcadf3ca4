package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two bigint vectors — the
  * scoring loop of SQ8 (int8 scalar-quantized) exhaustive search. Integer
  * dots are exact in any evaluation order, but the HOF formulation
  * (`aggregate(zip_with(...))`) allocates an intermediate zipped array and
  * evaluates two lambdas per element for every scored pair — at Q×N scored
  * pairs that interpretation overhead IS the query cost. This expression is
  * one fused loop over the two ArrayData buffers with whole-stage codegen,
  * same pattern as [[CosineSimilarity]].
  *
  * Semantics: null if either side is null or lengths differ; 64-bit
  * wraparound on overflow (not reachable from int8 codes at any real
  * dimensionality: |x·y| ≤ 127² · dims).
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        dot += x.getLong(i) * y.getLong(i)
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $x.getLong($i) * $y.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot",
      (exprs: Seq[Expression]) => IntDot(exprs.head, exprs(1)),
      "built-in")
}
