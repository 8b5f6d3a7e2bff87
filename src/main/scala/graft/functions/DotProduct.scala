package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two BIGINT arrays: `graft_dot(a, b)`.
  *
  * The workhorse of the similarity-search suite (norms, LSH plane
  * projections, pair verification). Codegen emits a 5-line loop, so it
  * stays inside whole-stage codegen at constant generated-code size —
  * the two alternatives both lose: a lambda
  * (`aggregate(zip_with(...))`) drops the surrounding stage to
  * interpreted per-element eval, and an unrolled
  * `a[0]*b[0] + … + a[63]*b[63]` tree inlined into a join's consume
  * chain overflows Janino's 64 KB method limit (join outputs are local
  * variables, which the expression splitter cannot split across
  * methods) and silently falls back to interpreted execution.
  *
  * Null elements are not expected (quantized embeddings are dense);
  * a null array yields null. Truncates to the shorter length.
  */
final case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two ARRAY<BIGINT> arguments, got ${l.sql} and ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
