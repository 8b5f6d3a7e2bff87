package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Scalar kernel for [[ZOrderKey]], called from generated code. */
object ZOrderImpl {

  /** Spread the low 31 bits of `v` to the even bit positions of a
    * 64-bit word (Morton encoding's half): classic mask-and-shift
    * ladder, 5 shift+and steps instead of a 31-iteration bit loop.
    * Bits ≥ 31 are dropped (the key contract: callers own the range;
    * the layout operator interleaves catalog keys, which are far
    * smaller). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 62-bit Morton/Z-order key: x's low 31 bits on even positions,
    * y's on odd — bit i of x lands at 2i, bit i of y at 2i+1, exactly
    * `Σ_i ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1)`, the formula the DuckDB
    * oracle evaluates literally (ZOrderPropSpec pins the ladder
    * against that naive model). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** Native Catalyst expression: `graft_zorder(x, y)` → BIGINT Z-order
  * (Morton) key of two BIGINT dimensions' low 31 bits.
  *
  * The data-layout primitive behind multi-dimension scan pruning at
  * 100 TB (Delta/Iceberg `OPTIMIZE ZORDER BY` shape): rows written in
  * Z-key order give every file a small min/max RECTANGLE in (x, y),
  * so a predicate on EITHER dimension prunes files — a single-column
  * sort can only prune its own column. Per-row on the full corpus ⇒
  * native expression (same hot-path policy as [[DotProduct]]): the
  * mask ladder is 10 ALU ops inside whole-stage codegen, where the
  * composable `aggregate(sequence(0,30), ...)` lambda drops the stage
  * to interpreted per-element eval.
  */
final case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects two BIGINT arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
