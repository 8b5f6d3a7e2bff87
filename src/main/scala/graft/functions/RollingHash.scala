package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a text column:
  * `acc := (acc * 31 + codepoint) mod 1_000_000_007` over the string's
  * characters — the content-fingerprint primitive (`graft_rolling_hash`).
  *
  * Semantically `aggregate(transform(split(text, ''), c -> ascii(c)),
  * ...)`, but that materializes a per-CHARACTER string array and runs
  * two interpreted lambdas per character; this is one codegen'd loop
  * over the chars, zero allocation. Matches the lambda/oracle
  * formulation for all BMP text (the fixture is ASCII); supplementary
  * characters would hash as surrogate pairs rather than code points.
  */
final case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % Mod
      i += 1
    }
    acc
  }
}
