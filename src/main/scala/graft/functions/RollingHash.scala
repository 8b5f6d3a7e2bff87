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
  * over the CODE POINTS, zero allocation. Code-point (not UTF-16 unit)
  * iteration matches DuckDB's ascii()/Spark's ascii() for all text
  * including supplementary (astral) characters — proven by the UTF-8
  * fixture gate (tools/make_utf8_fixture.py), which caught the
  * earlier surrogate-pair formulation diverging on emoji.
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
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
