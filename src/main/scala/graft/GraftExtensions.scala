package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, RollingHash, SimHash16, TokenCounts, TrigramCodes, WordShingleArray, WordShingles, ZOrderKey}

/** Session extension installing graft's native expressions, so SQL can
  * call them by name:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT graft_simhash16(text) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (args: Seq[Expression]) => SimHash16(args.head)),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, literalWidth(args(1)))),
    (FunctionIdentifier("graft_shingle_array"),
      new ExpressionInfo(classOf[WordShingleArray].getName, "graft_shingle_array"),
      (args: Seq[Expression]) => WordShingleArray(args.head, literalWidth(args(1)))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    (FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (args: Seq[Expression]) => TokenCounts(args.head)),
    (FunctionIdentifier("graft_trigram_codes"),
      new ExpressionInfo(classOf[TrigramCodes].getName, "graft_trigram_codes"),
      (args: Seq[Expression]) => TrigramCodes(args.head)),
    (FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => ZOrderKey(x, y)
        case other => throw new IllegalArgumentException(
          s"graft_zorder requires exactly 2 arguments, got ${other.length}")
      }))

  private def literalWidth(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"shingle width must be a literal int, got $other")
  }

  /** Runtime registration of the FUNCTIONS only, for sessions created
    * without the extension (Verify/Bench register this way). The
    * [[graft.plans.RewriteRankFilterToTopK]] optimizer rule is NOT
    * added here — it changes window plans session-wide, so it is an
    * explicit opt-in via `spark.sql.extensions=graft.GraftExtensions`
    * or `spark.experimental.extraOptimizations`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
