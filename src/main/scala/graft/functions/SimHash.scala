package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[SimHash16]], called from generated code. */
object SimHashImpl {

  /** 16-bit SimHash over whitespace tokens: per word, the hash value is
    * the first 16 bits of md5(word) (== the first 4 hex chars of the
    * digest, exactly the dd_simhash definition); each bit votes +1/-1
    * and the signature sets bits with a positive vote sum.
    */
  def simhash16(text: UTF8String): Int = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    // split on single space, keeping empty tokens — identical to
    // Spark's split(text, ' ') feeding the exploded variant
    val words = text.toString.split(" ", -1)
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(words(i).getBytes("UTF-8"))
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var bit = 0
      while (bit < 16) {
        votes(bit) += (if (((v >> bit) & 1) == 1) 1 else -1)
        bit += 1
      }
      i += 1
    }
    var sig = 0
    var bit = 0
    while (bit < 16) {
      if (votes(bit) > 0) sig |= 1 << bit
      bit += 1
    }
    sig
  }
}

/** Native Catalyst expression: the whole SimHash pipeline (tokenize →
  * per-word md5 → bit votes → signature) as ONE codegen'd scalar call.
  *
  * The composable variant (dd_simhash) explodes every word and
  * aggregates 16 bit-votes per (doc, word) row — a shuffle of
  * |corpus tokens| rows. This expression computes the signature inside
  * the scan's whole-stage-codegen pipeline: zero shuffle, zero
  * intermediate rows, same result (dd_simhash_native shares
  * dd_simhash's DuckDB oracle verbatim).
  */
final case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
