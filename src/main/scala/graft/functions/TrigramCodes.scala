package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[TrigramCodes]], called from generated code. */
object TrigramCodesImpl {

  /** Every character trigram of `text` as one packed long per
    * INSTANCE (duplicates preserved, document order): code points
    * c0 c1 c2 → (c0 << 42) | (c1 << 21) | c2. Each code point needs
    * ≤ 21 bits (max U+10FFFF), so the pack is injective on trigrams —
    * equal trigrams get equal codes, distinct ones distinct codes —
    * and because UTF-8 byte order equals code-point order, the NUMERIC
    * order of codes equals the lexicographic STRING order of the
    * trigrams (all length 3, no prefix cases): every COUNT and every
    * (cnt, tri) tie-break downstream is order-identical to the string
    * formulation, which is why the DuckDB oracle keeps its
    * substring-based definition unchanged. Decoding goes through
    * String conversion (same as Spark's regexp path), so malformed
    * UTF-8 follows the JDK replacement rule ([[TokenCountsImpl]]'s
    * documented norm): each maximal ill-formed subpart is one U+FFFD
    * code point. */
  def codes(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    // code points, surrogate-pair aware (astral chars are ONE point)
    var ncp = 0
    var i = 0
    while (i < n) { i += Character.charCount(s.codePointAt(i)); ncp += 1 }
    if (ncp < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val cps = new Array[Int](ncp)
    i = 0
    var k = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](ncp - 2)
    var j = 0
    while (j < ncp - 2) {
      out(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) | cps(j + 2).toLong
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst expression: all character-trigram instances of a
  * text column as packed longs, one array per row.
  *
  * The composable formulation (`explode(sequence(...))` + a
  * `substring(text, i, 3)` per instance) allocates a UTF8String per
  * trigram and hashes strings through every downstream aggregation —
  * at sf10 that is ~10⁸ short-lived strings per pass for
  * tx_trigram_langid's two passes. This kernel decodes each document
  * ONCE and emits primitive longs (UnsafeArrayData, zero boxing), so
  * the explode, the (lang, tri) training aggregation and the
  * broadcast vote join all run on 8-byte keys. Same hot-path policy
  * as [[DotProduct]] / [[TokenCounts]]: the registered query keeps
  * its substring-defined DuckDB oracle, so the packing is proven
  * count- and order-equivalent on every fixture (including multibyte)
  * by the EXACT gate, not by inspection.
  *
  * SQL: `graft_trigram_codes(text)` → ARRAY<BIGINT>
  * (via [[graft.GraftExtensions]]).
  */
final case class TrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_trigram_codes"

  override protected def nullSafeEval(input: Any): Any =
    TrigramCodesImpl.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramCodesImpl.codes($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramCodes =
    copy(child = newChild)
}
