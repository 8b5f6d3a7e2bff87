package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic md5-derived Bloom filter over strings — the
  * constant-size transport for membership prefilters whose reference
  * set is too large to broadcast as a hash relation (benchmark n-gram
  * decontamination at web scale: the eval-suite n-gram set can reach
  * 10⁹ entries ≈ tens of GB as a join side, while this bitmap is a
  * FIXED 2 MiB whatever the set's cardinality).
  *
  * The hash is deliberately md5-hex-substring-shaped so the SAME
  * positions are computable in ANY SQL engine: all k positions come
  * from ONE md5 of the gram (the Kirsch-Mitzenmacher observation that
  * k independent-enough hashes can be sliced from one strong digest —
  * 3 × 24 = 72 of md5's 128 bits, disjoint slices): position i is hex
  * chars [6i+1, 6i+6] of `md5(g)` read as an integer — in SQL,
  * `conv(substring(md5(g), 6*i + 1, 6), 16, 10)`. One digest per gram
  * instead of k (measured 1.5× on the whole query at sf1). The DuckDB
  * oracle replays membership at the hex-STRING level (bijective to
  * the bit index), so the whole prefilter — not just the final
  * verified answer — is oracle-checkable, and a drift between this
  * JVM kernel and the SQL build side would fail the EXACT gate (a
  * lost true positive changes `shared_ngrams`).
  *
  * Standard Bloom guarantee: NO false negatives ever (BloomPropSpec's
  * ScalaCheck property); false positives at rate ≈ (1-e^{-kn/m})^k —
  * with k=3, m=2²⁴ and a 10⁵-gram benchmark that is
  * (1-e^{-3·10⁵/2²⁴})³ ≈ 5.6·10⁻⁶, and every positive is
  * exact-verified downstream anyway.
  */
object BloomImpl {

  /** 2²⁴ bits = 6 hex chars of position space = a 2 MiB long[]. */
  val NumBits: Int = 1 << 24
  val Words: Int = NumBits / 64
  val NumHashes: Int = 3

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def digestOf(g: UTF8String): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.update(g.getBytes)
    md.digest()
  }

  /** Position `i` from a digest: md5 bytes [3i, 3i+2] — exactly the
    * integer value of hex chars [6i+1, 6i+6] that SQL's md5 prints. */
  private def posFromDigest(d: Array[Byte], i: Int): Int =
    ((d(3 * i) & 0xff) << 16) | ((d(3 * i + 1) & 0xff) << 8) | (d(3 * i + 2) & 0xff)

  /** Bit position of hash `i` for gram `g` (one-digest form — see the
    * object scaladoc for the SQL twin). */
  def position(i: Int, g: UTF8String): Int =
    posFromDigest(digestOf(g), i)

  def setBit(bits: Array[Long], pos: Int): Unit =
    bits(pos >>> 6) |= 1L << (pos & 63)

  def testBit(bits: Array[Long], pos: Int): Boolean =
    (bits(pos >>> 6) & (1L << (pos & 63))) != 0L

  /** All-k-positions-set membership test, the probe kernel: ONE md5
    * per gram, k slice reads. */
  def contains(g: UTF8String, bits: Array[Long]): Boolean = {
    val d = digestOf(g)
    var i = 0
    while (i < NumHashes) {
      if (!testBit(bits, posFromDigest(d, i))) return false
      i += 1
    }
    true
  }
}

/** Distributed Bloom-bitmap construction: positions (BIGINT) in, one
  * 2 MiB long[] out. The buffer is CONSTANT-size regardless of input
  * cardinality — partial aggregation gives one bitmap per map task and
  * a bitwise-OR merge tree, so building from 10⁹ reference grams
  * shuffles megabytes, not the grams. */
object BloomBitsAgg
  extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](BloomImpl.Words)
  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    BloomImpl.setBit(b, pos.toInt); b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Per-cell (file-footer-sized) Bloom bitmap: 2¹² bits = 64 longs =
  * 512 bytes per cell — the Parquet/Delta column-index bloom shape,
  * small enough that a layout of thousands of cells ships its whole
  * bloom manifest as broadcastable metadata (vs [[BloomImpl]]'s single
  * 2 MiB corpus-wide bitmap). Positions are 3-hex-char (12-bit) md5
  * slices — `conv(substr(md5(key), 3i+1, 3), 16, 10)` — so a SQL
  * engine replays membership at the hex-string level exactly like the
  * 2 MiB sibling. Used as a groupBy aggregator (`functions.udaf`):
  * constant 512-byte partials per (task, cell), bitwise-OR merge. */
object CellBloomImpl {
  val NumBits: Int = 1 << 12
  val Words: Int = NumBits / 64
  val NumHashes: Int = 3
}

object CellBloomAgg
  extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](CellBloomImpl.Words)
  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    BloomImpl.setBit(b, pos.toInt); b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Native probe expression: `BloomMightContain(gram, bits)` → BOOLEAN.
  * Carries the trained bitmap as an opaque payload (shipped to
  * executors via `addReferenceObj`, once per task — NOT inlined into
  * generated source), so it cannot be a registry function; construct
  * it with [[org.apache.spark.sql.GraftShim.column]]. Runs per
  * corpus gram ⇒ native expression inside whole-stage codegen, same
  * hot-path policy as [[DotProduct]]. */
final case class BloomMightContain(child: Expression, bits: Array[Long])
  extends UnaryExpression {

  require(bits.length == BloomImpl.Words,
    s"bitmap must be ${BloomImpl.Words} words, got ${bits.length}")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a STRING gram, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomImpl.contains(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomImpl.contains($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
