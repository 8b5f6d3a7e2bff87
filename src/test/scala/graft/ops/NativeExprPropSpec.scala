package graft.ops

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{DotProduct, RollingHash, WordShingleArray}

/** Property tests pinning the native expressions' eval against
  * independent pure-Scala models over generated inputs (the oracle
  * queries pin them on fixture data and FunctionsSpec covers the
  * codegen path through SQL; this covers the input space around both).
  */
object NativeExprPropSpec extends Properties("NativeExprs") {

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  // multibyte generator: BMP 2/3-byte chars plus astral (surrogate-pair)
  // code points — the input class where a UTF-16-unit loop diverges
  // from the code-point model (the round-4 UTF-8 fixture bug)
  private val anyCp: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.oneOf(0xe9, 0xdf, 0x4e2d, 0x2211, 0x301),
    2 -> Gen.oneOf(0x1f680, 0x1d4b3, 0x10348))
  private val utf8Text: Gen[String] = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, anyCp).map(
      _.flatMap(Character.toChars(_).toSeq).mkString))

  property("graft_rolling_hash equals the per-CODE-POINT polynomial model") =
    Prop.forAll(Gen.oneOf(text, utf8Text)) { t =>
      val got = RollingHash(Literal(t)).eval(null).asInstanceOf[Long]
      val expected = t.codePoints().toArray
        .foldLeft(0L)((acc, cp) => (acc * 31 + cp) % 1000000007L)
      got == expected
    }

  property("graft_shingle_array equals the sliding-window distinct model") =
    Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val got = WordShingleArray(Literal(t), n).eval(null)
        .asInstanceOf[ArrayData].toObjectArray(
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val words = t.split(" ", -1)
      val expected =
        if (words.length < n) Seq.empty[String]
        else words.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == expected
    }

  property("graft_trigram_codes: injective, order-preserving pack of the substring model") =
    Prop.forAll(Gen.oneOf(text, utf8Text)) { t =>
      val got = graft.functions.TrigramCodes(Literal(t)).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      // the substring(text, i, 3) model over CODE POINTS
      val cps = t.codePoints().toArray
      val tris =
        if (cps.length < 3) Seq.empty[String]
        else cps.sliding(3).map(w => new String(w, 0, 3)).toSeq
      val decode = (code: Long) => new String(Array(
        (code >> 42).toInt, ((code >> 21) & 0x1FFFFF).toInt,
        (code & 0x1FFFFF).toInt), 0, 3)
      // instance-exact: each code decodes back to exactly its trigram
      // (injectivity), and numeric code order == string trigram order
      // (the downstream (cnt, tri) tie-break contract)
      got.size == tris.size &&
        got.map(decode) == tris &&
        got.sorted.map(decode) == tris.sorted
    }

  private val vec: Gen[Seq[Long]] = Gen.choose(0, 8)
    .flatMap(n => Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)))

  property("graft_dot equals the elementwise model, incl. truncation") =
    Prop.forAll(vec, vec) { (a, b) =>
      val lit = (v: Seq[Long]) => Literal.create(v, ArrayType(LongType))
      val got = DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Long]
      got == a.zip(b).map { case (x, y) => x * y }.sum
    }

  property("graft_token_counts equals the regex-alternation model per CODE POINT") =
    Prop.forAll(Gen.oneOf(text, utf8Text)) { t =>
      val row = graft.functions.TokenCounts(Literal(t)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val got = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      // independent model: Java regex over the same alternation — the
      // exact semantics the DuckDB oracle's RE2 shares
      def count(re: String) = {
        val m = java.util.regex.Pattern.compile(re).matcher(t)
        var c = 0
        while (m.find()) c += 1
        c
      }
      val alpha = count("[A-Za-z]+")
      val digit = count("[0-9]+")
      val other = count("[^A-Za-z0-9 ]")
      got == (alpha + digit + other, alpha, digit, other)
    }

  // RAW-BYTE generator: arbitrary bytes, heavily weighted toward the
  // malformed-UTF-8 space (orphan continuations, overlong leads C0/C1,
  // truncated 2/3/4-byte prefixes, surrogates ED A0.., F4 90.. beyond
  // U+10FFFF, F5-FF) interleaved with ASCII runs. Parquet string
  // columns are NOT validated by Spark, so these bytes are reachable.
  private val rawBytes: Gen[Array[Byte]] = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      5 -> Gen.choose(0x20, 0x7e),      // ASCII incl. alnum and space
      3 -> Gen.choose(0x80, 0xbf),      // continuation bytes
      2 -> Gen.choose(0xc0, 0xdf),      // 2-byte leads incl. overlong C0/C1
      2 -> Gen.choose(0xe0, 0xef),      // 3-byte leads incl. ED (surrogates)
      2 -> Gen.choose(0xf0, 0xff)))     // 4-byte leads incl. invalid F5-FF
      .map(_.map(_.toByte).toArray))

  property("graft_token_counts matches String replacement-decoding on MALFORMED bytes") =
    Prop.forAll(rawBytes) { bytes =>
      // the expression walks the raw UTF8String bytes; the regex path
      // (what Spark's regexp_* would do) decodes to java.lang.String
      // first, replacing each maximal ill-formed subpart with U+FFFD —
      // the byte walk must count identically
      val row = graft.functions.TokenCountsImpl.counts(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes))
      val got = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      val t = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      def count(re: String) = {
        val m = java.util.regex.Pattern.compile(re).matcher(t)
        var c = 0
        while (m.find()) c += 1
        c
      }
      val alpha = count("[A-Za-z]+")
      val digit = count("[0-9]+")
      val other = count("[^A-Za-z0-9 ]")
      got == (alpha + digit + other, alpha, digit, other)
    }

  property("graft_zorder mask ladder equals the naive per-bit interleave") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (x, y) =>
      // the model is the literal formula the DuckDB oracle evaluates:
      // Σ_i ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1) over the low 31 bits
      val model = (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
      graft.functions.ZOrderImpl.interleave(x, y) == model
    }

  private val dim31: Gen[Long] = Gen.chooseNum(0L, (1L << 31) - 1)

  property("graft_zorder prefixes are rectangles: equal 2j-bit z-prefix ⟺ equal j-bit x and y prefixes") =
    Prop.forAll(dim31, dim31, dim31, dim31, Gen.choose(0, 31)) { (x1, y1, x2, y2, j) =>
      // the property that makes Z-prefix cells PRUNABLE: a cell is
      // exactly an axis-aligned rectangle, so per-cell min/max bounds
      // both dimensions tightly
      val zEq = (graft.functions.ZOrderImpl.interleave(x1, y1) >>> (62 - 2 * j)) ==
        (graft.functions.ZOrderImpl.interleave(x2, y2) >>> (62 - 2 * j))
      val xyEq = (x1 >>> (31 - j)) == (x2 >>> (31 - j)) &&
        (y1 >>> (31 - j)) == (y2 >>> (31 - j))
      zEq == xyEq
    }

  property("bloom membership has NO false negatives over any inserted set") =
    Prop.forAll(Gen.listOf(Gen.oneOf(text, utf8Text))) { grams =>
      import graft.functions.BloomImpl
      val bits = new Array[Long](BloomImpl.Words)
      val u = grams.map(org.apache.spark.unsafe.types.UTF8String.fromString)
      u.foreach { g =>
        (0 until BloomImpl.NumHashes)
          .foreach(i => BloomImpl.setBit(bits, BloomImpl.position(i, g)))
      }
      u.forall(g => BloomImpl.contains(g, bits))
    }

  property("cell bloom (512 B) has NO false negatives and merge == sequential insert") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue)),
      Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))) { (ka, kb) =>
      import graft.functions.{BloomImpl, CellBloomAgg, CellBloomImpl}
      // positions: the SQL twin formula — 3-hex-char slices of
      // md5(CAST(key AS STRING)), the 12-bit analog of BloomImpl
      def positions(k: Long): Seq[Int] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(k.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        (0 until CellBloomImpl.NumHashes)
          .map(i => Integer.parseInt(hex.substring(3 * i, 3 * i + 3), 16))
      }
      // two map-task partials OR-merged must equal one sequential build
      val pa = ka.flatMap(positions).foldLeft(CellBloomAgg.zero)((b, p) =>
        CellBloomAgg.reduce(b, p.toLong))
      val pb = kb.flatMap(positions).foldLeft(CellBloomAgg.zero)((b, p) =>
        CellBloomAgg.reduce(b, p.toLong))
      val merged = CellBloomAgg.merge(pa.clone(), pb)
      val seq = (ka ++ kb).flatMap(positions).foldLeft(CellBloomAgg.zero)((b, p) =>
        CellBloomAgg.reduce(b, p.toLong))
      java.util.Arrays.equals(merged, seq) &&
        (ka ++ kb).forall(k => positions(k).forall(p => BloomImpl.testBit(seq, p)))
    }

  property("bloom positions equal the SQL md5-hex-substring formula") =
    Prop.forAll(Gen.oneOf(text, utf8Text), Gen.choose(0, 2)) { (g, i) =>
      // the cross-engine contract: position i is the integer value of
      // hex chars [6i+1, 6i+6] of md5(g) — the exact expression the
      // DuckDB oracle and the Spark-side bitmap build evaluate (one
      // digest sliced k ways, Kirsch-Mitzenmacher style)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val model = Integer.parseInt(hex.substring(6 * i, 6 * i + 6), 16)
      graft.functions.BloomImpl.position(i,
        org.apache.spark.unsafe.types.UTF8String.fromString(g)) == model
    }
}
