package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unit coverage for the native expressions registered by
  * [[graft.GraftExtensions]] (their end-to-end behavior is also pinned
  * by the dd_* oracle queries; this spec pins the edge cases).
  */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def shingleSet(text: String, n: Int): Seq[String] = {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(text).toDF("text")
      .selectExpr(s"graft_shingle_array(text, $n) AS shs")
      .as[Seq[String]].head()
  }

  test("graft_shingle_array returns distinct shingles in first-occurrence order") {
    assert(shingleSet("a b c a b c a b", 3) ==
      Seq("a b c", "b c a", "c a b"))
  }

  test("graft_shingle_array of a too-short doc is empty") {
    assert(shingleSet("a b", 3).isEmpty)
    assert(shingleSet("", 3).isEmpty)
  }

  test("graft_shingle_array equals the distinct set streamed by graft_shingles") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "to be or not to be that is the question to be"),
      (3L, "one two")).toDF("doc_id", "text")
    val viaArray = docs
      .selectExpr("doc_id", "explode(graft_shingle_array(text, 3)) AS sh")
      .as[(Long, String)].collect().toSet
    val viaGenerator = docs
      .selectExpr("doc_id", "graft_shingles(text, 3) AS sh")
      .distinct().as[(Long, String)].collect().toSet
    assert(viaArray == viaGenerator)
    assert(viaArray.nonEmpty)
  }

  test("graft_dot: exact integer dot product, null array yields null") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val got = spark.sql(
      """SELECT graft_dot(array(1L, -2L, 3L), array(4L, 5L, 6L)) AS d,
        |       graft_dot(array(1L), array(2L, 99L)) AS truncated,
        |       graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n""".stripMargin)
      .as[(Long, Long, Option[Long])].head()
    assert(got == ((4 - 10 + 18, 2, None)))
  }

  test("graft_dot matches the lambda formulation on random-ish arrays") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = spark.range(50).selectExpr(
      "transform(sequence(0, 63), i -> CAST(hash(id, i) % 100000 AS BIGINT)) AS a",
      "transform(sequence(0, 63), i -> CAST(hash(i, id) % 100000 AS BIGINT)) AS b")
    val diffs = df.selectExpr(
      """graft_dot(a, b) -
        |aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT),
        |          (acc, v) -> acc + v) AS diff""".stripMargin)
      .as[Long].collect()
    assert(diffs.forall(_ == 0L))
  }

  test("graft_token_counts equals the four-regex formulation, multibyte included") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val texts = Seq(
      "hello world 123 foo42bar",
      "a1b2c3",
      "  double  spaces  and... punct!?",
      "UPPER lower MiXeD 000 9",
      "",
      "   ",
      "tab\there\nnewline",
      "café naïve über",                // 2-byte sequences
      "日本語テスト abc 12",   // CJK (3-byte)
      "emoji 😀🎉 end",            // 4-byte code points
      "é combining å ring",                // combining marks
      "mixed日a1😀b2")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.selectExpr("id", "graft_token_counts(text) AS tc")
      .selectExpr("id", "tc.n_subtokens", "tc.n_alpha_runs", "tc.n_digit_runs", "tc.n_other")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val regex = df.selectExpr("id",
        "CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS INT) AS s",
        "CAST(size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS INT) AS a",
        "CAST(size(regexp_extract_all(text, '[0-9]+', 0)) AS INT) AS d",
        "CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS INT) AS o")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    texts.indices.foreach { i =>
      assert(native(i.toLong) == regex(i.toLong),
        s"'${texts(i)}': native=${native(i.toLong)} regex=${regex(i.toLong)}")
    }
    // null text propagates
    val n = Seq((0L, Option.empty[String])).toDF("id", "text")
      .selectExpr("graft_token_counts(text)").collect().head
    assert(n.isNullAt(0))
  }

  test("graft_zorder through SQL (codegen path) matches the kernel, nulls propagate") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 3L),
      ((1L << 31) - 1, (1L << 31) - 1), (123456789L, 987654321L))
    val got = rows.toDF("x", "y").selectExpr("graft_zorder(x, y)")
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) =>
      graft.functions.ZOrderImpl.interleave(x, y) })
    // bit placement: x bit i → 2i (even), y bit i → 2i+1 (odd)
    assert(graft.functions.ZOrderImpl.interleave(1L, 0L) == 1L)
    assert(graft.functions.ZOrderImpl.interleave(0L, 1L) == 2L)
    assert(graft.functions.ZOrderImpl.interleave((1L << 31) - 1, (1L << 31) - 1)
      == (1L << 62) - 1)
    val nulls = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .selectExpr("graft_zorder(x, y)").collect()
    assert(nulls.head.isNullAt(0))
  }

  test("bloom probe expression through codegen agrees with interpreted eval") {
    import org.apache.spark.sql.GraftShim
    import graft.functions.{BloomImpl, BloomMightContain}
    import spark.implicits._
    val inserted = Seq("alpha bravo", "charlie delta", "écho ζeta")
    val bits = new Array[Long](BloomImpl.Words)
    inserted.foreach { g =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(g)
      (0 until BloomImpl.NumHashes)
        .foreach(i => BloomImpl.setBit(bits, BloomImpl.position(i, u)))
    }
    val probeGrams = inserted ++ Seq("not inserted", "also absent")
    val got = probeGrams.toDF("g")
      .withColumn("hit", GraftShim.column(
        BloomMightContain(GraftShim.expression(col("g")), bits)))
      .as[(String, Boolean)].collect().toMap
    inserted.foreach(g => assert(got(g), s"false negative on '$g'"))
    // absent strings are ALLOWED to false-positive in principle, but at
    // 3 set grams in 2^24 bits the probability is ~1e-20 — a hit here
    // means the probe is reading the wrong bits
    assert(!got("not inserted") && !got("also absent"))
  }

  test("graft_shingle_array propagates null text as null") {
    graft.GraftExtensions.register(spark)
    val row = spark.sql("SELECT graft_shingle_array(CAST(NULL AS STRING), 3) AS shs")
      .collect().head
    assert(row.isNullAt(0))
  }
}
