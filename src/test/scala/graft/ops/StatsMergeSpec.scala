package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** pipe_stats_merge's oracle proves merge ≡ rebuild at the OUTPUT
  * level (bits_set counts, NDV estimates). These pins are stronger:
  * the merged ARTIFACTS themselves — the 64-word bitmaps and the
  * 64-register tables — must equal a one-pass rebuild word for word /
  * register for register, because a planner ships the artifact, not
  * the count, and two different bitmaps can share a popcount. */
class StatsMergeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sides() = {
    val (bz, dz, geom) = Pipeline.frozenParts(spark, dir)
    val base = Pipeline.frozenAssign(bz, geom)
      .select(col("depth"), col("cell"), col("k"))
    val delta = Pipeline.frozenAssign(dz, geom)
      .select(col("depth"), col("cell"), col("k"))
    val all = Pipeline.frozenAssign(bz.unionAll(dz), geom)
      .select(col("depth"), col("cell"), col("k"))
    (base, delta, all)
  }

  test("frozenFin2's is_delta slices equal the per-side frozenParts assignments") {
    // r15 rewired the merge family onto ONE scan with the side split
    // as a column; this pins the slices row-for-row against the r14
    // two-subtree form the other tests (and the oracle) reason about.
    val (bz, dz, geom) = Pipeline.frozenParts(spark, dir)
    val fin2 = Pipeline.frozenFin2(spark, dir)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select(col("depth"), col("cell"), col("x"), col("y"), col("k"))
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
    assert(rowsOf(fin2.filter(col("is_delta") === 0)) ==
      rowsOf(Pipeline.frozenAssign(bz, geom)))
    assert(rowsOf(fin2.filter(col("is_delta") === 1)) ==
      rowsOf(Pipeline.frozenAssign(dz, geom)))
    assert(fin2.filter(col("is_delta") === 1).count() > 0) // non-vacuous
  }

  test("OR-merged per-side bitmaps equal the one-pass rebuild, word for word") {
    val (base, delta, all) = sides()
    def bitsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Seq[Long]] =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2).toSeq).toMap
    val merged = bitsOf(
      Pipeline.orMergeBits(Pipeline.cellBlooms(base), Pipeline.cellBlooms(delta)))
    val rebuilt = bitsOf(Pipeline.cellBlooms(all))
    assert(merged.keySet == rebuilt.keySet)
    merged.foreach { case (cellKey, bits) =>
      assert(bits == rebuilt(cellKey), s"bitmap drift at $cellKey")
    }
    // the merge genuinely had two non-trivial sides (not vacuous)
    assert(Pipeline.cellBlooms(delta).count() > 0)
  }

  test("max-merged register tables equal the one-pass rebuild") {
    val (base, delta, all) = sides()
    def regsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Long, Long), Int] =
      df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap
    val merged = regsOf(
      Pipeline.cellRegs(base).unionAll(Pipeline.cellRegs(delta))
        .groupBy(col("depth"), col("cell"), col("bucket"))
        .agg(max(col("mrho")).cast("int").as("mrho")))
    val rebuilt = regsOf(Pipeline.cellRegs(all)
      .select(col("depth"), col("cell"), col("bucket"), col("mrho").cast("int")))
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("word-grain bitmap state is the folded array, word for word") {
    // r15 moved the query paths (bits_set, probes) onto
    // cellBloomWords' (depth, cell, word, w) grain; this pins that
    // grain against the 64-long array form the oracle's
    // distinct-slice replay reasons about: w == bits[word] for every
    // present word, and every absent word's array slot is 0L.
    val (_, _, all) = sides()
    val arrays = Pipeline.cellBlooms(all).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val words = Pipeline.cellBloomWords(all).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getInt(2), r.getLong(3)))
    assert(words.nonEmpty)
    words.foreach { case (cellKey, word, w) =>
      assert(arrays(cellKey)(word) == w, s"word drift at $cellKey[$word]")
    }
    val present = words.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    arrays.foreach { case (cellKey, bits) =>
      bits.zipWithIndex.foreach { case (w, i) =>
        if (!present(cellKey).contains(i))
          assert(w == 0L, s"absent word non-zero at $cellKey[$i]")
      }
    }
  }

  test("KMV merge dedups a value on BOTH sides; table sketch = brute bottom-k") {
    // The one step a naive KMV merge gets wrong: a distinct value seen
    // by base AND delta contributes its hash twice to the unioned
    // artifacts; without hash-dedup before re-ranking it occupies two
    // ranks and displaces a genuine k-th smallest. x = 1 lives on both
    // sides of the l_orderkey threshold ((max k 12)*4 div 5 = 9) in
    // the same (x, y) cell — its cell sketch must hold exactly ONE
    // row. And the depth = -1 table row must equal the bottom-8 over
    // all 9 distinct x computed here from first principles.
    import spark.implicits._
    val rows = // (l_partkey = x, l_suppkey = y, l_orderkey = k)
      (1 to 6).map(i => (i.toLong, 1L, i.toLong)) ++ // base: k = 1..6 < 9
        Seq((1L, 1L, 9L), (7L, 1L, 10L), (8L, 1L, 11L), (9L, 1L, 12L)) // delta
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    rows.toDF("l_partkey", "l_suppkey", "l_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = graft.SparkEntry.queries("pipe_bottomk_merge")(spark, tmp).collect()
    val dup = out.filter(r =>
      r.getInt(r.fieldIndex("depth")) >= 0 &&
        r.getLong(r.fieldIndex("x_val")) == 1L)
    assert(dup.length == 1, s"x=1 must hold one sketch row, got ${dup.length}")
    assert(dup.head.getInt(dup.head.fieldIndex("rk")) == 1)
    assert(dup.head.getLong(dup.head.fieldIndex("k_used")) == 1L)
    assert(dup.head.getLong(dup.head.fieldIndex("ndv_est")) == 1L) // < k => exact
    // table row: bottom-8 of the 9 distinct md5("1").."9" hashes
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (1 to 9).map(i => md5hex(i.toString)).sorted.take(8)
    val tot = out.filter(_.getInt(0) == -1).sortBy(_.getInt(2))
    assert(tot.map(_.getString(tot.head.fieldIndex("h"))).toSeq == expected)
    assert(tot.forall(_.getLong(tot.head.fieldIndex("k_used")) == 8L))
    val expEst = 7L * 4294967296L /
      java.lang.Long.parseLong(expected.last.substring(0, 8), 16)
    assert(tot.head.getLong(tot.head.fieldIndex("ndv_est")) == expEst)
  }
}
