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
    val (zt, bz, bnb, refined) = Pipeline.frozenParts(spark, dir)
    val base = Pipeline.frozenAssign(bz, bnb, refined)
      .select(col("depth"), col("cell"), col("k"))
    val delta = Pipeline.frozenAssign(zt.filter(col("k") >= col("t")), bnb, refined)
      .select(col("depth"), col("cell"), col("k"))
    val all = Pipeline.frozenAssign(zt, bnb, refined)
      .select(col("depth"), col("cell"), col("k"))
    (base, delta, all)
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
}
