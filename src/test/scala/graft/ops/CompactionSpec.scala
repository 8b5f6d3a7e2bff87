package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Structural invariants of pipe_compaction_plan that the oracle
  * cannot falsify: the DuckDB twin computes the global row offset with
  * the SAME two-level (bucketed window + bucket offsets) construction,
  * so an error consistent across both engines — a wrong bucket
  * boundary, an off-by-one in the exclusive cumsum — would still be
  * oracle-EXACT. These asserts pin start_row to the independent
  * definition: the literal prefix sum of n_rows in z-order.
  */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("start_row is the exact z-order prefix sum; files partition the row space") {
    val rows = SparkEntry.queries("pipe_compaction_plan")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // output arrives ORDER BY start_row = z-order; offsets must chain
    // with zero gaps and zero overlaps
    var expected = 0L
    rows.foreach { case (_, depth, cell, n, start) =>
      assert(start == expected, s"cell ($depth,$cell) starts at $start, expected $expected")
      expected += n
    }
    // total planned rows = the whole table
    val total = spark.read
      .parquet(s"$dir/lineitem.parquet").count()
    assert(expected == total, s"planned $expected rows, table has $total")
    // file ids are the start-offset bins: non-decreasing, dense from 0
    val fids = rows.map(_._1)
    assert(fids.head == 0L)
    assert(fids.zip(fids.tail).forall { case (a, b) => b == a || b == a + 1 },
      "file ids must be dense and non-decreasing in z-order")
    // every file except possibly the last holds >= the 4096-row target
    // minus one straggler cell (start-based assignment can only
    // overflow, never underfill an interior file)
    val byFile = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    byFile.toSeq.sortBy(_._1).dropRight(1).foreach { case (f, n) =>
      assert(n >= 4096 - rows.map(_._4).max,
        s"interior file $f underfilled with $n rows")
    }
  }
}
