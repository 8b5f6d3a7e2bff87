package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Structural invariants of the q28_scd2_merge history that must hold
  * on ANY snapshot — the properties a dimension consumer relies on,
  * checked beyond the fixture the oracle pins.
  */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val hist =
    SparkEntry.queries("q28_scd2_merge")(spark, "/root/testdata/sf0.001").cache()

  test("at most one CURRENT row per key, and deleted keys have none") {
    val maxCur = hist.filter(col("is_current") === 1)
      .groupBy(col("c_custkey")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxCur == 1L)
    val deletedWithCurrent = hist.filter(col("op") === "D")
      .select(col("c_custkey"))
      .join(hist.filter(col("is_current") === 1), Seq("c_custkey"))
      .count()
    assert(deletedWithCurrent == 0L)
  }

  test("updated keys carry exactly a closed v1 row and an open v2 row, +1000 apart") {
    val u = hist.filter(col("op") === "U")
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("end_v") === 2 && col("is_current") === 0, 1).otherwise(0)).as("closed"),
        sum(when(col("start_v") === 2 && col("end_v") === 0 && col("is_current") === 1, 1)
          .otherwise(0)).as("open"),
        (max(when(col("start_v") === 2, col("bal_cents")))
          - max(when(col("start_v") === 1, col("bal_cents")))).as("delta"))
    assert(u.filter(col("n") =!= 2 || col("closed") =!= 1 || col("open") =!= 1 ||
      col("delta") =!= 1000L).count() == 0L)
    assert(u.count() > 0L) // the fixture must actually exercise updates
  }

  test("history rows partition the key space: every v1 key appears, open rows cover non-deleted") {
    val v1Keys = graft.ops.Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"))
    val missing = v1Keys.join(hist.select(col("c_custkey")).distinct(),
      Seq("c_custkey"), "left_anti").count()
    assert(missing == 0L)
    // every non-deleted, non-inserted v1 key has exactly one open row
    val openPerKey = hist.filter(col("end_v") === 0)
      .groupBy(col("c_custkey")).count().filter(col("count") =!= 1).count()
    assert(openPerKey == 0L)
  }

  // ---- replay (q29): the invariants must hold at version 3, and the
  // append-only contract becomes falsifiable — merge 2 must not touch
  // any row merge 1 closed ----

  private lazy val hist3 =
    SparkEntry.queries("q29_scd2_replay")(spark, "/root/testdata/sf0.001").cache()

  test("replay: rows closed by merge 1 pass through merge 2 byte-identical") {
    val closedAt2 = hist.filter(col("end_v") === 2).collect().map(_.toString).sorted
    val closedAt2In3 = hist3.filter(col("end_v") === 2).collect().map(_.toString).sorted
    assert(closedAt2.nonEmpty)
    assert(closedAt2In3.toSeq == closedAt2.toSeq,
      "merge 2 rewrote history closed by merge 1")
  }

  test("replay: at most one CURRENT row per key; version-3 deletes have none") {
    val maxCur = hist3.filter(col("is_current") === 1)
      .groupBy(col("c_custkey")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxCur == 1L)
    val deleted3WithCurrent = hist3
      .filter(col("op") === "D" && col("end_v") === 3)
      .select(col("c_custkey"))
      .join(hist3.filter(col("is_current") === 1), Seq("c_custkey"))
      .count()
    assert(deleted3WithCurrent == 0L)
  }

  test("replay: version-3 updates carry a closed prior row and an open v3 row, +500 apart") {
    val u3 = hist3.filter(col("start_v") === 3 && col("op") === "U")
      .select(col("c_custkey"), col("bal_cents").as("new_bal"))
    assert(u3.count() > 0L) // the fixture must actually exercise round-2 updates
    val bad = u3
      .join(hist3.filter(col("end_v") === 3 && col("op") === "U")
        .select(col("c_custkey"), col("bal_cents").as("old_bal")), Seq("c_custkey"))
      .filter(col("new_bal") - col("old_bal") =!= 500L)
      .count()
    assert(bad == 0L)
    // every open v3 update row is genuinely current
    assert(hist3.filter(col("start_v") === 3 && col("op") === "U" &&
      (col("end_v") =!= 0 || col("is_current") =!= 1)).count() == 0L)
  }

  test("replay: open rows partition the still-live key space at version 3") {
    // exactly one open row per key that appears in history and whose
    // latest action is not a delete
    val openDup = hist3.filter(col("end_v") === 0)
      .groupBy(col("c_custkey")).count().filter(col("count") =!= 1).count()
    assert(openDup == 0L)
    // a key is open XOR its last row is a delete-closure
    val lastDeleted = hist3.filter(col("op") === "D")
      .select(col("c_custkey")).distinct()
    val open = hist3.filter(col("end_v") === 0).select(col("c_custkey")).distinct()
    assert(lastDeleted.join(open, Seq("c_custkey")).count() == 0L)
    val allKeys = hist3.select(col("c_custkey")).distinct().count()
    assert(open.count() + lastDeleted.count() == allKeys)
  }
}
