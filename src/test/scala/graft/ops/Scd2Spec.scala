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
}
