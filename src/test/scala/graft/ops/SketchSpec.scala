package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Accuracy evidence for the sketch operators (which have no DuckDB
  * oracle — sketch internals are engine-specific, so the driver runs a
  * rows-only check): each approximation must sit within its configured
  * bound of the exact answer computed by the corresponding exact
  * operator shape.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("ev_approx_users: HLL within 3x the 2% rsd of exact distinct counts") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val approx = SparkEntry.queries("ev_approx_users")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(3, 0.06 * n),
        s"$k: approx=$a exact=$n")
    }
  }

  test("q21_approx_quantiles: within 1% rank error of the exact quantiles") {
    val rows = SparkEntry.queries("q21_approx_quantiles")(spark, dir).collect()
    rows.foreach { r =>
      val status = r.getString(0)
      val (p50, p90) = (r.getLong(1), r.getLong(2))
      val cents = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === status)
        .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
        .orderBy(col("c")).collect().map(_.getLong(0))
      def rankOf(v: Long): Double = {
        val below = cents.count(_ <= v).toDouble
        below / cents.length
      }
      assert(math.abs(rankOf(p50) - 0.5) <= 0.02, s"$status p50=$p50 rank=${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.02, s"$status p90=$p90 rank=${rankOf(p90)}")
    }
    assert(rows.nonEmpty)
  }
}
