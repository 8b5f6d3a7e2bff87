package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The 100 TB co-location story, demonstrated: persist both fact
  * tables bucketed on the join key, and the orderkey join runs with
  * ZERO shuffle exchanges — the plan Spark picks when the layout
  * already matches the join's required distribution. At cluster scale
  * this is the difference between re-shuffling 100 TB per join and
  * reading co-located buckets.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join shuffle-free on the bucket key") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bdb.lineitem_b")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("bdb.orders_b")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("bdb.lineitem_b")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path so the exchange (or its absence) is
      // the thing under test, with the non-adaptive plan inspectable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val li = spark.table("bdb.lineitem_b")
      val o = spark.table("bdb.orders_b")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority")).count()

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // one exchange for the groupBy is fine; the JOIN itself must not
      // shuffle — no exchange may appear below the join node
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"), plan)
      assert(joined.collect().map(_.getLong(1)).sum ==
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
