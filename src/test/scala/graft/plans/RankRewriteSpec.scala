package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The RewriteRankFilterToTopK optimizer rule: the idiomatic
  * row_number-filter pattern must be rewritten to the bounded-heap
  * plan with identical results.
  */
class RankRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def topkDf() = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  private def withRule[T](body: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteRankFilterToTopK
    spark.experimental.extraStrategies =
      (GraftStrategies +: spark.experimental.extraStrategies.filterNot(_ == GraftStrategies))
    try body
    finally spark.experimental.extraOptimizations = before
  }

  test("row_number<=k over a partitioned window is rewritten to TopKPerKey") {
    val vanillaPlan = topkDf().queryExecution.executedPlan.toString
    assert(vanillaPlan.contains("Window"), vanillaPlan)
    val (rewrittenPlan, rows) = withRule {
      val df = topkDf()
      (df.queryExecution.executedPlan.toString,
        df.orderBy("o_custkey", "rn").collect().toSeq)
    }
    assert(rewrittenPlan.contains("TopKPerKeyFinal"), rewrittenPlan)
    // the real window operator (prints as "Window [...") must be gone;
    // a leftover WindowGroupLimit would mean we sort-prune AND heap-prune
    assert(!rewrittenPlan.contains("Window"), rewrittenPlan)
    val expected = topkDf().orderBy("o_custkey", "rn").collect().toSeq
    assert(rows == expected)
    assert(rows.nonEmpty)
  }

  test("extra filter conjuncts survive above the rewritten node") {
    val (plan, rows) = withRule {
      val df = topkDf().filter(col("o_totalprice") > 1000)
      (df.queryExecution.executedPlan.toString, df.count())
    }
    assert(plan.contains("TopKPerKeyFinal"), plan)
    val expected = topkDf().filter(col("o_totalprice") > 1000).count()
    assert(rows == expected)
  }

  test("the rule leaves non-matching shapes alone") {
    withRule {
      // rank() (not row_number), and an unfiltered window: both keep WindowExec
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      val ranked = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), rank().over(w).as("r")).filter(col("r") <= 2)
      assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val unfiltered = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"),
          row_number().over(w.orderBy(col("o_orderkey"))).as("rn"))
      assert(!unfiltered.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }
}
