package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The custom TopKPerKey plan node: result equivalence with the
  * window formulation, plan shape, and shuffle-volume pruning.
  */
class TopKPerKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("TopK.perKey equals row_number().over(window) <= k") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .collect().map(_.toSeq).toSet
    val viaTopK = TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3, rankName = "rn")
      .collect().map(_.toSeq).toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("the plan contains the partial/final execs around one exchange") {
    val df = TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    // partial must sit BELOW the exchange (map-side pruning)
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx, plan)
  }

  test("keeps ties and short groups correct") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 5.0),
      ("b", 9L, 1.0)).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), k = 2)
      .select(col("k"), col("id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 9L, 1)))
  }
}
