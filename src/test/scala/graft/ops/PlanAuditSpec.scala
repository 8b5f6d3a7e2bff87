package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkEntry, SparkTestSession}

/** Physical-plan invariants for every registered query — the scale
  * properties the 100 TB design depends on, asserted, not assumed.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("selective filters reach the parquet scan as PushedFilters") {
    val plan = SparkEntry.queries("q7_customers_without_pending")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]].*"), // non-empty list
      s"no filter was pushed:\n$plan")
  }

  test("native simhash eliminates the aggregation exchange") {
    def exchanges(name: String): Int = {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      "(?i)Exchange".r.findAllIn(plan).size
    }
    // the exploded variant shuffles token rows to aggregate bit votes;
    // the native expression leaves only the output sort's exchange
    assert(exchanges("dd_simhash_native") < exchanges("dd_simhash"))
  }

  test("the native expression stays inside WholeStageCodegen") {
    GraftExtensions.register(spark)
    val plan = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("graft_simhash16(text) AS sig")
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks an operator inside WholeStageCodegen
    // stage n — the expression must not force the Project out of it
    assert(plan.contains("*(1) Project [graft_simhash16"), plan)
  }
}
