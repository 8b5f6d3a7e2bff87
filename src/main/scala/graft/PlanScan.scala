package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: prints a physical-plan node histogram (joins, exchanges,
  * windows) for every registered query — the quick way to spot an
  * accidental CartesianProduct, a missed broadcast, or an unpartitioned
  * window across the whole surface. `sbt "runMain graft.PlanScan"`.
  * The hard invariants are asserted in PlanAuditSpec; this is the
  * exploratory view.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "WindowExec",
      "Exchange", "WindowGroupLimit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
        val counts = interesting.map(p => p -> p.r.findAllIn(plan).size)
          .filter(_._2 > 0).map { case (p, n) => s"$p:$n" }.mkString(" ")
        println(s"PLAN $name  $counts")
      } catch { case e: Throwable => println(s"PLAN $name  ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
