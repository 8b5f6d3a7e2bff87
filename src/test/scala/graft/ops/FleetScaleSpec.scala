package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The reference's own production use case is a 458-table fleet run
  * (BASELINE.md). These tests run the SAME fleet builders the
  * registered md_fleet_* queries use at 10,000 tables (~20× that) and
  * pin the two properties that make the shape survive another 100×:
  * correctness stays closed-form exact, and the PLAN stays flat — a
  * constant number of shuffles, the 6-row descriptor template moving
  * only by broadcast, no per-table jobs or driver materialization of
  * the fleet.
  *
  * Timing on this host (local[32], 10k tables ⇒ 120k descriptor rows):
  * fleet diff ~3.2 s, position moves ~1.2 s — vs 0.66 s / 0.27 s at
  * the registered 200 tables (BENCH sf0.1): 50× the fleet for ~5× the
  * wall clock, because the cost is a constant number of exchanges
  * either way and only the rows per exchange grow.
  */
class FleetScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val N = 10000

  /** Collect node classes across AQE boundaries. */
  private def nodes(plan: SparkPlan): Seq[SparkPlan] = {
    val self = plan match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case p => Seq(p)
    }
    self ++ plan.children.flatMap(nodes) ++
      plan.subqueries.flatMap(nodes)
  }

  private def shapeChecks(df: DataFrame, maxShuffles: Int): Unit = {
    val all = nodes(df.queryExecution.executedPlan)
    val shuffles = all.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= maxShuffles,
      s"fleet plan shuffles $shuffles times (max $maxShuffles) — not flat in fleet size")
    // the descriptor template must move by broadcast, never shuffle
    assert(all.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "template side lost its broadcast")
    // no windows over a single global partition (fleet-wide sort)
    all.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "unpartitioned fleet window")
    }
  }

  test(s"fleet diff at $N tables: closed-form exact, flat plan") {
    spark.range(10).count() // session/codegen warmup out of the timing
    val t0 = System.nanoTime()
    val rows = MetaOps.fleetDiffFrame(spark, N)
      .groupBy("change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"fleet diff over $N tables: $secs%.2f s")
    // the synthetic fleet's change pattern is analytic:
    //   type_changed: c1 widened on tid % 3 == 0
    //   dropped:      c3 removed on tid % 5 == 0
    //   added:        c6 added  on tid % 7 == 0
    def countOf(m: Int) = (0 until N).count(_ % m == 0).toLong
    assert(rows == Map(
      "type_changed" -> countOf(3),
      "dropped" -> countOf(5),
      "added" -> countOf(7)), rows)
    // sorted output: the full-outer join both sides + the orderBy
    shapeChecks(MetaOps.fleetDiffFrame(spark, N), maxShuffles = 4)
  }

  test(s"fleet position moves at $N tables: closed-form exact, flat plan") {
    val t0 = System.nanoTime()
    val moves = MetaOps.fleetPositionMovesFrame(spark, N)
      .groupBy("col_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"fleet position moves over $N tables: $secs%.2f s")
    // c5 AFTER c1 is an effective move on every even tid (successor of
    // c1 is c2 ≠ c5); c3 AFTER c2 is the no-op layout on tid % 3 == 0
    // (successor of c2 IS c3) and must be filtered everywhere
    assert(moves == Map("c5" -> (0 until N).count(_ % 2 == 0).toLong), moves)
    shapeChecks(MetaOps.fleetPositionMovesFrame(spark, N), maxShuffles = 4)
  }
}
