package graft

import org.scalatest.funsuite.AnyFunSuite

/** The orchestrator's grouping contract: every registered query lands
  * in exactly one of the eight known families, so the per-family
  * child JVMs collectively run the whole registry (a query whose name
  * grew a new prefix would otherwise silently form a 9th family —
  * that still benches correctly, but the known-families pin makes the
  * reviewer look at the new family's size before shipping it). */
class BenchSpec extends AnyFunSuite {

  test("familyOf: q-numerals collapse to q; prefixes otherwise") {
    assert(Bench.familyOf("q1_pricing_summary") == "q")
    assert(Bench.familyOf("q28_scd2_merge") == "q")
    assert(Bench.familyOf("tx_bm25_search") == "tx")
    assert(Bench.familyOf("ss_cells_assign") == "ss")
    assert(Bench.familyOf("pipe_llm_corpus") == "pipe")
    assert(Bench.familyOf("mm_phash_neardups") == "mm")
    assert(Bench.familyOf("md_fleet_diff") == "md")
    assert(Bench.familyOf("ev_dau_wau") == "ev")
    assert(Bench.familyOf("dd_containment") == "dd")
  }

  test("every registered query maps into the eight known families") {
    val known = Set("q", "tx", "ss", "ev", "dd", "md", "pipe", "mm")
    val got = SparkEntry.queries.keys.map(Bench.familyOf).toSet
    assert(got.subsetOf(known), s"unexpected families: ${got -- known}")
    // and the partition is total: group sizes sum to the registry size
    val bySize = SparkEntry.queries.keys.toSeq.groupBy(Bench.familyOf)
      .map { case (k, v) => k -> v.size }
    assert(bySize.values.sum == SparkEntry.queries.size)
  }
}
