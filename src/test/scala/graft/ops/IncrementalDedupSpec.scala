package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Semantics of the round-4 dedup additions:
  *  - dd_incremental_neardups must equal the FULL near-dup run
  *    restricted to pairs touching the delta batch (doc_id ≥ 80% of
  *    max) — i.e. the delta probe loses nothing and re-derives no
  *    old-vs-old pair;
  *  - dd_kept_corpus must keep exactly one doc (the cluster min) per
  *    dup cluster and every unclustered doc.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("incremental pairs = full pairs restricted to batch-touching pairs") {
    val thr = spark.read.parquet(s"$dir/documents.parquet")
      .agg(expr("(MAX(doc_id) * 4) div 5")).first().getLong(0)
    val full = SparkEntry.queries("dd_minhash_neardups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = SparkEntry.queries("dd_incremental_neardups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == full.filter { case (a, b) => a >= thr || b >= thr })
    // every incremental pair touches the batch — no old-vs-old leakage
    assert(incr.forall { case (a, b) => a >= thr || b >= thr })
  }

  test("kept corpus keeps exactly the cluster minima plus unclustered docs") {
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val kc = SparkEntry.queries("dd_kept_corpus")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kc.length == nDocs) // one verdict per corpus doc
    // kept=1 iff the doc is its own cluster id
    assert(kc.forall { case (doc, cid, kept) => (kept == 1L) == (doc == cid) })
    // each cluster keeps exactly one doc: its minimum
    kc.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3 == 1L) == 1)
      assert(members.filter(_._3 == 1L).head._1 == members.map(_._1).min)
      assert(cid == members.map(_._1).min)
    }
  }
}
