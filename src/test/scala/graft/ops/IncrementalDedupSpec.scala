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

  test("index merge = full rebuild, is idempotent, and serves the probe side") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.select("doc_id", "band", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    // full from-scratch index (the oracle's view): a fresh derivation
    // through the registered full pipeline's band CTE twin
    val full = rows(SparkEntry.queries("dd_index_merge")(spark, dir))
    assert(full.nonEmpty)
    // every doc with >=3 words contributes exactly `bands` rows
    val perDoc = full.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perDoc.values.forall(_ == 4), "each indexed doc carries 4 band rows")

    // the merge PUBLISHED the artifact: a second run must serve the
    // identical index (idempotent maintenance), and the incremental
    // read side must produce the same pairs as before the merge
    val incrBefore = SparkEntry.queries("dd_incremental_neardups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = rows(SparkEntry.queries("dd_index_merge")(spark, dir))
    assert(again == full, "re-merge must be idempotent")
    val incrAfter = SparkEntry.queries("dd_incremental_neardups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incrAfter == incrBefore,
      "probing the published artifact changed the incremental pairs")
  }

  test("a mutated fixture invalidates the published index (content-keyed memo)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val work = Files.createTempDirectory("graft-idx-inval-")
    Files.copy(Paths.get(s"$dir/documents.parquet"),
      work.resolve("documents.parquet"))
    def merged(): Set[(Long, Int, String)] =
      SparkEntry.queries("dd_index_merge")(spark, work.toString)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val before = merged()
    // "regenerate" the fixture: drop the top-20% batch docs entirely
    val thr = spark.read.parquet(s"$dir/documents.parquet")
      .agg(expr("(MAX(doc_id) * 4) div 5")).first().getLong(0)
    val pruned = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < thr)
    val stage = work.resolve("stage").toString
    pruned.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), work.resolve("documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // the documented corpus-version contract (Dedup scaladoc): drop
    // plan-keyed DataFrame caches between fixture versions. The memo'd
    // index artifact (localCheckpoint) SURVIVES this — content-keying
    // is what must prevent it from being served stale below.
    spark.catalog.clearCache()
    val after = merged()
    // the published artifact was NOT served stale: the new index only
    // covers surviving docs
    assert(after.forall(_._1 < thr), "stale index rows served after regeneration")
    assert(after != before)
    assert(before.filter(_._1 < thr) == after,
      "post-regeneration index must equal the fresh build over surviving docs")
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
