package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Semantic invariants of the trained-cluster operators (dd_semdedup,
  * ss_cluster_profile) that the row-level oracle can't express:
  * partition-function properties, cross-query consistency, and the
  * removal flag's internal logic.
  */
class ClusterOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val profile =
    SparkEntry.queries("ss_cluster_profile")(spark, dir).collect()
  private lazy val sem =
    SparkEntry.queries("dd_semdedup")(spark, dir).collect()

  test("cluster profile partitions the corpus: sizes sum to |embeddings|") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(profile.map(_.getAs[Long]("n_vecs")).sum == n)
    assert(profile.map(_.getAs[Long]("cell")).distinct.length == profile.length)
  }

  test("semdedup agrees with the profile's partition (same training chain)") {
    val byCell = sem.groupBy(_.getAs[Long]("cell")).view.mapValues(_.length).toMap
    profile.foreach { r =>
      assert(byCell.getOrElse(r.getAs[Long]("cell"), 0) ==
        r.getAs[Long]("n_vecs").toInt,
        s"cell ${r.getAs[Long]("cell")} sizes disagree between queries")
    }
  }

  test("removal flags are internally consistent") {
    // removed => it has at least one duplicate partner
    sem.filter(_.getAs[Int]("removed") == 1)
      .foreach(r => assert(r.getAs[Long]("n_dups") > 0, r.toString))
    // every duplicate component keeps at least one representative:
    // the min-id member of any dup pair is never removed solely by
    // that pair, so #removed < #docs-with-dups whenever dups exist
    val withDups = sem.count(_.getAs[Long]("n_dups") > 0)
    val removed = sem.count(_.getAs[Int]("removed") == 1)
    assert(removed <= withDups)
    if (withDups > 0) assert(removed < withDups, "a whole component was removed")
  }

  test("inertia is non-negative and zero only for singleton-degenerate cells") {
    profile.foreach { r =>
      val inertia = r.getAs[Long]("inertia")
      assert(inertia >= 0, s"negative inertia in cell ${r.getAs[Long]("cell")}")
      if (r.getAs[Long]("n_vecs") > 1) assert(inertia > 0)
    }
  }
}
