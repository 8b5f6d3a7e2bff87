package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted join ≡ plain join, with the skewed key's rows actually
  * spread across salt partitions.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("saltedEquiJoin matches the plain join on a skewed key") {
    import spark.implicits._
    // 90% of fact rows hit one key — the straggler shape
    val fact = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id") % 7))
          .as("k"))
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .toDF("dk").withColumn("payload", length(col("dk")))

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk", "id", n = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)

    // the hot key really is spread over the salt space
    val spread = fact.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .filter(col("k") === "hot")
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(spread == 8)
  }

  test("dropOversizeGroups keeps an LSH-style candidate self-join balanced under a hot bucket") {
    import spark.implicits._
    // 200 healthy buckets of 20 members + ONE degenerate bucket of
    // 1200 (the boilerplate-text / zero-vector shape): unguarded, its
    // ~720k intra-bucket pairs all land on the single reducer that
    // owns that (band, bucket) key
    val healthy = spark.range(4000)
      .select(col("id"), lit(0).as("band"), (col("id") % 200).cast("long").as("bucket"))
    val hot = spark.range(4000, 5200)
      .select(col("id"), lit(0).as("band"), lit(999L).as("bucket"))
    val buckets = healthy.union(hot)

    def perPartitionPairCounts(bk: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val a = bk.select(col("id").as("ida"), col("band"), col("bucket"))
      val b = bk.select(col("id").as("idb"), col("band"), col("bucket"))
      a.join(b, Seq("band", "bucket")).filter(col("ida") < col("idb"))
        .rdd.mapPartitionsWithIndex((_, it) => Iterator(it.length.toLong))
        .collect().toSeq.filter(_ > 0)
    }
    def imbalance(counts: Seq[Long]): Double = {
      val sorted = counts.sorted
      sorted.last.toDouble / sorted(sorted.size / 2).toDouble
    }

    // the problem is real: unguarded, the hot bucket's partition is a
    // straggler holding >4x the median pair volume
    assert(imbalance(perPartitionPairCounts(buckets)) > 4.0)
    // guarded: the oversize bucket is dropped, the join stays balanced
    val guarded = Skew.dropOversizeGroups(buckets, Seq("band", "bucket"), maxSize = 100)
    val counts = perPartitionPairCounts(guarded)
    assert(imbalance(counts) <= 4.0, s"straggler survived: $counts")
    // and only the degenerate bucket was sacrificed
    assert(guarded.count() == 4000)
  }

  test("neardupPairs runs under a non-default LSH geometry and only emits verified pairs") {
    val pairs = Dedup.neardupPairs(spark, "/root/testdata/sf0.001",
        LshGeometry(bands = 2, rowsPerBand = 4, maxBucketSize = 500))
      .collect()
    // every emitted pair passed the exact-Jaccard >= 0.5 verification,
    // whatever the candidate geometry was
    pairs.foreach { r =>
      assert(r.getLong(2) * 2 >= r.getLong(3), r)
    }
  }

  test("lshCandidates runs under a non-default sign-LSH geometry") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe")
    val cand = Similarity.lshCandidates(v,
      SignLshGeometry(bands = 4, planesPerBand = 2, dims = 64, maxBucketSize = 500))
    val rows = cand.collect()
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // 4 bands of 2 planes = coarser buckets than the 2x4 default =>
    // at least as many candidates as any single 2-plane band yields
    assert(rows.nonEmpty)
  }

  test("outer salted join preserves unmatched fact rows") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "zzz")).toDF("id", "k")
    val dim = Seq(("a", 10), ("b", 20)).toDF("dk", "v")
    val rows = Skew.saltedEquiJoin(fact, dim, "k", "dk", "id", n = 4, "left_outer")
      .select(col("k"), col("v")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
    assert(rows == Set(("a", 10), ("b", 20), ("zzz", -1)))
  }
}
