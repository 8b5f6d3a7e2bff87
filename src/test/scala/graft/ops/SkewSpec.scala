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

  /** Largest per-partition row count of `df` under its own output
    * partitioning, with the total — the straggler measurement. */
  private def maxPartitionRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val counts = df.rdd
      .mapPartitionsWithIndex((_, it) => Iterator(it.length.toLong))
      .collect()
    (counts.max, counts.sum)
  }

  test("adversarial events fixture: one hot user, salting bounds the max reducer") {
    import spark.implicits._
    // derive a hot-user events fixture from the REAL one: every 10th
    // event re-keyed to user 1 (~10% of the stream on one key — the
    // whale-account shape)
    val raw = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"),
        when(col("event_id") % 10 === 0, lit(1L)).otherwise(col("user_id"))
          .as("user_id"))
    val users = raw.select(col("user_id").as("uid")).distinct()
      .withColumn("segment", concat(lit("s"), pmod(col("uid"), lit(5))))

    // plain equi-join: the hot user's ~10% of rows land on ONE reducer
    val plain = raw.join(users, raw("user_id") === users("uid"))
      .repartition(32, col("user_id")) // pin the shuffle the join implies
    val (plainMax, total) = maxPartitionRows(plain)
    info(f"plain join: max reducer ${plainMax} of $total rows " +
      f"(${100.0 * plainMax / total}%.1f%%)")
    assert(plainMax.toDouble / total > 0.08, "fixture lost its hot user")

    // salted 32 ways: the same join spreads the whale across reducers
    val salted = Skew.saltedEquiJoin(raw, users, "user_id", "uid", "event_id", n = 32)
    val (saltMax, saltTotal) = maxPartitionRows(
      salted.repartition(32, col("user_id"), pmod(hash(col("event_id")), lit(32))))
    assert(saltTotal == total) // same join result volume
    info(f"salted join: max reducer ${saltMax} of $saltTotal rows " +
      f"(${100.0 * saltMax / saltTotal}%.1f%%)")
    assert(saltMax.toDouble / saltTotal < 0.06,
      s"salting failed to spread the hot user: $saltMax/$saltTotal")
  }

  test("adversarial embeddings fixture: identical-vector block is capped out of the pair join") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // derive from the REAL embeddings: the top-20% of vec_ids become
    // ONE identical vector (the all-zero/padding-embedding shape that
    // collides into a single LSH bucket in EVERY band)
    val base = Similarity.varr(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("qe"))
    val n = base.count()
    val blockStart = (n * 80 / 100).toInt
    val block = lit((0 until 64).map(d => (d * 7 + 3).toLong).toArray)
    val v = base.select(col("vec_id"),
        when(col("vec_id") >= blockStart, block).otherwise(col("qe")).as("qe"))
      .withColumn("n2", expr("graft_dot(qe, qe)"))
      .cache()

    // cap sized to the healthy occupancy (~n/16 per band-bucket at 2x4
    // planes) so the identical block's bucket is the one over it
    val g = SignLshGeometry(bands = 2, planesPerBand = 4, dims = 64,
      maxBucketSize = 60)
    // unguarded, the block alone contributes ~block²/2 pairs per band,
    // all on the one reducer owning its (band, bucket) key
    val blockSize = n - blockStart
    val uncapped = SignLshGeometry(g.bands, g.planesPerBand, g.dims,
      maxBucketSize = Long.MaxValue)
    val pairsUnguarded = Similarity.lshCandidates(v, uncapped).count()
    val pairsCapped = Similarity.lshCandidates(v, g).count()
    val blockPairs = blockSize * (blockSize - 1) / 2
    info(s"block=$blockSize vectors; unguarded candidates=$pairsUnguarded " +
      s"(>=$blockPairs from the block alone); capped candidates=$pairsCapped")
    assert(pairsUnguarded >= blockPairs, "fixture lost its degenerate block")
    // the cap removed the quadratic block without nuking the rest
    assert(pairsCapped < pairsUnguarded - blockPairs + blockSize,
      s"cap failed: $pairsCapped of $pairsUnguarded")
    assert(pairsCapped > 0, "cap dropped every candidate")

    // and no (band, bucket) group bigger than the cap survives in the
    // index the join reads
    val maxGroup = Similarity.keptBuckets(v, g)
      .groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    info(s"max surviving bucket size=$maxGroup (cap ${g.maxBucketSize})")
    assert(maxGroup <= g.maxBucketSize)
    v.unpersist()
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
