package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Accuracy evidence for the sketch operators. Since round 4 both
  * registered sketch queries are DETERMINISTIC portable estimators
  * (md5-based HLL; md5 half-sample order statistics) and therefore
  * oracle-EXACT in the driver — this spec asserts they are also GOOD
  * estimators (within bounds of the exact answers), and cross-checks
  * the engine-native sketches (approx_count_distinct,
  * approx_percentile) against the same exact baselines so the native
  * sketch surface stays exercised.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("ev_approx_users: portable HLL and native HLL within bounds of exact") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val approx = SparkEntry.queries("ev_approx_users")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val events = spark.read.parquet(s"$dir/events.parquet")
    val exact = events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val native = events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      // m=64 registers: rsd = 1.04/sqrt(64) = 13%; allow 2 sigma
      assert(math.abs(approx(k) - n) <= math.max(3, 0.26 * n),
        s"$k: portable=${approx(k)} exact=$n")
      // native sketch at 2% rsd: allow 3 sigma
      assert(math.abs(native(k) - n) <= math.max(3, 0.06 * n),
        s"$k: native=${native(k)} exact=$n")
    }
  }

  test("ev_kmv_overlap: sketch union/intersection track the exact overlap") {
    val rows = SparkEntry.queries("ev_kmv_overlap")(spark, dir).collect()
    val types = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type")).distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, "one row per unordered type pair")
    val du = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (kUsed, nBoth) = (r.getInt(2), r.getLong(3))
      val (unionEst, interEst, jppm) = (r.getLong(4), r.getLong(5), r.getLong(6))
      // structural invariants of the estimator
      assert(a < b && kUsed <= 64 && nBoth <= kUsed)
      assert(interEst <= unionEst)
      assert(jppm == nBoth * 1000000L / math.max(kUsed, 1))
      // accuracy vs the exact sets: KMV at k=64 has rsd ≈ 1/√63 ≈ 12.6%
      // on the union (allow 3σ); the intersection adds the binomial
      // noise of n_both (sd ≈ √(k·J(1−J)) of k), so its absolute error
      // is bounded in UNION units — allow 3·√k/k ≈ 0.38·union.
      val exactU = (du(a) union du(b)).size.toLong
      val exactI = (du(a) intersect du(b)).size.toLong
      assert(math.abs(unionEst - exactU) <= math.max(3, 0.38 * exactU),
        s"$a×$b: union_est=$unionEst exact=$exactU")
      assert(math.abs(interEst - exactI) <= math.max(3, 0.38 * exactU),
        s"$a×$b: inter_est=$interEst exact=$exactI (union=$exactU)")
    }
  }

  test("ev_hll_pair_union: register-max union is exact sketch algebra; estimates track exact sets") {
    val rows = SparkEntry.queries("ev_hll_pair_union")(spark, dir).collect()
    val perType = SparkEntry.queries("ev_approx_users")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val du = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    val types = du.size
    assert(rows.length == types * (types - 1) / 2, "one row per unordered type pair")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (estA, estB, unionEst, interIE) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // the per-type estimates are literally ev_approx_users' rows —
      // ONE register definition, two queries
      assert(estA == perType(a) && estB == perType(b), s"$a×$b: per-type drift")
      assert(interIE == estA + estB - unionEst)
      // the union sketch of A∪B is exact ALGEBRA (max registers), so
      // its estimate obeys the same m=64 HLL bound as any single set
      // (2σ at rsd 13%); the intersection inherits the DIFFERENCE of
      // three estimates' errors — bounded in union units at 3σ, and
      // the reason ev_kmv_overlap exists for small-J pairs
      val exactU = (du(a) union du(b)).size.toLong
      val exactI = (du(a) intersect du(b)).size.toLong
      assert(math.abs(unionEst - exactU) <= math.max(3, 0.26 * exactU),
        s"$a×$b: union_est=$unionEst exact=$exactU")
      assert(math.abs(interIE - exactI) <= math.max(5, 0.39 * exactU),
        s"$a×$b: inter_incl_excl=$interIE exact=$exactI (union=$exactU)")
      // union estimate is monotone: at least each side's register sums
      assert(unionEst >= math.max(estA, estB) - 1,
        s"$a×$b: union below a member estimate")
    }
  }

  test("ev_count_min_sketch: est >= true always; collisions pinned from first principles") {
    // Fixture sweep: the CMS overestimate invariant must hold on every
    // emitted row (a single violation means the hash rows or the min
    // disagree between grid build and probe).
    val rows = SparkEntry.queries("ev_count_min_sketch")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (tr, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= tr && over == est - tr, r.toString)
    }
    // ranking is by estimate, descending, user_id-tiebroken
    val ests = rows.map(r => (-r.getLong(2), r.getLong(0)))
    assert(ests.sameElements(ests.sorted), "top-20 order drift")

    // First-principles pin on a constructed fixture: exact expected
    // estimates INCLUDING collision mass, computed here from md5
    // directly — users 1..8 with counts 1..8 (event ids unique).
    val tmp = java.nio.file.Files.createTempDirectory("graft-cms-").toString
    val evs = for (u <- 1 to 8; i <- 1 to u) yield (u * 100 + i, u)
    spark.createDataFrame(evs.map { case (eid, u) =>
      (eid.toLong, new java.sql.Timestamp(1700000000000L + eid * 1000L),
        u.toLong, "view", 1.0, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(u: Int, j: Int): Int = {
      val hx = md5hex(u.toString)
      val hex = "0123456789abcdef"
      (hex.indexOf(hx(2 * j)) * 16) + hex.indexOf(hx(2 * j + 1))
    }
    val expected = (1 to 8).map { u =>
      val est = (0 until 4).map { j =>
        (1 to 8).filter(v => bucket(v, j) == bucket(u, j)).map(_.toLong).sum
      }.min
      u.toLong -> ((u.toLong, est))
    }.toMap
    val got = SparkEntry.queries("ev_count_min_sketch")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q21_approx_quantiles: sample quantiles and native sketch within rank bounds") {
    val rows = SparkEntry.queries("q21_approx_quantiles")(spark, dir).collect()
    rows.foreach { r =>
      val status = r.getString(0)
      val (p50, p90) = (r.getLong(1), r.getLong(2))
      val cents = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === status)
        .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
        .orderBy(col("c")).collect().map(_.getLong(0))
      def rankOf(v: Long): Double = cents.count(_ <= v).toDouble / cents.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.02, s"$status p50=$p50 rank=${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.02, s"$status p90=$p90 rank=${rankOf(p90)}")
      // the engine-native quantile digest agrees with the same baseline
      val nat = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === status)
        .selectExpr("approx_percentile(CAST(round(o_totalprice * 100) AS BIGINT)," +
          " array(0.5D, 0.9D), 10000) AS pq")
        .collect().head.getSeq[Long](0)
      assert(math.abs(rankOf(nat(0)) - 0.5) <= 0.02, s"$status native p50")
      assert(math.abs(rankOf(nat(1)) - 0.9) <= 0.02, s"$status native p90")
    }
    assert(rows.nonEmpty)
  }
  test("pipe_ndv_sketches: cell-register merge equals a from-scratch JVM replay") {
    // the oracle computes the merged row with the same two-level
    // register structure as Spark, so a merge bug consistent across
    // both engines would still be oracle-EXACT; this replays the
    // estimator INDEPENDENTLY (plain JVM md5 over the raw key column,
    // no cells) and pins the merged sketch to it — merge-equals-rescan
    // is the associativity contract.
    val out = SparkEntry.queries("pipe_ndv_sketches")(spark, dir).collect()
    val merged = out.find(_.getInt(0) == -1).get
    val ks = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_orderkey").cast("long"))
      .collect().map(_.getLong(0))
    val regs = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    ks.foreach { k =>
      val hx = md.digest(k.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val bucket = (java.lang.Long.parseLong(hx.substring(0, 8), 16) % 64).toInt
      val w = java.lang.Long.parseLong(hx.substring(8, 16), 16)
      val rho = if (w == 0) 33 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sp = regs.filter(_ > 0).map(r => 1L << (33 - r)).sum
    val np = regs.count(_ > 0)
    val est = (709L * 64 * 64 * 8589934592L) / (1000L * (sp + (64 - np) * 8589934592L))
    assert(merged.getLong(4) == est,
      s"merged sketch ${merged.getLong(4)} != independent replay $est")
    // and the merged row's exact NDV really is the distinct key count
    assert(merged.getLong(3) == ks.distinct.length.toLong)
  }
}
