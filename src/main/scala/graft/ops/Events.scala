package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import Tables._
import QuerySpec.sql

/** Event-stream analytics over the `events` table — the batch
  * expressions of the streaming shapes (tumbling windows,
  * sessionization, funnels, retention). The same logic runs
  * incrementally in [[graft.streaming]]; here it is expressed over the
  * bounded parquet fixture so the DuckDB oracle can check it.
  *
  * Scale design: every query is a hash-partitioned aggregation or a
  * window partitioned by `user_id` — no global windows, no collects.
  * At 100 TB the sessionization shuffle is one exchange on user_id
  * (150 M users ≫ 32 partitions ⇒ even spread; a power-user skew would
  * be handled by AQE skew-join settings, not code changes).
  *
  * Cross-engine determinism:
  *  - the fixture's `ts` physical encoding is NOT ours to choose, and it
  *    has changed across driver generations (parquet NANOS originally;
  *    micros TIMESTAMP_NTZ since round 4's regeneration). The loader
  *    therefore dispatches on the column's RESOLVED Spark type instead
  *    of assuming an encoding (see [[tsecOf]]): BIGINT ⇒ nanos
  *    (`ts div 1e9`, the `spark.sql.legacy.parquet.nanosAsLong` path);
  *    TIMESTAMP/TIMESTAMP_NTZ ⇒ `unix_seconds` under the UTC session.
  *    DuckDB reads either encoding as a timestamp and the oracle uses
  *    `floor(epoch(ts))`. Every query works at SECOND granularity, and
  *    both paths floor — truncating twice equals truncating once.
  *  - `value` doubles are not exact 2-decimal; both engines quantize
  *    with the identical expression `CAST(round(value*100) AS BIGINT)`
  *    (same double bits in, same cents out).
  *  - window orderings tie-break on `event_id`.
  */
object Events {

  /** events as read from the fixture; `ts` resolves to BIGINT nanos
    * (legacy-flag path, old fixtures) or TIMESTAMP_NTZ micros (current
    * fixtures) — callers must go through [[tsecOf]] rather than touch
    * `ts` directly (see scaladoc).
    *
    * The legacy flag is scoped set-construct-restore: schema inference
    * (the step Spark 4 refuses without the flag) happens eagerly at
    * DataFrame construction, so the session conf is back to its prior
    * value before this returns — a later unrelated query in the same
    * session that reads a nanos-timestamp parquet sees Spark's default
    * behavior, not a leaked BIGINT coercion. Execution of the returned
    * frame is unaffected: the resolved schema is already pinned in the
    * plan (ContractSpec exercises collect-after-restore).
    */
  /** Serializes the set-construct-restore window: two threads
    * building events frames concurrently could otherwise interleave
    * one thread's restore inside the other's construct and fail the
    * nanos-fixture schema inference (ConcurrencySpec drives builders
    * in parallel; construction is cheap, so the lock is uncontended
    * in practice). */
  private val loaderLock = new Object

  private[ops] def events(s: SparkSession, dir: String): DataFrame =
    loaderLock.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try t(s, dir, "events")
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }

  /** `ts` → epoch seconds, dispatching on the fixture's declared type
    * rather than a hard-coded physical encoding (the round-4 lesson:
    * the driver regenerated events.parquet from nanos to micros
    * underneath us). Both arms floor to the second, matching the
    * oracle's `floor(epoch(ts))`.
    */
  private[graft] def tsecOf(e: DataFrame): Column = e.schema("ts").dataType match {
    case LongType => expr("ts div 1000000000") // nanos-as-BIGINT fixture
    case TimestampType | TimestampNTZType =>
      // micros fixture. NTZ→TZ cast is only a wall-clock identity when
      // the session is pinned to UTC; enforce the invariant instead of
      // assuming it, so a future non-pinned entry point fails loudly
      // rather than shifting every ev_* result by the local offset.
      val tz = e.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events.ts is TIMESTAMP and spark.sql.session.timeZone=$tz; " +
          "ev_* semantics require UTC (set it in the entry point)")
      expr("unix_seconds(CAST(ts AS TIMESTAMP))")
    case other => throw new IllegalArgumentException(
      s"unsupported events.ts encoding: $other (expected BIGINT nanos or TIMESTAMP micros)")
  }

  /** second-truncated `ts` as a proper TimestampType column (streaming
    * twins window on this; same dispatch as [[tsecOf]]). */
  private[graft] def tsTimestampOf(e: DataFrame): Column = to_timestamp(tsecOf(e))

  /** epoch seconds + integer cents, the engine-portable core columns. */
  private def base(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.select(
      col("event_id"), col("user_id"), col("event_type"), col("props"),
      tsecOf(e).as("tsec"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
  }

  private val baseSql =
    """SELECT event_id, user_id, event_type, props,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
      |       CAST(round(value * 100) AS BIGINT) AS cents
      |FROM events""".stripMargin

  /** KMV size for the pairwise-overlap sketch (see ev_kmv_overlap):
    * intersection estimates need a deeper sample than per-key NDV —
    * relative error ~1/√(J·k), so k = 8 (Pipeline.KmvK) would
    * quantize Jaccard to eighths. */
  private[graft] val KmvOverlapK = 64

  val specs: Seq[QuerySpec] = Seq(

    // ---- tumbling 1-hour window per event_type: the canonical
    // streaming rollup (count / quantized sum / distinct users) ----
    sql("ev_hourly_rollup",
      s"""WITH e AS ($baseSql)
         |SELECT tsec // 3600 AS epoch_hour, event_type,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      base(s, dir)
        .groupBy(expr("tsec div 3600").as("epoch_hour"), col("event_type"))
        .agg(lsum(lit(1)).as("n_events"),
          lsum(col("cents")).as("total_cents"),
          countDistinct(col("user_id")).cast("long").as("n_users"))
        .orderBy(col("epoch_hour"), col("event_type"))
    },

    // ---- spike detection: hours whose event count exceeds 2× the
    // trailing-24-row per-type baseline (integer cross-multiplication,
    // no floats). The window runs over the PRE-AGGREGATED hourly
    // relation — hours × types rows, not events — so the per-type
    // partition is tiny at any corpus scale; ≥12 prior rows required
    // before an hour can be judged (cold-start guard). ----
    sql("ev_hourly_spikes",
      s"""WITH e AS ($baseSql),
         |h AS (SELECT tsec // 3600 AS epoch_hour, event_type,
         |             CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM e GROUP BY 1, 2),
         |w AS (SELECT epoch_hour, event_type, cnt,
         |             CAST(SUM(cnt) OVER tw AS BIGINT) AS cnt_trail,
         |             CAST(COUNT(*) OVER tw AS BIGINT) AS n_trail
         |      FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY epoch_hour
         |                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT epoch_hour, event_type, cnt, cnt_trail, n_trail
         |FROM w WHERE n_trail >= 12 AND cnt * n_trail > 2 * cnt_trail
         |ORDER BY event_type, epoch_hour""") { (s, dir) =>
      val tw = Window.partitionBy(col("event_type"))
        .orderBy(col("epoch_hour"))
        .rowsBetween(-24, -1)
      base(s, dir)
        .groupBy(expr("tsec div 3600").as("epoch_hour"), col("event_type"))
        .agg(lsum(lit(1)).as("cnt"))
        .select(col("epoch_hour"), col("event_type"), col("cnt"),
          sum(col("cnt")).over(tw).cast("long").as("cnt_trail"),
          count(lit(1)).over(tw).cast("long").as("n_trail"))
        .filter(col("n_trail") >= 12 && col("cnt") * col("n_trail") > lit(2) * col("cnt_trail"))
        .orderBy(col("event_type"), col("epoch_hour"))
    },

    // ---- sessionization: 30-min-gap sessions per user (lag → flag →
    // running sum), the batch twin of streaming state timeouts ----
    sql("ev_sessionization",
      s"""WITH e AS ($baseSql),
         |flagged AS (
         |  SELECT user_id, tsec, cents, event_id,
         |         CASE WHEN tsec - LAG(tsec) OVER w > 1800
         |              OR LAG(tsec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
         |sessions AS (
         |  SELECT user_id, tsec, cents,
         |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsec, event_id
         |                          ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM flagged)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(MIN(tsec) AS BIGINT) AS start_sec,
         |       CAST(MAX(tsec) - MIN(tsec) AS BIGINT) AS duration_sec,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents
         |FROM sessions GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
      val flagged = base(s, dir).select(col("user_id"), col("tsec"), col("cents"),
        when(col("tsec") - lag(col("tsec"), 1).over(w) > 1800 ||
          lag(col("tsec"), 1).over(w).isNull, 1).otherwise(0).as("new_s"),
        col("event_id"))
      val sessions = flagged.select(col("user_id"), col("tsec"), col("cents"),
        sum(col("new_s")).over(
          Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_seq"))
      sessions.groupBy(col("user_id"), col("session_seq").cast("long").as("session_seq"))
        .agg(lsum(lit(1)).as("n_events"),
          min(col("tsec")).cast("long").as("start_sec"),
          (max(col("tsec")) - min(col("tsec"))).cast("long").as("duration_sec"),
          lsum(col("cents")).as("total_cents"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // ---- ordered funnel view → click → purchase (min-ts chaining) ----
    sql("ev_funnel",
      s"""WITH e AS ($baseSql),
         |v AS (SELECT user_id, MIN(tsec) AS t_view FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.tsec) AS t_click
         |      FROM e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.tsec > v.t_view
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.tsec) AS t_purchase
         |      FROM e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.tsec > c.t_click
         |      GROUP BY e.user_id)
         |SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
         |       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
         |       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel""") { (s, dir) =>
      val e = base(s, dir).cache()
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tsec")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("tsec") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("tsec")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("tsec") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("tsec")).as("t_purchase"))
      v.agg(lsum(lit(1)).as("n_view"))
        .crossJoin(broadcast(c.agg(lsum(lit(1)).as("n_view_click"))))
        .crossJoin(broadcast(p.agg(lsum(lit(1)).as("n_full_funnel"))))
    },

    // ---- top-10 purchasers by quantized spend (deterministic rank) ----
    sql("ev_top_spenders",
      s"""WITH e AS ($baseSql),
         |spend AS (SELECT user_id, CAST(SUM(cents) AS BIGINT) AS cents,
         |                 CAST(COUNT(*) AS BIGINT) AS n_purchases
         |          FROM e WHERE event_type = 'purchase' GROUP BY user_id),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rk
         |           FROM spend)
         |SELECT CAST(rk AS INT) AS rk, user_id, cents, n_purchases
         |FROM ranked WHERE rk <= 10 ORDER BY rk""") { (s, dir) =>
      val spend = base(s, dir).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(lsum(col("cents")).as("cents"), lsum(lit(1)).as("n_purchases"))
      // global top-k WITHOUT a single-partition window: limit-after-sort
      // plans as TakeOrderedAndProject, then rank the bounded winner
      // set by a broadcast ≤-join
      val top = spend.orderBy(col("cents").desc, col("user_id")).limit(10)
      val o = top.select(col("user_id").as("u2"), col("cents").as("c2"))
      top.join(broadcast(o),
          col("c2") > col("cents") || (col("c2") === col("cents") && col("u2") <= col("user_id")))
        .groupBy(col("user_id"), col("cents"), col("n_purchases"))
        .agg(count(lit(1)).cast("int").as("rk"))
        .select(col("rk"), col("user_id"), col("cents"), col("n_purchases"))
        .orderBy(col("rk"))
    },

    // ---- semi-structured props: JSON field extraction + aggregation ----
    sql("ev_json_props",
      s"""WITH e AS ($baseSql),
         |k AS (SELECT event_type, CAST(json_extract_string(props, '$$.k') AS INT) AS k
         |      FROM e)
         |SELECT event_type,
         |       CAST(SUM(k) AS BIGINT) AS sum_k,
         |       CAST(MIN(k) AS INT) AS min_k,
         |       CAST(MAX(k) AS INT) AS max_k,
         |       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
         |FROM k GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      base(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(lsum(col("k")).as("sum_k"),
          min(col("k")).cast("int").as("min_k"),
          max(col("k")).cast("int").as("max_k"),
          countDistinct(col("k")).cast("long").as("n_distinct_k"))
        .orderBy(col("event_type"))
    },

    // ---- per-(user, day) biggest event through the custom TopKPerKey
    // plan node (composite key; map-side pruning keeps 1 row per
    // user-day per partition before the shuffle) ----
    sql("ev_daily_top_event",
      s"""WITH e AS ($baseSql),
         |d AS (SELECT user_id, tsec // 86400 AS day, event_id, cents FROM e),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id, day
         |                 ORDER BY cents DESC, event_id) AS INT) AS rk
         |      FROM d)
         |SELECT user_id, day, event_id, cents, rk
         |FROM r WHERE rk = 1 ORDER BY user_id, day""") { (s, dir) =>
      val d = base(s, dir)
        .select(col("user_id"), expr("tsec div 86400").as("day"),
          col("event_id"), col("cents"))
      graft.plans.TopK
        .perKey(d, keyNames = Seq("user_id", "day"),
          order = Seq(col("cents").desc, col("event_id")), k = 1)
        .select(col("user_id"), col("day"), col("event_id"), col("cents"),
          col("rk").cast("int").as("rk"))
        .orderBy(col("user_id"), col("day"))
    },

    // ---- AS-OF join (backward): for every purchase, the user's
    // latest view at-or-before it. The scalable formulation: union the
    // two streams, ONE window partitioned by user — no per-row range
    // scan, no join explosion; this is how as-of joins survive 100 TB
    // (same SQL runs on both engines; DuckDB's ASOF JOIN would be the
    // sugar for it) ----
    sql("ev_asof_last_view",
      s"""WITH e AS ($baseSql),
         |tagged AS (
         |  SELECT user_id, tsec, event_id,
         |         CASE WHEN event_type = 'view' THEN tsec END AS view_sec
         |  FROM e WHERE event_type IN ('view', 'purchase')),
         |matched AS (
         |  SELECT user_id, tsec, event_id, view_sec,
         |         MAX(view_sec) OVER (PARTITION BY user_id
         |                             ORDER BY tsec, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS last_view_sec
         |  FROM tagged)
         |SELECT event_id, user_id, tsec AS purchase_sec, last_view_sec
         |FROM matched WHERE view_sec IS NULL
         |ORDER BY event_id""") { (s, dir) =>
      val tagged = base(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("tsec"), col("event_id"),
          when(col("event_type") === "view", col("tsec")).as("view_sec"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_view_sec", max(col("view_sec")).over(w))
        .filter(col("view_sec").isNull)
        .select(col("event_id"), col("user_id"),
          col("tsec").as("purchase_sec"), col("last_view_sec"))
        .orderBy(col("event_id"))
    },

    // ---- as-of join, direction = NEAREST with a tolerance (the
    // pandas merge_asof(direction='nearest', tolerance=24h) shape —
    // ev_asof_last_view is the backward-only sibling): each purchase
    // matches its closest view within ±86,400 s, ties to the backward
    // side. Implemented as TWO doc-ordered windows over the SAME
    // per-user stream (running MAX of view times up to the row +
    // running MIN after it) — never a purchase×view range join, so
    // the cost is one per-user sort regardless of how many views a
    // tolerance window holds; the 100 TB plan is identical to the
    // backward as-of it extends. ----
    sql("ev_asof_nearest",
      s"""WITH e AS ($baseSql),
         |tagged AS (
         |  SELECT user_id, tsec, event_id,
         |         CASE WHEN event_type = 'view' THEN tsec END AS view_sec
         |  FROM e WHERE event_type IN ('view', 'purchase')),
         |m AS (
         |  SELECT user_id, tsec, event_id, view_sec,
         |         MAX(view_sec) OVER (PARTITION BY user_id
         |                             ORDER BY tsec, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS back_sec,
         |         MIN(view_sec) OVER (PARTITION BY user_id
         |                             ORDER BY tsec, event_id
         |                             ROWS BETWEEN CURRENT ROW
         |                               AND UNBOUNDED FOLLOWING) AS fwd_sec
         |  FROM tagged),
         |p AS (
         |  SELECT event_id, user_id, tsec AS purchase_sec,
         |         CASE WHEN back_sec IS NOT NULL
         |                   AND tsec - back_sec <= 86400
         |                   AND (fwd_sec IS NULL
         |                        OR tsec - back_sec <= fwd_sec - tsec)
         |              THEN back_sec
         |              WHEN fwd_sec IS NOT NULL AND fwd_sec - tsec <= 86400
         |              THEN fwd_sec END AS view_sec
         |  FROM m WHERE view_sec IS NULL)
         |SELECT event_id, user_id, purchase_sec,
         |       CAST(coalesce(view_sec, -1) AS BIGINT) AS view_sec,
         |       CAST(coalesce(abs(purchase_sec - view_sec), -1) AS BIGINT)
         |         AS delta_sec,
         |       CASE WHEN view_sec IS NULL THEN 'none'
         |            WHEN view_sec <= purchase_sec THEN 'back'
         |            ELSE 'fwd' END AS direction
         |FROM p ORDER BY event_id""") { (s, dir) =>
      val tagged = base(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("tsec"), col("event_id"),
          when(col("event_type") === "view", col("tsec")).as("view_sec"))
      val ord = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
      val m = tagged
        .withColumn("back_sec", max(col("view_sec")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("fwd_sec", min(col("view_sec")).over(
          ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("view_sec").isNull)
      val nearest = when(col("back_sec").isNotNull &&
            col("tsec") - col("back_sec") <= 86400 &&
            (col("fwd_sec").isNull ||
              col("tsec") - col("back_sec") <= col("fwd_sec") - col("tsec")),
          col("back_sec"))
        .when(col("fwd_sec").isNotNull && col("fwd_sec") - col("tsec") <= 86400,
          col("fwd_sec"))
      m.withColumn("vs", nearest)
        .select(col("event_id"), col("user_id"), col("tsec").as("purchase_sec"),
          coalesce(col("vs"), lit(-1L)).cast("long").as("view_sec"),
          coalesce(abs(col("tsec") - col("vs")), lit(-1L)).cast("long")
            .as("delta_sec"),
          when(col("vs").isNull, "none")
            .when(col("vs") <= col("tsec"), "back").otherwise("fwd")
            .as("direction"))
        .orderBy(col("event_id"))
    },

    // ---- RANGE join against a broadcast band table: non-equi joins
    // are fine at scale exactly when the range side is dim-sized and
    // broadcast (BroadcastNestedLoopJoin), never fact×fact ----
    sql("ev_value_bands",
      s"""WITH e AS ($baseSql),
         |bands AS (SELECT * FROM (VALUES
         |  (0, 0, 1000), (1, 1000, 5000), (2, 5000, 20000),
         |  (3, 20000, 1000000)) AS t(band, lo, hi))
         |SELECT b.band, CAST(b.lo AS BIGINT) AS lo,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(e.cents) AS BIGINT) AS total_cents
         |FROM e JOIN bands b ON e.cents >= b.lo AND e.cents < b.hi
         |GROUP BY b.band, b.lo ORDER BY b.band""") { (s, dir) =>
      import s.implicits._
      val bands = Seq((0, 0L, 1000L), (1, 1000L, 5000L), (2, 5000L, 20000L),
        (3, 20000L, 1000000L)).toDF("band", "lo", "hi")
      base(s, dir)
        .join(broadcast(bands), col("cents") >= col("lo") && col("cents") < col("hi"))
        .groupBy(col("band"), col("lo"))
        .agg(lsum(lit(1)).as("n_events"), lsum(col("cents")).as("total_cents"))
        .select(col("band"), col("lo"), col("n_events"), col("total_cents"))
        .orderBy(col("band"))
    },

    // ---- stream-static enrichment, batch twin of
    // [[graft.streaming.StreamOps.enrichEvents]]: every event picks up
    // its user's dimension row (customer segment) via a broadcast LEFT
    // join — facts are never dropped — then rolls up by (segment,
    // band) with the same thresholds as the streaming op. Scale shape:
    // the user dim broadcasts when it fits (the streaming plan's only
    // option); at dim sizes past the broadcast threshold the same code
    // degrades to a shuffled hash join on user_id — one exchange. ----
    sql("ev_enriched_segments",
      s"""WITH e AS ($baseSql),
         |en AS (SELECT b.*, c.c_mktsegment AS segment
         |       FROM e b LEFT JOIN customer c ON c.c_custkey = b.user_id)
         |SELECT segment,
         |       CASE WHEN cents >= 50000 THEN 'high'
         |            WHEN cents >= 10000 THEN 'mid'
         |            ELSE 'low' END AS band,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM en GROUP BY segment, band
         |ORDER BY segment NULLS LAST, band""") { (s, dir) =>
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      base(s, dir)
        .join(broadcast(dim), Seq("user_id"), "left")
        .withColumn("band",
          when(col("cents") >= 50000L, "high")
            .when(col("cents") >= 10000L, "mid")
            .otherwise("low"))
        .groupBy(col("segment"), col("band"))
        .agg(lsum(lit(1)).as("n_events"), lsum(col("cents")).as("total_cents"),
          countDistinct(col("user_id")).cast("long").as("n_users"))
        // NULLS LAST pinned on both engines: a dim-less event's NULL
        // segment sorts first by Spark's default but last by DuckDB's
        .orderBy(col("segment").asc_nulls_last, col("band"))
    },

    // ---- event-type transition matrix (first-order Markov view of
    // user journeys): per user, consecutive event pairs via LEAD over
    // the user's time-ordered stream, then global pair counts and
    // per-source-state probabilities in ppm. One window partitioned on
    // user_id (the sessionization exchange, reused shape) + one pair
    // aggregation; the prob window partitions on from_type (event-type
    // cardinality, tiny). ----
    sql("ev_markov_transitions",
      s"""WITH e AS ($baseSql),
         |seq AS (
         |  SELECT user_id, event_type,
         |         LEAD(event_type) OVER (PARTITION BY user_id
         |           ORDER BY tsec, event_id) AS next_type
         |  FROM e),
         |pc AS (
         |  SELECT event_type AS from_type, next_type AS to_type,
         |         CAST(COUNT(*) AS BIGINT) AS n_transitions
         |  FROM seq WHERE next_type IS NOT NULL
         |  GROUP BY from_type, to_type)
         |SELECT from_type, to_type, n_transitions,
         |       CAST(n_transitions * 1000000 //
         |            SUM(n_transitions) OVER (PARTITION BY from_type)
         |         AS BIGINT) AS prob_ppm
         |FROM pc ORDER BY from_type, to_type""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsec"), col("event_id"))
      val pc = base(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(lsum(lit(1)).as("n_transitions"))
      pc.withColumn("prob_ppm",
          expr("CAST(n_transitions * 1000000 div " +
            "sum(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // ---- order statistics by RANK (not interpolation): quantiles as
    // the value at floor(p·(n-1))+1 in (cents, event_id) order —
    // integer-exact in any engine, one partitioned sort ----
    sql("ev_type_quantiles",
      s"""WITH e AS ($baseSql),
         |r AS (SELECT event_type, cents,
         |             ROW_NUMBER() OVER (PARTITION BY event_type
         |                                ORDER BY cents, event_id) AS rn,
         |             COUNT(*) OVER (PARTITION BY event_type) AS n
         |      FROM e)
         |SELECT event_type,
         |       CAST(MAX(CASE WHEN rn = (n - 1) // 4 + 1       THEN cents END) AS BIGINT) AS p25,
         |       CAST(MAX(CASE WHEN rn = (n - 1) // 2 + 1       THEN cents END) AS BIGINT) AS p50,
         |       CAST(MAX(CASE WHEN rn = (n - 1) * 9 // 10 + 1  THEN cents END) AS BIGINT) AS p90
         |FROM r GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      // exact per-type quantiles via a value-frequency histogram, NOT
      // a row_number window over raw events: the heavy term is a fully
      // parallel hash aggregation on (event_type, cents) with map-side
      // combine, and the cumulative window then runs over the DISTINCT
      // value table — bounded by the value domain per type, not the
      // event count. A raw-row window partitioned by the handful of
      // event types sorts each type's entire history on ONE reducer
      // (measured: 16 s at sf10 with 26 of 32 cores idle; the shape is
      // fatal at 100 TB). The rank-r VALUE of a multiset is the
      // smallest value whose cumulative frequency reaches r, so the
      // quantile definition — and the oracle SQL — is unchanged.
      val byType = Window.partitionBy(col("event_type"))
      val cum = base(s, dir)
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(byType.orderBy(col("cents"))))
        .withColumn("n", sum(col("c")).over(byType))
      cum.groupBy(col("event_type"))
        .agg(
          min(when(col("cum") >= expr("(n - 1) div 4 + 1"), col("cents")))
            .cast("long").as("p25"),
          min(when(col("cum") >= expr("(n - 1) div 2 + 1"), col("cents")))
            .cast("long").as("p50"),
          min(when(col("cum") >= expr("(n - 1) * 9 div 10 + 1"), col("cents")))
            .cast("long").as("p90"))
        .orderBy(col("event_type"))
    },

    // ---- grouping sets: CUBE over (event_type, weekday) with
    // grouping_id — one aggregation expands all 4 grouping sets ----
    sql("ev_cube",
      s"""WITH e AS ($baseSql),
         |d AS (SELECT event_type, (tsec // 86400 + 4) % 7 AS weekday, cents FROM e)
         |SELECT event_type, weekday,
         |       CAST(GROUPING(event_type) * 2 + GROUPING(weekday) AS INT) AS gid,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents
         |FROM d GROUP BY CUBE(event_type, weekday)
         |ORDER BY gid, event_type, weekday""") { (s, dir) =>
      base(s, dir)
        .select(col("event_type"), expr("(tsec div 86400 + 4) % 7").as("weekday"),
          col("cents"))
        .cube(col("event_type"), col("weekday"))
        .agg(grouping_id().cast("int").as("gid"),
          lsum(lit(1)).as("n_events"),
          lsum(col("cents")).as("total_cents"))
        .select(col("event_type"), col("weekday"), col("gid"),
          col("n_events"), col("total_cents"))
        .orderBy(col("gid"), col("event_type"), col("weekday"))
    },

    // ---- pivot: one row per day, one count column per event_type ----
    sql("ev_pivot_daily",
      s"""WITH e AS ($baseSql),
         |d AS (SELECT tsec // 86400 AS day, event_type FROM e)
         |SELECT day,
         |       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
         |       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
         |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         |       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         |       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
         |FROM d GROUP BY day ORDER BY day""") { (s, dir) =>
      base(s, dir)
        .select(expr("tsec div 86400").as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("day") +: Seq("view", "click", "purchase", "signup", "error")
          .map(c => col(c).cast("long").as(c)): _*)
        .orderBy(col("day"))
    },

    // ---- day-over-day retention: distinct user-days self-joined on
    // day+1 — one shuffle on user_id, then a merge on (user, day) ----
    sql("ev_daily_retention",
      s"""WITH e AS ($baseSql),
         |ud AS (SELECT DISTINCT user_id, tsec // 86400 AS day FROM e),
         |ret AS (SELECT a.day AS day, COUNT(b.user_id) AS retained
         |        FROM ud a LEFT JOIN ud b
         |          ON b.user_id = a.user_id AND b.day = a.day + 1
         |        GROUP BY a.day),
         |act AS (SELECT day, COUNT(*) AS active FROM ud GROUP BY day)
         |SELECT act.day AS day, CAST(act.active AS BIGINT) AS active,
         |       CAST(ret.retained AS BIGINT) AS retained
         |FROM act JOIN ret ON act.day = ret.day
         |ORDER BY day""") { (s, dir) =>
      val ud = base(s, dir)
        .select(col("user_id"), expr("tsec div 86400").as("day")).distinct()
      val b = ud.select(col("user_id"), (col("day") - 1).as("day"), lit(1).as("hit"))
      val ret = ud.join(b, Seq("user_id", "day"), "left_outer")
        .groupBy(col("day")).agg(lsum(coalesce(col("hit"), lit(0))).as("retained"))
      val act = ud.groupBy(col("day")).agg(lsum(lit(1)).as("active"))
      act.join(ret, Seq("day"))
        .select(col("day"), col("active"), col("retained"))
        .orderBy(col("day"))
    },

    // ---- purchase attribution: interval join of each purchase to the
    // same user's views in the preceding 30 min — the batch twin of
    // StreamOps.attributedPurchases (whose stream-stream join bounds
    // state by the same two-sided time condition). Equi-join on
    // user_id + range predicate ⇒ one shuffle, range filtered in the
    // join; never a time×time cross product. ----
    sql("ev_view_attribution",
      s"""WITH e AS ($baseSql),
         |v AS (SELECT user_id, event_id, tsec FROM e WHERE event_type = 'view'),
         |p AS (SELECT user_id, event_id, tsec, cents FROM e WHERE event_type = 'purchase')
         |SELECT p.event_id AS purchase_id, p.user_id, p.cents,
         |       CAST(COUNT(v.event_id) AS BIGINT) AS n_views_30m,
         |       MAX(v.event_id) AS last_view_id
         |FROM p LEFT JOIN v
         |  ON v.user_id = p.user_id
         | AND v.tsec <= p.tsec AND v.tsec >= p.tsec - 1800
         |GROUP BY p.event_id, p.user_id, p.cents
         |ORDER BY purchase_id""") { (s, dir) =>
      val e = base(s, dir)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("tsec").as("vsec"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("tsec").as("psec"), col("cents"))
      p.join(v,
          p("user_id") === v("user_id") &&
            col("vsec") <= col("psec") && col("vsec") >= col("psec") - 1800,
          "left_outer")
        .groupBy(col("purchase_id"), p("user_id"), col("cents"))
        .agg(count(col("view_id")).cast("long").as("n_views_30m"),
          max(col("view_id")).as("last_view_id"))
        .select(col("purchase_id"), col("user_id"), col("cents"),
          col("n_views_30m"), col("last_view_id"))
        .orderBy(col("purchase_id"))
    },

    // ---- the same sessions via Spark's BUILT-IN session_window
    // aggregation (one shuffle on user_id, no window-function pass;
    // also the shape that runs incrementally under a watermark).
    // Boundary note: session_window merges touching windows
    // INCLUSIVELY (new session iff diff > gap), which is exactly the
    // lag-formulation's `diff > 1800` — so the gaps coincide at 1800s
    // (verified: an exclusive-boundary reading is off by one session
    // on the fixture). ----
    sql("ev_session_window",
      s"""WITH e AS ($baseSql),
         |flagged AS (
         |  SELECT user_id, tsec, cents, event_id,
         |         CASE WHEN tsec - LAG(tsec) OVER w > 1800
         |              OR LAG(tsec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
         |sessions AS (
         |  SELECT user_id, tsec, cents,
         |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsec, event_id
         |                          ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM flagged)
         |SELECT user_id, CAST(MIN(tsec) AS BIGINT) AS start_sec,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents
         |FROM sessions GROUP BY user_id, session_seq
         |ORDER BY user_id, start_sec""") { (s, dir) =>
      base(s, dir)
        .select(col("user_id"), to_timestamp(col("tsec")).as("ts"), col("cents"))
        .groupBy(col("user_id"), session_window(col("ts"), "1800 seconds").as("sw"))
        .agg(lsum(lit(1)).as("n_events"), lsum(col("cents")).as("total_cents"))
        .select(col("user_id"), col("sw.start").cast("long").as("start_sec"),
          col("n_events"), col("total_cents"))
        .orderBy(col("user_id"), col("start_sec"))
    },

    // ---- calendar densification (gap fill): the hour × type grid
    // built from the data's own bounds, counts left-joined onto it,
    // zeros where silent — the resample/reindex step before any
    // time-series model. The grid sides are aggregate-bounded (hours,
    // types), so the cross join is a broadcast of two tiny frames,
    // never data × data. ----
    sql("ev_gap_fill",
      s"""WITH e AS ($baseSql),
         |h AS (SELECT tsec // 3600 AS hour, event_type,
         |             CAST(COUNT(*) AS BIGINT) AS n
         |      FROM e GROUP BY 1, 2),
         |bounds AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM h),
         |hours AS (SELECT unnest(range(h0, h1 + 1)) AS hour FROM bounds),
         |types AS (SELECT DISTINCT event_type FROM e),
         |grid AS (SELECT hour, event_type FROM hours CROSS JOIN types)
         |SELECT g.hour AS hour, g.event_type AS event_type,
         |       COALESCE(h.n, 0) AS n
         |FROM grid g LEFT JOIN h
         |  ON h.hour = g.hour AND h.event_type = g.event_type
         |ORDER BY hour, event_type""") { (s, dir) =>
      val e = base(s, dir)
      val h = e.groupBy(expr("tsec div 3600").as("hour"), col("event_type"))
        .agg(lsum(lit(1)).as("n"))
      val hours = h.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(explode(expr("sequence(h0, h1)")).as("hour"))
      val types = e.select(col("event_type")).distinct()
      hours.crossJoin(broadcast(types))
        .join(h, Seq("hour", "event_type"), "left_outer")
        .select(col("hour"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("hour"), col("event_type"))
    },

    // ---- cumulative adoption: users counted on their FIRST active
    // hour, then a running total — exact cumulative-distinct without
    // any per-period distinct state (the first-touch trick). The
    // running sum is a broadcast ≤-join over the hour dimension
    // (bounded), not an unpartitioned window. ----
    sql("ev_cumulative_users",
      s"""WITH e AS ($baseSql),
         |fd AS (SELECT user_id, MIN(tsec // 3600) AS first_hour FROM e GROUP BY user_id),
         |d AS (SELECT first_hour AS hour, COUNT(*) AS new_users FROM fd GROUP BY first_hour)
         |SELECT a.hour AS hour, CAST(a.new_users AS BIGINT) AS new_users,
         |       CAST(SUM(b.new_users) AS BIGINT) AS cumulative_users
         |FROM d a JOIN d b ON b.hour <= a.hour
         |GROUP BY a.hour, a.new_users
         |ORDER BY hour""") { (s, dir) =>
      val fd = base(s, dir).groupBy(col("user_id"))
        .agg(min(expr("tsec div 3600")).as("first_hour"))
      val d = fd.groupBy(col("first_hour").as("hour")).agg(count(lit(1)).as("new_users"))
      val b = d.select(col("hour").as("b_hour"), col("new_users").as("b_new"))
      d.join(broadcast(b), col("b_hour") <= col("hour"))
        .groupBy(col("hour"), col("new_users"))
        .agg(lsum(col("b_new")).as("cumulative_users"))
        .select(col("hour"), col("new_users").cast("long").as("new_users"),
          col("cumulative_users"))
        .orderBy(col("hour"))
    },

    // ---- rolling 7-day active users per day (the DAU/WAU shape):
    // the window is a broadcast range join of the bounded day
    // dimension against per-day distinct users — never a per-row
    // 7-day rescan of the fact table ----
    sql("ev_dau_wau",
      s"""WITH e AS ($baseSql),
         |ud AS (SELECT DISTINCT tsec // 86400 AS day, user_id FROM e),
         |days AS (SELECT DISTINCT day FROM ud)
         |SELECT d.day AS day,
         |       CAST(COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS BIGINT)
         |         AS dau,
         |       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
         |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
         |GROUP BY d.day ORDER BY day""") { (s, dir) =>
      val ud = base(s, dir)
        .select(expr("tsec div 86400").as("day"), col("user_id")).distinct()
      val days = ud.select(col("day").as("d")).distinct()
      ud.join(broadcast(days),
          col("day") >= col("d") - 6 && col("day") <= col("d"))
        .groupBy(col("d").as("day"))
        .agg(countDistinct(when(col("day") === col("d"), col("user_id")))
          .cast("long").as("dau"),
          countDistinct(col("user_id")).cast("long").as("wau"))
        .orderBy(col("day"))
    },

    // ---- HLL sketch surface: approximate distinct users per type,
    // as a PORTABLE deterministic HyperLogLog so the estimate itself
    // is oracle-EXACT (engine-native sketches like
    // approx_count_distinct can never hash-match an oracle; SketchSpec
    // cross-checks the native sketch against this one). m=64 md5
    // buckets, rho = trailing-zero rank of a second 32-bit md5 slice,
    // estimate = alpha_64 * m^2 / sum(2^-rho) computed entirely in
    // scaled integers (2^33 numerator, floor division) — bit-equal in
    // any engine with md5. At 100 TB this is THE cardinality shape:
    // constant-size register state (64 maxima) per group, map-side
    // combinable, one shuffle of registers — where exact
    // COUNT(DISTINCT) shuffles every distinct value. ----
    // ---- robust anomaly hours: |cnt − median| > 3·MAD per type, all
    // in exact integers (lower median via ROW_NUMBER at rank
    // (n+1)/2 — no engine-dependent even-count averaging; the 1.4826
    // normal-consistency factor is deliberately omitted, making "3×"
    // a ~2σ-equivalent gate). Complements ev_hourly_spikes' trailing
    // baseline with a whole-series robust one. Windows partition on
    // event_type over the PRE-AGGREGATED hourly relation — bounded
    // rows at any corpus scale. ----
    sql("ev_hourly_mad",
      s"""WITH e AS ($baseSql),
         |h AS (SELECT tsec // 3600 AS epoch_hour, event_type,
         |             CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM e GROUP BY 1, 2),
         |hr AS (SELECT epoch_hour, event_type, cnt,
         |              ROW_NUMBER() OVER (PARTITION BY event_type
         |                ORDER BY cnt, epoch_hour) AS rk,
         |              COUNT(*) OVER (PARTITION BY event_type) AS n
         |       FROM h),
         |m AS (SELECT event_type, cnt AS med FROM hr WHERE rk = (n + 1) // 2),
         |d AS (SELECT h.event_type, h.epoch_hour, h.cnt, m.med,
         |             ABS(h.cnt - m.med) AS dev
         |      FROM h JOIN m ON m.event_type = h.event_type),
         |dr AS (SELECT event_type, epoch_hour, dev,
         |              ROW_NUMBER() OVER (PARTITION BY event_type
         |                ORDER BY dev, epoch_hour) AS rk,
         |              COUNT(*) OVER (PARTITION BY event_type) AS n
         |       FROM d),
         |md AS (SELECT event_type, dev AS mad FROM dr WHERE rk = (n + 1) // 2)
         |SELECT d.event_type, d.epoch_hour, d.cnt, d.med, md.mad
         |FROM d JOIN md ON md.event_type = d.event_type
         |WHERE d.dev > 3 * md.mad
         |ORDER BY d.event_type, d.epoch_hour""") { (s, dir) =>
      val byType = Window.partitionBy(col("event_type"))
      val h = base(s, dir)
        .groupBy(expr("tsec div 3600").as("epoch_hour"), col("event_type"))
        .agg(lsum(lit(1)).as("cnt"))
      def lowerMedian(df: DataFrame, valueCol: String, outCol: String): DataFrame =
        df.withColumn("rk", row_number().over(
            byType.orderBy(col(valueCol), col("epoch_hour"))))
          .withColumn("n", count(lit(1)).over(byType))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("event_type"), col(valueCol).as(outCol))
      val m = lowerMedian(h, "cnt", "med")
      val d = h.join(broadcast(m), Seq("event_type"))
        .withColumn("dev", abs(col("cnt") - col("med")))
      val md = lowerMedian(d.select(col("event_type"), col("epoch_hour"), col("dev")),
        "dev", "mad")
      d.join(broadcast(md), Seq("event_type"))
        .filter(col("dev") > lit(3) * col("mad"))
        .select(col("event_type"), col("epoch_hour"), col("cnt"), col("med"), col("mad"))
        .orderBy(col("event_type"), col("epoch_hour"))
    },

    // ---- the same portable HLL per (hour, type): the registered
    // batch twin of streaming approxUsersHourly — a closed streaming
    // window equals this row bit-for-bit (StreamOpsSpec) ----
    sql("ev_hourly_users", {
      val hx1 = Hll.hexValSql("hx", 1)
      val hx9 = Hll.hexValSql("hx", 9)
      s"""WITH e AS ($baseSql),
         |h AS (SELECT tsec // 3600 AS epoch_hour, event_type,
         |             md5(CAST(user_id AS VARCHAR)) AS hx FROM e),
         |v AS (SELECT epoch_hour, event_type, $hx1 % ${Hll.M} AS bucket, $hx9 AS w FROM h),
         |r AS (SELECT epoch_hour, event_type, bucket, MAX(${Hll.rhoLadderSql}) AS mrho,
         |             COUNT(*) AS bn
         |      FROM v GROUP BY epoch_hour, event_type, bucket),
         |s AS (SELECT epoch_hour, event_type,
         |             CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - mrho AS INTEGER)) AS BIGINT) AS sp,
         |             COUNT(*) AS np,
         |             CAST(SUM(bn) AS BIGINT) AS n_events
         |      FROM r GROUP BY epoch_hour, event_type)
         |SELECT epoch_hour, event_type,
         |       CAST(${Hll.ScaledAlphaM2} // (1000 * (sp + (${Hll.M} - np) * 8589934592)) AS BIGINT)
         |         AS approx_users,
         |       n_events
         |FROM s ORDER BY epoch_hour, event_type"""
    }) { (s, dir) =>
      val v = base(s, dir)
        .select(expr("tsec div 3600").as("epoch_hour"), col("event_type"),
          md5(col("user_id").cast("string")).as("hx"))
        .select(col("epoch_hour"), col("event_type"),
          (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % Hll.M).as("bucket"),
          conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("w"))
      val regs = v.groupBy(col("epoch_hour"), col("event_type"), col("bucket"))
        .agg(max(expr(Hll.rhoLadderSql)).as("mrho"), count(lit(1)).as("bn"))
      regs.groupBy(col("epoch_hour"), col("event_type"))
        .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
          count(lit(1)).as("np"),
          sum(col("bn")).cast("long").as("n_events"))
        .select(col("epoch_hour"), col("event_type"),
          expr(s"CAST(${Hll.ScaledAlphaM2}L div (1000 * (sp + (${Hll.M} - np) * 8589934592L)) AS BIGINT)")
            .as("approx_users"),
          col("n_events"))
        .orderBy(col("epoch_hour"), col("event_type"))
    },

    sql("ev_approx_users", {
      val hx1 = Hll.hexValSql("hx", 1)
      val hx9 = Hll.hexValSql("hx", 9)
      s"""WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         |v AS (SELECT event_type, $hx1 % ${Hll.M} AS bucket, $hx9 AS w FROM h),
         |r AS (SELECT event_type, bucket, MAX(${Hll.rhoLadderSql}) AS mrho,
         |             COUNT(*) AS bn
         |      FROM v GROUP BY event_type, bucket),
         |s AS (SELECT event_type,
         |             CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - mrho AS INTEGER)) AS BIGINT) AS sp,
         |             COUNT(*) AS np,
         |             CAST(SUM(bn) AS BIGINT) AS n_events
         |      FROM r GROUP BY event_type)
         |SELECT event_type,
         |       CAST(${Hll.ScaledAlphaM2} // (1000 * (sp + (${Hll.M} - np) * 8589934592)) AS BIGINT)
         |         AS approx_users,
         |       n_events
         |FROM s ORDER BY event_type"""
    }) { (s, dir) =>
      val v = base(s, dir)
        .select(col("event_type"), md5(col("user_id").cast("string")).as("hx"))
        .select(col("event_type"),
          (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % Hll.M).as("bucket"),
          conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("w"))
      val regs = v.groupBy(col("event_type"), col("bucket"))
        .agg(max(expr(Hll.rhoLadderSql)).as("mrho"), count(lit(1)).as("bn"))
      regs.groupBy(col("event_type"))
        .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
          count(lit(1)).as("np"),
          sum(col("bn")).cast("long").as("n_events"))
        .select(col("event_type"),
          expr(s"CAST(${Hll.ScaledAlphaM2}L div (1000 * (sp + (${Hll.M} - np) * 8589934592L)) AS BIGINT)")
            .as("approx_users"),
          col("n_events"))
        .orderBy(col("event_type"))
    },

    // ---- per-(hour, type) KMV bottom-k distinct-user SAMPLE + NDV
    // estimate: the registered batch twin of streaming kmvUsersHourly
    // (StreamOps.scala) — a closed streaming window equals these rows
    // exactly (StreamOpsSpec parity), which puts the streaming op's
    // math under the DuckDB oracle, the same anchoring ev_approx_users
    // gives the HLL windows. k is the SHARED Pipeline.KmvK, so batch,
    // stream and the layout sketch (pipe_bottomk_merge) agree by
    // construction. Estimator: exact count when the sketch is not
    // full, (k−1)·2³²/h_k (first 8 hex chars of the k-th smallest
    // hash) when it is. Scale shape: one distinct-users groupBy
    // (map-side partials), then TopKPerKey's bounded heaps carry
    // ≤ k rows per key per partition across the exchange — no window
    // ever sees a full (hour, type) group; kth/est are ≤ k-row and
    // 1-row per-key aggregates. ----
    sql("ev_kmv_users", {
      val k = Pipeline.KmvK
      val hkv = Hll.hexValSql("hk", 1)
      s"""WITH e AS ($baseSql),
         |du AS (SELECT DISTINCT tsec // 3600 AS epoch_hour, event_type, user_id
         |       FROM e),
         |dh AS (SELECT epoch_hour, event_type, user_id,
         |              md5(CAST(user_id AS VARCHAR)) AS h FROM du),
         |cnt AS (SELECT epoch_hour, event_type, COUNT(*) AS nd
         |        FROM dh GROUP BY epoch_hour, event_type),
         |rnk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY epoch_hour, event_type
         |                                     ORDER BY h) AS rk FROM dh),
         |bk AS (SELECT * FROM rnk WHERE rk <= $k),
         |kth AS (SELECT epoch_hour, event_type, MAX(h) AS hk
         |        FROM bk GROUP BY epoch_hour, event_type),
         |est AS (SELECT c.epoch_hour, c.event_type,
         |               CAST(LEAST(c.nd, $k) AS INT) AS k_used,
         |               CAST(CASE WHEN c.nd < $k THEN c.nd
         |                    ELSE ${(k - 1).toLong} * 4294967296 // GREATEST($hkv, 1)
         |                    END AS BIGINT) AS ndv_est
         |        FROM cnt c JOIN kth t
         |          ON t.epoch_hour = c.epoch_hour AND t.event_type = c.event_type)
         |SELECT b.epoch_hour, b.event_type, CAST(b.rk AS INT) AS rk, b.h,
         |       b.user_id, s.k_used, s.ndv_est
         |FROM bk b JOIN est s
         |  ON s.epoch_hour = b.epoch_hour AND s.event_type = b.event_type
         |ORDER BY b.epoch_hour, b.event_type, b.rk"""
    }) { (s, dir) =>
      val k = Pipeline.KmvK
      val du = base(s, dir)
        .select(expr("tsec div 3600").as("epoch_hour"), col("event_type"),
          col("user_id"))
        .distinct()
        .withColumn("h", md5(col("user_id").cast("string")))
      val cnt = du.groupBy(col("epoch_hour"), col("event_type"))
        .agg(count(lit(1)).as("nd"))
      val bk = graft.plans.TopK.perKey(du,
        keyNames = Seq("epoch_hour", "event_type"),
        order = Seq(col("h").asc), k = k, rankName = "rk")
      val kth = bk.groupBy(col("epoch_hour"), col("event_type"))
        .agg(max(col("h")).as("hk"))
      val est = cnt.join(kth, Seq("epoch_hour", "event_type"))
        .select(col("epoch_hour"), col("event_type"),
          least(col("nd"), lit(k.toLong)).cast("int").as("k_used"),
          when(col("nd") < k, col("nd"))
            .otherwise(expr(s"CAST(${(k - 1).toLong} * 4294967296L div " +
              "greatest(CAST(conv(substring(hk, 1, 8), 16, 10) AS BIGINT), 1L) AS BIGINT)"))
            .cast("long").as("ndv_est"))
      bk.join(est, Seq("epoch_hour", "event_type"))
        .select(col("epoch_hour"), col("event_type"), col("rk").cast("int").as("rk"),
          col("h"), col("user_id"), col("k_used"), col("ndv_est"))
        .orderBy(col("epoch_hour"), col("event_type"), col("rk"))
    },

    // ---- KMV SET ALGEBRA — estimated audience overlap between event
    // types (theta-sketch intersection, Dasgupta 2016; KMV synopses,
    // Beyer 2007 / Bar-Yossef 2002): from each type's bottom-k
    // distinct-user sample alone, estimate |A∪B|, |A∩B| and Jaccard
    // for every type pair — the sketch-only computation a pipeline
    // runs when the raw user sets are long gone. Method: merge the
    // two samples, keep the k smallest of the union (θ = k-th), and
    // count how many of those k appear in BOTH samples (n_both);
    // union_est = (k−1)·2³²/θ (the ev_kmv_users estimator on the
    // union), inter_est = n_both·union_est/k, exact when the union
    // sample is not full (the same dichotomy as ev_kmv_users). k is
    // [[KmvOverlapK]], NOT Pipeline.KmvK: an NDV sketch is fine at
    // k = 8, but the intersection estimate has relative error
    // ~1/√(J·k) (Beyer 2007 §4) — at k = 8 Jaccard is quantized to
    // eighths. Scale shape: one distinct-users pass (map-side
    // partials), TopKPerKey bounded heaps per type, and everything
    // after operates on ≤ 2k rows per pair BY CONSTRUCTION — the
    // type-pair frame is |types|² rows, broadcast. ----
    sql("ev_kmv_overlap", {
      val k = KmvOverlapK
      val thv = Hll.hexValSql("th", 1)
      s"""WITH e AS ($baseSql),
         |du AS (SELECT DISTINCT event_type, user_id FROM e),
         |dh AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM du),
         |srk AS (SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type
         |                                                 ORDER BY h) AS rk FROM dh),
         |s AS (SELECT event_type, h FROM srk WHERE rk <= $k),
         |ty AS (SELECT DISTINCT event_type FROM e),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |          FROM ty a JOIN ty b ON a.event_type < b.event_type),
         |u AS (SELECT p.type_a, p.type_b, s.h,
         |             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         |             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
         |      FROM pairs p JOIN s ON s.event_type IN (p.type_a, p.type_b)
         |      GROUP BY p.type_a, p.type_b, s.h),
         |cu AS (SELECT type_a, type_b, COUNT(*) AS cnt_u FROM u
         |       GROUP BY type_a, type_b),
         |urk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
         |                                     ORDER BY h) AS ur FROM u),
         |top AS (SELECT * FROM urk WHERE ur <= $k),
         |ag AS (SELECT type_a, type_b, COUNT(*) AS k_used, MAX(h) AS th,
         |              SUM(in_a * in_b) AS n_both
         |       FROM top GROUP BY type_a, type_b)
         |SELECT g.type_a, g.type_b,
         |       CAST(g.k_used AS INT) AS k_used,
         |       CAST(g.n_both AS BIGINT) AS n_both,
         |       CAST(CASE WHEN c.cnt_u < $k THEN c.cnt_u
         |            ELSE ${(k - 1).toLong} * 4294967296 // GREATEST($thv, 1)
         |            END AS BIGINT) AS union_est,
         |       CAST(CASE WHEN c.cnt_u < $k THEN g.n_both
         |            ELSE (g.n_both * (${(k - 1).toLong} * 4294967296
         |                  // GREATEST($thv, 1))) // $k
         |            END AS BIGINT) AS inter_est,
         |       CAST(g.n_both * 1000000 // GREATEST(g.k_used, 1) AS BIGINT)
         |         AS jaccard_ppm
         |FROM ag g JOIN cu c ON c.type_a = g.type_a AND c.type_b = g.type_b
         |ORDER BY g.type_a, g.type_b"""
    }) { (s, dir) =>
      val k = KmvOverlapK
      val du = base(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h", md5(col("user_id").cast("string")))
      val sk = graft.plans.TopK.perKey(du, keyNames = Seq("event_type"),
        order = Seq(col("h").asc), k = k, rankName = "rk")
        .select(col("event_type"), col("h"))
      val ty = du.select(col("event_type")).distinct()
      // |types|² candidate pairs — a bounded non-equi join against a
      // broadcast frame of the distinct types, never row-scaled
      val pairs = ty.select(col("event_type").as("type_a"))
        .join(broadcast(ty.select(col("event_type").as("type_b"))),
          col("type_a") < col("type_b"))
      val pe = pairs.select(col("type_a"), col("type_b"),
        explode(array(col("type_a"), col("type_b"))).as("event_type"))
      val u = sk.join(broadcast(pe), Seq("event_type"))
        .groupBy(col("type_a"), col("type_b"), col("h"))
        .agg(max(when(col("event_type") === col("type_a"), 1).otherwise(0)).as("in_a"),
          max(when(col("event_type") === col("type_b"), 1).otherwise(0)).as("in_b"))
      val cu = u.groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("cnt_u"))
      val top = graft.plans.TopK.perKey(u, keyNames = Seq("type_a", "type_b"),
        order = Seq(col("h").asc), k = k, rankName = "ur")
      val ag = top.groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("k_used"), max(col("h")).as("th"),
          sum(col("in_a") * col("in_b")).as("n_both"))
      ag.join(cu, Seq("type_a", "type_b"))
        .withColumn("uest",
          when(col("cnt_u") < k, col("cnt_u"))
            .otherwise(expr(s"CAST(${(k - 1).toLong} * 4294967296L div " +
              "greatest(CAST(conv(substring(th, 1, 8), 16, 10) AS BIGINT), 1L) AS BIGINT)"))
            .cast("long"))
        .select(col("type_a"), col("type_b"),
          col("k_used").cast("int").as("k_used"),
          col("n_both").cast("long").as("n_both"),
          col("uest").as("union_est"),
          when(col("cnt_u") < k, col("n_both"))
            .otherwise(expr(s"(n_both * uest) div $k"))
            .cast("long").as("inter_est"),
          expr("CAST(n_both * 1000000 div greatest(k_used, 1) AS BIGINT)")
            .as("jaccard_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // ---- HLL register-max set algebra (Flajolet 2007 §4: union is
    // the ONE exact operation on HLL sketches — max registers of A
    // and B IS the sketch of A∪B, no error beyond the union's own
    // estimate): per event-type pair, |A|, |B|, |A∪B| from merged
    // registers, and the inclusion-exclusion intersection
    // |A|+|B|−|A∪B|. The mergeable-sketch complement of
    // ev_kmv_overlap: a rollup tree merges HLL registers losslessly
    // at every level (the reason production NDV pipelines ship
    // registers, not estimates), while intersections inherit the
    // DIFFERENCE of two estimates' errors — the documented motivation
    // for the theta/KMV op when J is small (SketchSpec pins both
    // against exact on the same fixture). Scale shape: ONE register
    // pass over events (map-side MAX partials, ≤ 64 rows per type);
    // everything after operates on register tables and the |types|²
    // broadcast pair frame — sketch-sized, never event-scaled. ----
    sql("ev_hll_pair_union", {
      val hx1 = Hll.hexValSql("hx", 1)
      val hx9 = Hll.hexValSql("hx", 9)
      val estSql = s"CAST(${Hll.ScaledAlphaM2} // (1000 * (sp + (${Hll.M} - np) * 8589934592)) AS BIGINT)"
      s"""WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         |v AS (SELECT event_type, $hx1 % ${Hll.M} AS bucket, $hx9 AS w FROM h),
         |r AS (SELECT event_type, bucket, MAX(${Hll.rhoLadderSql}) AS mrho
         |      FROM v GROUP BY event_type, bucket),
         |s1 AS (SELECT event_type,
         |              CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - mrho AS INTEGER)) AS BIGINT) AS sp,
         |              COUNT(*) AS np
         |       FROM r GROUP BY event_type),
         |e1 AS (SELECT event_type, $estSql AS est FROM s1),
         |ty AS (SELECT DISTINCT event_type FROM r),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |          FROM ty a JOIN ty b ON a.event_type < b.event_type),
         |ur AS (SELECT p.type_a, p.type_b, r.bucket, MAX(r.mrho) AS mrho
         |       FROM pairs p JOIN r ON r.event_type IN (p.type_a, p.type_b)
         |       GROUP BY p.type_a, p.type_b, r.bucket),
         |us AS (SELECT type_a, type_b,
         |              CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - mrho AS INTEGER)) AS BIGINT) AS sp,
         |              COUNT(*) AS np
         |       FROM ur GROUP BY type_a, type_b),
         |ue AS (SELECT type_a, type_b, $estSql AS union_est FROM us)
         |SELECT u.type_a, u.type_b,
         |       ea.est AS est_a, eb.est AS est_b, u.union_est,
         |       CAST(ea.est + eb.est - u.union_est AS BIGINT) AS inter_incl_excl
         |FROM ue u
         |JOIN e1 ea ON ea.event_type = u.type_a
         |JOIN e1 eb ON eb.event_type = u.type_b
         |ORDER BY u.type_a, u.type_b"""
    }) { (s, dir) =>
      val estExpr = s"CAST(${Hll.ScaledAlphaM2}L div (1000 * (sp + (${Hll.M} - np) * 8589934592L)) AS BIGINT)"
      val v = base(s, dir)
        .select(col("event_type"), md5(col("user_id").cast("string")).as("hx"))
        .select(col("event_type"),
          (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % Hll.M).as("bucket"),
          conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("w"))
      val r = v.groupBy(col("event_type"), col("bucket"))
        .agg(max(expr(Hll.rhoLadderSql)).as("mrho"))
      val e1 = r.groupBy(col("event_type"))
        .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
          count(lit(1)).as("np"))
        .select(col("event_type"), expr(estExpr).as("est"))
      val ty = r.select(col("event_type")).distinct()
      val pairs = ty.select(col("event_type").as("type_a"))
        .join(broadcast(ty.select(col("event_type").as("type_b"))),
          col("type_a") < col("type_b"))
      val pe = pairs.select(col("type_a"), col("type_b"),
        explode(array(col("type_a"), col("type_b"))).as("event_type"))
      val ur = r.join(broadcast(pe), Seq("event_type"))
        .groupBy(col("type_a"), col("type_b"), col("bucket"))
        .agg(max(col("mrho")).as("mrho"))
      val ue = ur.groupBy(col("type_a"), col("type_b"))
        .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
          count(lit(1)).as("np"))
        .select(col("type_a"), col("type_b"), expr(estExpr).as("union_est"))
      ue.join(broadcast(e1.select(col("event_type").as("type_a"), col("est").as("est_a"))),
          Seq("type_a"))
        .join(broadcast(e1.select(col("event_type").as("type_b"), col("est").as("est_b"))),
          Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
          col("union_est"),
          (col("est_a") + col("est_b") - col("union_est")).cast("long")
            .as("inter_incl_excl"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // ---- Count-Min heavy hitters (Cormode & Muthukrishnan 2005):
    // the frequency face of the sketch family (HLL answers "how many
    // distinct", KMV "which ones", Bloom "was it seen", CMS "how
    // OFTEN") — per-user event counts estimated from a d=4 × w=256
    // counter grid, hash row j = hex pair j of md5(user_id) (the
    // DSIR bucket idiom, identical in both engines). CMS is LINEAR,
    // so counters built from per-user partial counts equal per-event
    // insertion — which is exactly why it distributes: at 100 TB the
    // event stream aggregates ONCE (map-side partials on user_id),
    // the 1,024-cell grid is an aggregate that BROADCASTS back, and
    // the estimate join touches 4 rows per distinct user. est ≥ true
    // always (overcount = collision mass, ≤ 2N/w with prob 1−2⁻⁴ per
    // the paper's ε-δ bound); the top-20 ranking is orderBy+limit
    // (TakeOrderedAndProject), never a global window. ----
    sql("ev_count_min_sketch",
      s"""WITH e AS ($baseSql),
         |uc AS (SELECT user_id, COUNT(*) AS cnt FROM e GROUP BY user_id),
         |ub AS (SELECT user_id, cnt, j,
         |         (strpos('0123456789abcdef',
         |            substr(md5(CAST(user_id AS VARCHAR)), 2*j + 1, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef',
         |            substr(md5(CAST(user_id AS VARCHAR)), 2*j + 2, 1)) - 1) AS b
         |       FROM uc, UNNEST([0, 1, 2, 3]) AS t(j)),
         |ctr AS (SELECT j, b, SUM(cnt) AS c FROM ub GROUP BY j, b),
         |est AS (SELECT u.user_id, u.cnt, MIN(c.c) AS est
         |        FROM ub u JOIN ctr c ON c.j = u.j AND c.b = u.b
         |        GROUP BY u.user_id, u.cnt)
         |SELECT user_id, CAST(cnt AS BIGINT) AS true_cnt,
         |       CAST(est AS BIGINT) AS est_cnt,
         |       CAST(est - cnt AS BIGINT) AS overcount
         |FROM est ORDER BY est_cnt DESC, user_id LIMIT 20""") { (s, dir) =>
      val uc = base(s, dir).groupBy(col("user_id")).agg(lsum(lit(1)).as("cnt"))
      val ub = uc.withColumn("j", explode(expr("sequence(0, 3)")))
        .withColumn("b", expr(
          """(instr('0123456789abcdef',
            |   substring(md5(CAST(user_id AS STRING)), 2*j + 1, 1)) - 1) * 16
            | + (instr('0123456789abcdef',
            |   substring(md5(CAST(user_id AS STRING)), 2*j + 2, 1)) - 1)""".stripMargin))
      val ctr = ub.groupBy(col("j"), col("b")).agg(lsum(col("cnt")).as("c"))
      ub.join(broadcast(ctr), Seq("j", "b"))
        .groupBy(col("user_id"), col("cnt"))
        .agg(min(col("c")).as("est"))
        .select(col("user_id"), col("cnt").cast("long").as("true_cnt"),
          col("est").cast("long").as("est_cnt"),
          (col("est") - col("cnt")).cast("long").as("overcount"))
        .orderBy(col("est_cnt").desc, col("user_id"))
        .limit(20)
    })
}

/** Shared constants of the portable deterministic HyperLogLog (see
  * ev_approx_users): the SQL fragments below are generated once and
  * embedded in BOTH engines' queries, so the estimator cannot drift.
  */
private[graft] object Hll {
  /** Register count (2^6 buckets). */
  val M = 64
  /** alpha_64 = 0.709 as the scaled-integer numerator
    * alpha_num * m^2 * 2^33 with alpha denominator 1000 applied at the
    * divide: 709 * 64^2 * 2^33. */
  val ScaledAlphaM2: Long = 709L * (M.toLong * M) * 8589934592L
  /** rho(w) = index of the lowest set bit + 1 (geometric under a
    * uniform 32-bit hash, the HLL register update), 33 for w = 0 —
    * pure integer CASE ladder, identical text in Spark and DuckDB. */
  val rhoLadderSql: String =
    (1 to 32).map { k =>
      s"WHEN w % ${1L << k} = ${1L << (k - 1)} THEN $k"
    }.mkString("CASE ", " ", " ELSE 33 END")
  /** DuckDB-side hex→int of an 8-char md5 slice starting at `start`
    * (1-based); the Spark side uses conv() for the same value. */
  def hexValSql(col: String, start: Int): String =
    (0 until 8).map { i =>
      s"(instr('0123456789abcdef', substr($col, ${start + i}, 1)) - 1) * ${math.pow(16, 7 - i).toLong}"
    }.mkString("CAST((", " + ", ") AS BIGINT)")
}
