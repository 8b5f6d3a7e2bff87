package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed event on the stream (`cents` is the quantized value, as in
  * [[graft.ops.Events]]). */
final case class Event(
    event_id: Long, user_id: Long, event_type: String, ts: Timestamp, cents: Long)

/** A closed user session. */
final case class UserSession(
    user_id: Long, start_sec: Long, end_sec: Long, n_events: Long, total_cents: Long)

/** A document arriving on an ingest stream (batch twin: the
  * `documents` table plus an ingest timestamp). */
final case class Doc(
    doc_id: Long, ts: Timestamp, text: String, lang: String, source: String)

/** One (band, key) row of [[StreamOps.ingestCorpus]]'s dedup stage,
  * the doc's verdict payload riding along (scalars only — text never
  * enters the state operator). Bands 0-3 are the MinHash LSH bands;
  * band 4 is the exact-dup digest, folded into the same min-id state
  * family. */
private final case class IngestBandRow(
    ts: Timestamp, doc_id: Long, source: String, gate: Boolean,
    flagged: Boolean, n_tokens: Long, band: Int, bkey: String)

/** A per-doc verdict of the composed streaming corpus-ingest capstone
  * — the streaming face of pipe_llm_corpus's per-doc columns. */
final case class IngestVerdict(
    doc_id: Long, source: String, split: String, n_tokens: Long,
    quality_pass: Boolean, kept: Boolean, flagged: Boolean,
    used_before: Long, admitted: Boolean)

private final case class SessionState(
    start_sec: Long, last_sec: Long, n_events: Long, total_cents: Long)

/** Last-seen event per user — the transition-pair operator's state. */
private final case class LastEvent(ts_ms: Long, event_id: Long, event_type: String)

/** A bucketed/rho'd event entering the streaming HLL (`ts` stays: the
  * watermark rides on it into the stateful operator). */
private final case class HllEvent(
    ts: Timestamp, event_type: String, bucket: Int, rho: Int)

/** One open (hour, event_type) group's HLL sketch: 64 max-rho
  * registers + the event count. O(registers) regardless of distinct
  * users — the entire point of HLL state at scale. */
private final case class HllState(regs: Array[Int], n_events: Long)

/** A finalized approximate-distinct-users window. */
final case class HourlyUsers(
    window_start: Timestamp, event_type: String, approx_users: Long, n_events: Long)

/** A hashed event entering the streaming KMV sketch. */
private final case class KmvEvent(
    ts: Timestamp, event_type: String, h: String, uid: Long)

/** One open (hour, event_type) group's KMV sketch: the ≤ k smallest
  * distinct user-hashes (sorted) with their user ids — O(k) state
  * regardless of distinct users, like the HLL registers above. */
private final case class KmvState(hs: Array[String], ids: Array[Long])

/** One rank row of a finalized per-window KMV sketch: a uniform
  * distinct-user sample plus the (k−1)·2³²/h_k NDV estimate — the
  * streaming twin of pipe_bottomk_merge's per-cell artifact. */
final case class KmvSampleRow(
    window_start: Timestamp, event_type: String, rk: Int, h: String,
    user_id: Long, k_used: Int, ndv_est: Long)

/** One type-pair's theta-sketch set algebra for a closed hour window
  * — the streaming twin of ev_kmv_overlap's per-pair row, with the
  * window it was computed over. */
final case class KmvOverlapRow(
    window_start: Timestamp, type_a: String, type_b: String,
    k_used: Int, n_both: Long, union_est: Long, inter_est: Long,
    jaccard_ppm: Long)

/** One open window's overlap state: each event type's finalized
  * bottom-k hash sample as it arrives from the KMV stage (≤ k·|types|
  * strings — domain-bounded, never user-scaled), plus the "a|b" pair
  * keys already emitted (append mode cannot retract; first emission
  * wins — see [[StreamOps.kmvOverlapHourly]]). */
private final case class KmvOverlapState(
    types: Map[String, Seq[String]], emitted: Seq[String])

/** Structured Streaming expressions of the event-table shapes in
  * [[graft.ops.Events]] — the same semantics, incremental: tumbling
  * windows with watermarks, and gap-based sessionization with
  * `flatMapGroupsWithState` (the state pattern Spark's built-in
  * windowing can't express).
  *
  * Scale design: both operators shuffle once on their grouping key
  * (window/event_type, user_id) and hold O(open-groups) state in the
  * state store; the watermark bounds state growth, so a 100 TB/day
  * stream holds state only for the watermark horizon, not history.
  * The transformations are source-agnostic: the same code runs over
  * `readStream` (kafka/files) and over a batch DataFrame, which is how
  * the batch twins in `graft.ops.Events` stay the oracle for these.
  */
object StreamOps {

  /** Tumbling 1-hour rollup per event_type; watermark bounds state and
    * drops events later than `lateness`. */
  def hourlyRollup(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).cast("long").as("total_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events").cast("long"), col("total_cents"))

  /** Gap-based sessionization: a session closes when `gapSeconds` pass
    * with no event from the user (event time). Emits closed sessions
    * only (append mode); open sessions live in the state store until
    * the watermark passes their gap deadline.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      lateness: String = "30 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapSeconds))
  }

  /** Watermarked approximate distinct users per (hour, event_type),
    * maintained as the SAME portable md5-HLL the batch ev_approx_users
    * computes — identical bucket/rho/estimate integer math, so a
    * closed window's streaming row is BIT-EQUAL to the batch estimator
    * over the same events (StreamOpsSpec asserts it), not merely
    * within sketch error. The built-in approx_count_distinct would
    * also run incrementally; owning the registers is what makes exact
    * batch-parity checkable. State per open group is 64 ints —
    * distinct-count state stays O(registers), never O(users). Windows
    * emit once, on event-time timeout, when the watermark proves them
    * complete (append mode). */
  def approxUsersHourly(events: DataFrame, lateness: String = "1 hour")
      : Dataset[HourlyUsers] = {
    import events.sparkSession.implicits._
    import graft.ops.Hll
    events
      .withWatermark("ts", lateness)
      .select(col("ts"), col("event_type"),
        md5(col("user_id").cast("string")).as("hx"))
      .select(col("ts"), col("event_type"),
        (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % Hll.M)
          .cast("int").as("bucket"),
        conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("w"))
      .withColumn("rho", expr(Hll.rhoLadderSql).cast("int"))
      .select(col("ts"), col("event_type"), col("bucket"), col("rho"))
      .as[HllEvent]
      .groupByKey(e => (e.ts.getTime / 3600000L * 3600000L, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        hllFn)
  }

  /** The integer HLL estimate over final registers — the same formula
    * text as the batch twin's `s`/final CTEs (ev_approx_users). */
  private def hllEstimate(regs: Array[Int]): Long = {
    var sp = 0L
    var np = 0
    regs.foreach { r => if (r > 0) { sp += 1L << (33 - r); np += 1 } }
    graft.ops.Hll.ScaledAlphaM2 /
      (1000L * (sp + (graft.ops.Hll.M - np) * 8589934592L))
  }

  private def hllFn(
      key: (Long, String), events: Iterator[HllEvent], state: GroupState[HllState])
      : Iterator[HourlyUsers] = {
    val (winMs, eventType) = key
    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map { st =>
        HourlyUsers(new Timestamp(winMs), eventType, hllEstimate(st.regs), st.n_events)
      }.iterator
      state.remove()
      return out
    }
    val st = state.getOption.getOrElse(HllState(new Array[Int](graft.ops.Hll.M), 0L))
    val regs = st.regs.clone()
    var n = st.n_events
    events.foreach { e =>
      if (e.rho > regs(e.bucket)) regs(e.bucket) = e.rho
      n += 1
    }
    state.update(HllState(regs, n))
    // the window is final when the watermark passes its end; a late
    // re-open (group already fired) re-times-out on the next batch
    state.setTimeoutTimestamp(
      math.max(winMs + 3600 * 1000L + 1, state.getCurrentWatermarkMs + 1))
    Iterator.empty
  }

  /** Streaming KMV (bottom-k) distinct-user sample per (hour,
    * event_type) — the incremental twin of pipe_bottomk_merge's
    * per-cell artifact, and [[approxUsersHourly]]'s sibling: HLL
    * answers "how many distinct users", KMV additionally answers
    * "show me k representative ones" from the SAME O(k) state. A
    * user seen in several micro-batches of one window dedups by
    * hash inside the state merge (the exact step the batch op's
    * both-sides spec pins); emission at watermark timeout, like the
    * HLL windows. ndv_est = (k−1)·2³²/h_k when the sketch is full,
    * the exact distinct count when it is not. */
  def kmvUsersHourly(events: DataFrame, lateness: String = "1 hour",
      k: Int = graft.ops.Pipeline.KmvK): Dataset[KmvSampleRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .select(col("ts"), col("event_type"),
        md5(col("user_id").cast("string")).as("h"),
        col("user_id").cast("long").as("uid"))
      .as[KmvEvent]
      .groupByKey(e => (e.ts.getTime / 3600000L * 3600000L, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        kmvFn(k))
  }

  private def kmvFn(k: Int)(
      key: (Long, String), events: Iterator[KmvEvent], state: GroupState[KmvState])
      : Iterator[KmvSampleRow] = {
    val (winMs, eventType) = key
    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.iterator.flatMap { st =>
        val kUsed = st.hs.length
        val est =
          if (kUsed < k) kUsed.toLong
          else {
            val hv = java.lang.Long.parseLong(st.hs.last.substring(0, 8), 16)
            (k - 1).toLong * 4294967296L / math.max(hv, 1L)
          }
        st.hs.indices.map(i => KmvSampleRow(
          new Timestamp(winMs), eventType, i + 1, st.hs(i), st.ids(i), kUsed, est))
      }
      state.remove()
      return out
    }
    // merge the batch's hashes into the sorted ≤ k-entry state:
    // distinct-by-hash first (same user twice is ONE sketch entry),
    // then keep the k smallest
    val m = scala.collection.mutable.TreeMap.empty[String, Long]
    state.getOption.foreach(st => st.hs.indices.foreach(i => m(st.hs(i)) = st.ids(i)))
    events.foreach { e =>
      if (!m.contains(e.h)) {
        m(e.h) = e.uid
        if (m.size > k) m.remove(m.lastKey)
      }
    }
    state.update(KmvState(m.keys.toArray, m.values.toArray))
    state.setTimeoutTimestamp(
      math.max(winMs + 3600 * 1000L + 1, state.getCurrentWatermarkMs + 1))
    Iterator.empty
  }

  /** Streaming KMV SET ALGEBRA — ev_kmv_overlap's theta-sketch
    * pairwise |A∪B| / |A∩B| / Jaccard per closed hour window, over
    * the per-type bottom-k samples [[kmvUsersHourly]] finalizes.
    *
    * Plan shape (the capstone's chained-stateful pattern): stage 1 is
    * the existing per-(window, type) KMV operator — the heavy, keyed,
    * parallel pass over events; stage 2 re-keys the finalized SAMPLE
    * rows by window only, so its groups carry ≤ k·|types| rows per
    * window BY CONSTRUCTION (domain-bounded, never user-scaled) — the
    * bounded second level that makes a window-keyed group safe where
    * keying raw events by window alone would be the round-14 guard's
    * corpus-scaled-partition offender in streaming clothes.
    *
    * Stage 2 is NoTimeout and processes every input row
    * unconditionally (no watermark predicate), so the hazard Spark's
    * chained-stateful guard conservatively assumes cannot occur —
    * start the query inside [[withChainedStatefulGuardDisabled]],
    * exactly like [[ingestCorpus]]. Emission: stage 1 finalizes every
    * type of one window in the same micro-batch (their timeouts share
    * the watermark edge), so the window's full pair frame emits in
    * the following trigger; a late-re-opened type (the no-retraction
    * residual every streaming op here documents) forms only its NEW
    * pairs — already-emitted pairs are never re-emitted or retracted,
    * first emission wins. Pair math is pinned field-for-field to the
    * DuckDB-oracled batch op by StreamOpsSpec, k = the batch op's
    * [[graft.ops.Events.KmvOverlapK]] with the same error argument. */
  def kmvOverlapHourly(events: DataFrame, lateness: String = "1 hour",
      k: Int = graft.ops.Events.KmvOverlapK): Dataset[KmvOverlapRow] = {
    import events.sparkSession.implicits._
    kmvUsersHourly(events, lateness, k)
      .groupByKey(_.window_start.getTime)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        overlapFn(k))
  }

  private def overlapFn(k: Int)(
      winMs: Long, rows: Iterator[KmvSampleRow],
      state: GroupState[KmvOverlapState]): Iterator[KmvOverlapRow] = {
    val st = state.getOption.getOrElse(KmvOverlapState(Map.empty, Seq.empty))
    // each type's sample arrives COMPLETE (stage 1 emits a window's
    // rows atomically at its timeout); first arrival wins on the
    // re-open residual, matching the no-retraction contract
    val arrived = rows.toSeq.groupBy(_.event_type)
      .map { case (t, rs) => t -> rs.sortBy(_.rk).map(_.h) }
    val types = arrived.filterNot { case (t, _) => st.types.contains(t) } ++ st.types
    val emitted = st.emitted.toSet
    val all = types.keys.toSeq.sorted
    val fresh = for {
      a <- all; b <- all
      if a < b && !emitted(s"$a|$b")
    } yield (a, b)
    state.update(KmvOverlapState(types, st.emitted ++ fresh.map { case (a, b) => s"$a|$b" }))
    fresh.iterator.map { case (a, b) =>
      val (kUsed, nBoth, uEst, iEst, jPpm) = kmvPairStats(types(a), types(b), k)
      KmvOverlapRow(new Timestamp(winMs), a, b, kUsed, nBoth, uEst, iEst, jPpm)
    }
  }

  /** The ev_kmv_overlap pair estimator over two finalized bottom-k
    * hash samples — merge, keep the k smallest of the union
    * (θ = the k-th), count both-sides members among them:
    * union_est = (k−1)·2³²/θ, inter_est = n_both·union_est/k, both
    * EXACT when the union sample is not full (the ev_kmv_users
    * dichotomy). Integer math identical to the batch SQL so the
    * parity pin is field-for-field. */
  private[streaming] def kmvPairStats(hA: Seq[String], hB: Seq[String], k: Int)
      : (Int, Long, Long, Long, Long) = {
    val setA = hA.toSet
    val setB = hB.toSet
    val union = (setA ++ setB).toSeq.sorted
    val cntU = union.size.toLong
    val top = union.take(k)
    val kUsed = top.size
    val nBoth = top.count(h => setA(h) && setB(h)).toLong
    val unionEst =
      if (cntU < k) cntU
      else {
        val theta = java.lang.Long.parseLong(top.last.substring(0, 8), 16)
        (k - 1).toLong * 4294967296L / math.max(theta, 1L)
      }
    val interEst = if (cntU < k) nBoth else nBoth * unionEst / k
    val jaccardPpm = nBoth * 1000000L / math.max(kUsed, 1)
    (kUsed, nBoth, unionEst, interEst, jaccardPpm)
  }

  /** Stream-stream interval join: each purchase is attributed to the
    * same user's views in the `horizonMinutes` before it. Both sides
    * carry watermarks and the join condition bounds event-time distance
    * in BOTH directions, so each side's state store holds only the
    * horizon+lateness window — the canonical bounded-state
    * stream-stream join (an unbounded-time condition would accumulate
    * state forever). Shuffles once, on user_id. */
  def attributedPurchases(views: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 30, lateness: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("cents"))
    // rightOuter: purchases with NO view in the horizon still emit
    // (view columns null) — but only once the watermark proves no
    // matching view can still arrive, which is exactly why the outer
    // flavors REQUIRE the two-sided time bound
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      joinType)
      .select(col("p_user_id").as("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"), col("cents"))
  }

  /** Idempotent parquet SINK for the hourly rollup via foreachBatch +
    * dynamic partition overwrite. The sink partitions by BOTH grouping
    * keys (window_start, event_type) so each overwritten partition
    * corresponds 1:1 to an aggregation group: in Update mode a
    * micro-batch emits only the groups that changed, and a partition
    * holding more than one group would lose the unchanged groups on
    * overwrite (e.g. a batch updating only 'view' for hour H would
    * silently delete the 'click' row already written for H). With the
    * 1:1 layout a replayed batch (failure/retry) converges to the same
    * files instead of duplicating — exactly-once table semantics on a
    * plain parquet layout, no transactional format required. Returns
    * the started query; the caller owns its lifecycle. */
  def rollupToParquet(events: DataFrame, outDir: String,
      lateness: String = "2 hours", checkpointDir: Option[String] = None) = {
    val writer = hourlyRollup(events, lateness)
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.write.mode("overwrite")
          .partitionBy("window_start", "event_type").parquet(outDir)
      }
    // a real deployment always sets this: the checkpoint is what makes
    // stop/restart resume from the last committed offsets instead of
    // reprocessing or losing data (exactly-once with the idempotent
    // partition-overwrite sink above)
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Exactly-once-per-id view of an at-least-once stream:
    * `dropDuplicatesWithinWatermark` keys state by event_id but evicts
    * each key once the watermark passes it — O(watermark-window) state,
    * where a plain `dropDuplicates` on a stream grows state forever. */
  def dedupEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming ingest curation — the filter stage a crawl ingest runs
    * before anything lands in the corpus: the Gopher quality gate
    * evaluated map-side on each arriving doc (the SAME column
    * expression as the batch tx_gopher_rules gate — parity asserted in
    * StreamOpsSpec, so batch and streaming curation cannot drift),
    * then exact-dup drop by content digest. State is keyed on the
    * 16-byte digest, never the text, and
    * `dropDuplicatesWithinWatermark` evicts each key once the
    * watermark passes it — O(watermark-window) state on an unbounded
    * stream. */
  def curateDocs(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs
      .filter(graft.ops.Text.gopherPass(col("text")))
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("digest")
      .drop("digest")

  /** Streaming NEAR-dup candidate detection — the first-pass filter of
    * a streaming ingest pipeline ([[curateDocs]] drops exact dups;
    * this flags probable near-dups for downstream exact verification,
    * the lambda split production crawl-dedup runs: cheap streaming
    * candidates, exact batch verify).
    *
    * Map-side per doc: distinct word-3-gram shingles (the native
    * [[graft.functions.WordShingleArray]]), the same K md5-slice
    * MinHash values and band keys as the batch dd_* pipeline (4 bands
    * × 2 rows — identical key math, so a batch index and this stream
    * agree on collisions). Each doc's 4 (band, bkey) rows enter ONE
    * keyed stateful operator whose state per bucket is the MIN doc_id
    * seen (one long — same O(1) footprint as an occupied bit), evicted
    * once the watermark passes the bucket's last activity plus the
    * dedup HORIZON — O(buckets active within the horizon), never
    * corpus-sized. A row emits `hit = true` iff a SMALLER-id doc with
    * the same band key has arrived in any batch up to and including
    * this one — the batch rule "∃ d2 < d with the same band key"
    * evaluated over the stream prefix, ORDER-INSENSITIVELY (a late
    * smaller-id doc is judged against the min, not a bucket bit, so
    * out-of-order ingest cannot false-positive it; what append mode
    * cannot do is retract an already-emitted verdict when its smaller
    * collider arrives later). With in-order ingest the parity with the
    * batch rule is exact — StreamOpsSpec asserts both that parity
    * (collisions straddling micro-batches included) and the
    * out-of-order min-id behavior, plus kill-restart checkpoint
    * recovery of the min-id state and its horizon timeouts.
    * Downstream, `groupBy(doc_id).max(hit)` (or any threshold on the
    * number of colliding bands) is the candidate verdict. */
  def neardupCandidates(docs: DataFrame, lateness: String = "1 hour",
      horizonSeconds: Long = 24 * 3600): Dataset[(Long, Int, Boolean)] = {
    val s = docs.sparkSession
    import s.implicits._
    bandKeys(docs)
      .withWatermark("ts", lateness)
      .as[(Timestamp, Long, Int, String)]
      .groupByKey { case (_, _, band, bkey) => (band, bkey) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        bucketFn(horizonSeconds))
  }

  /** The map-side half of [[neardupCandidates]]: (ts, doc_id, band,
    * bkey) rows, one per MinHash band — the SAME transformation on a
    * batch frame is the parity twin's front end (like
    * [[graft.ops.Text.gopherPass]] for curateDocs), so the stream and
    * its batch oracle can never drift on the key math. Per-doc MinHash
    * runs as one array expression per hash (interpreted higher-order
    * fn — fine OFF the hot path: K evals per DOC, not per candidate
    * pair; the hot path here is the state store). */
  def bandKeys(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs
      .withColumn("shs", expr("graft_shingle_array(text, 3)"))
      .filter(size(col("shs")) > 0)
      .withColumn("bb", explode(bandStructs))
      .select(col("ts"), col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** The 4 (band, bkey) MinHash-band structs over a frame with `shs`
    * in scope — the ONE definition of the stream-side band key math,
    * shared by [[bandKeys]] (hence neardupCandidates' parity tests)
    * and [[ingestCorpus]], so the composed capstone and the standalone
    * candidate op cannot drift on collisions. */
  private def bandStructs: org.apache.spark.sql.Column = {
    def h(k: Int) =
      s"array_min(transform(shs, x -> substring(md5('${k / 4}:' || x), " +
        s"${(k % 4) * 8 + 1}, 8)))"
    expr((0 until 4).map(b =>
      s"named_struct('band', $b, 'bkey', md5(concat(${h(2 * b)}, ${h(2 * b + 1)})))")
      .mkString("array(", ", ", ")"))
  }

  private def bucketFn(horizonSeconds: Long)(
      key: (Int, String), rows: Iterator[(Timestamp, Long, Int, String)],
      state: GroupState[Long]): Iterator[(Long, Int, Boolean)] =
    minIdCore[(Timestamp, Long, Int, String), (Long, Int, Boolean)](
      horizonSeconds, _._2, _._1,
      (r, hit) => (r._2, r._3, hit))(rows, state)

  /** Streaming DUPLICATED-GRAM first-pass — the exact-substring (Lee
    * 2022) face of the lambda split [[neardupCandidates]] runs for
    * whole-doc near-dups: each arriving doc's 8-word gram occurrences
    * (the SAME [[graft.ops.Dedup.gramRows]] kernel as the batch
    * dd_dup_spans family — one shared definition, so stream and batch
    * gram math cannot drift) enter one keyed stateful operator per
    * gram hash. A row emits `hit = true` iff a strictly EARLIER
    * occurrence of the same gram — earlier in (doc_id, pos) order,
    * in any batch up to this one — exists: the batch dup rule
    * "count ≥ 2" evaluated over the stream prefix, covering both the
    * cross-doc quote AND the within-doc repetition, and
    * order-insensitive via the shared [[minIdCore]] (a late smaller
    * occurrence is judged against the min, so out-of-order ingest
    * cannot false-positive it; the no-retraction residual is the same
    * one neardupCandidates documents). State per gram bucket is ONE
    * long — the occurrence id packed as doc_id·2²¹ + pos (the 2²¹
    * position bound is ENFORCED: an oversized doc fails the query
    * loudly instead of aliasing ids; an at-least-once redelivery of
    * the same occurrence packs equal and equal ids are not hits) — evicted
    * a dedup HORIZON past the bucket's last activity. Downstream, the
    * flagged (doc_id, pos) stream is exactly the input the batch span
    * coalescing (islands of gap ≤ W) consumes — cheap streaming
    * candidates, exact batch spans: the Lee-2022 lambda split. */
  def dupGramCandidates(docs: DataFrame, lateness: String = "1 hour",
      horizonSeconds: Long = 24 * 3600): Dataset[(Long, Int, Boolean)] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.ops.Dedup.gramRows(docs.withWatermark("ts", lateness), Seq(col("ts")))
      .select(col("ts"), col("doc_id"), col("pos"), col("gh"))
      .as[(Timestamp, Long, Int, String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        gramFn(horizonSeconds))
  }

  private def gramFn(horizonSeconds: Long)(
      key: String, rows: Iterator[(Timestamp, Long, Int, String)],
      state: GroupState[Long]): Iterator[(Long, Int, Boolean)] =
    minIdCore[(Timestamp, Long, Int, String), (Long, Int, Boolean)](
      horizonSeconds, r => packOccurrence(r._2, r._3), _._1,
      (r, hit) => (r._2, r._3, hit))(rows, state)

  /** Occurrence-id packing for [[dupGramCandidates]]: doc_id·2²¹ + pos,
    * strictly monotone in (doc_id, pos) — which is what min-id state
    * compares. The position bound is ENFORCED, not just documented: a
    * doc with ≥ 2²¹ word positions would alias ids (a mask would wrap)
    * and silently corrupt min-id ordering, so the query fails loudly
    * instead — split such a doc upstream or widen the shift if the
    * doc-id range allows. */
  private[graft] def packOccurrence(docId: Long, pos: Int): Long = {
    require(pos >= 0 && pos < (1 << 21),
      s"dupGramCandidates: doc $docId gram position $pos outside [0, 2^21) — occurrence-id packing would alias")
    // doc_id gets the remaining 42 bits (sign bit excluded): a doc id
    // at/above 2^42 would overflow the shift and alias/reorder
    // occurrence ids — the same silent-corruption path as an oversized
    // pos, so it fails just as loudly
    require(docId >= 0 && docId < (1L << 42),
      s"dupGramCandidates: doc_id $docId outside [0, 2^42) — occurrence-id packing would overflow")
    (docId << 21) | pos.toLong
  }

  /** The shared min-id state core of [[bucketFn]] and the capstone's
    * dedup stage ([[ingestCorpus]]) — ONE definition of the verdict
    * and eviction rules, generic in the row payload.
    *
    * State = MIN doc_id ever seen in this bucket (same O(1) state as
    * an occupied bit) so each verdict is the batch rule "∃ smaller-id
    * doc with this band key" over everything that has arrived: a
    * smaller-id doc landing in a LATER micro-batch is not flagged
    * against a larger id it never preceded (an occupied bit would
    * false-positive it). Append mode still cannot retract an earlier
    * doc's verdict when its smaller collider arrives later — that
    * residual is the honest limit of no-retraction streaming. The
    * verdict is literally the batch rule: "∃ STRICTLY smaller-id doc
    * with this band key" — over state (cross-batch) and this batch's
    * own rows; comparing against the combined MIN (not "any non-first
    * row is a hit") keeps an at-least-once upstream's duplicate
    * delivery of the same (doc_id, band) row from being flagged as a
    * near-dup of itself: equal ids are not colliders. The bucket
    * lives for the DEDUP HORIZON past its last doc (the business
    * window "a near-dup of anything seen in the last N hours
    * counts"), not merely until the watermark passes its event time —
    * lateness bounds disorder, the horizon bounds state. */
  private def minIdCore[R, O](horizonSeconds: Long, docIdOf: R => Long,
      tsOf: R => Timestamp, emit: (R, Boolean) => O)(
      rows: Iterator[R], state: GroupState[Long]): Iterator[O] = {
    if (rows.isEmpty && state.hasTimedOut) {
      state.remove() // bucket idle past the watermark: evict
      return Iterator.empty
    }
    // deterministic in-batch order (state-store batches are unordered)
    val sorted = rows.toSeq.sortBy(docIdOf)
    val minBefore = state.getOption.getOrElse(Long.MaxValue)
    val minSeen = math.min(minBefore, docIdOf(sorted.head))
    var maxTs = Long.MinValue
    val out = sorted.map { r =>
      val hit = minSeen < docIdOf(r)
      if (tsOf(r).getTime > maxTs) maxTs = tsOf(r).getTime
      emit(r, hit)
    }
    state.update(minSeen)
    state.setTimeoutTimestamp(
      math.max(maxTs + horizonSeconds * 1000 + 1, state.getCurrentWatermarkMs + 1))
    out.iterator
  }

  /** Streaming benchmark decontamination — tx_bloom_decontaminate's
    * prefilter at ingest line rate: each arriving doc's distinct
    * word-5-grams (the SAME [[graft.ops.Text.ng5ArraySql]] kernel as
    * the batch op — one shared definition, so stream and batch gram
    * math cannot drift) are probed against the PUBLISHED benchmark
    * Bloom bitmap, emitting (ts, doc_id, n_grams, bloom_grams,
    * flagged). STATELESS — a pure per-row projection: no watermark, no
    * state store, restart is trivial; the 2 MiB bitmap is the only
    * reference data, shipped once per executor via the expression's
    * reference object exactly like the batch probe. No false
    * negatives by the Bloom guarantee: a doc sharing ANY 5-gram with
    * the benchmark always flags, so dropping `!flagged` rows at
    * ingest never lets contamination through — bloom-positive
    * survivors are what the batch exact-verify tail re-checks. The
    * probe runs inside an array `filter` lambda (interpreted, not
    * codegen — fine OFF the hot path: K gram evals per DOC, the
    * [[bandKeys]] policy). Batch parity is asserted in StreamOpsSpec
    * against the batch prefilter on the same rows. */
  def decontaminateDocs(docs: DataFrame, bloomBits: Array[Long]): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, LambdaFunction, UnresolvedNamedLambdaVariable}
    val g = UnresolvedNamedLambdaVariable(Seq("g"))
    val positive = GraftShim.column(ArrayFilter(
      GraftShim.expression(col("gs")),
      LambdaFunction(graft.functions.BloomMightContain(g, bloomBits), Seq(g))))
    docs
      .select(col("ts"), col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("gs", expr(graft.ops.Text.ng5ArraySql))
      .select(col("ts"), col("doc_id"),
        size(col("gs")).cast("long").as("n_grams"),
        size(positive).cast("long").as("bloom_grams"))
      .withColumn("flagged", col("bloom_grams") > 0)
  }

  /** Streaming per-source token-QUOTA admission — the stateful twin of
    * the batch tx_quota_admission gate (SAME rule: a source's docs are
    * admitted in (ts, doc_id) order until the fixed token budget is
    * spent, then rejected — prefix truncation). State per source is
    * ONE long (tokens seen so far): the cheapest state shape in the
    * library, and it must never time out — a quota is a lifetime
    * budget, so the state store holds |sources| longs forever, which
    * is dim-sized by construction. Each micro-batch sorts its
    * per-source slice by (ts, doc_id) before charging the budget, so
    * the verdicts are identical under ANY micro-batch split of an
    * in-order stream (StreamOpsSpec asserts parity across a split,
    * including a budget boundary straddling two batches). */
  def quotaAdmit(docs: DataFrame, budgetTokens: Long = 800L)
      : Dataset[(Long, String, Long, Long, Boolean)] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("ts"), col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
      .as[(Timestamp, Long, String, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        quotaFn(budgetTokens))
  }

  private def quotaFn(budget: Long)(
      source: String, rows: Iterator[(Timestamp, Long, String, Long)],
      state: GroupState[Long]): Iterator[(Long, String, Long, Long, Boolean)] = {
    var used = state.getOption.getOrElse(0L)
    val out = rows.toArray.sortBy(r => (r._1.getTime, r._2)).map {
      case (_, id, src, n) =>
        val before = used
        used += n
        (id, src, n, before, before + n <= budget)
    }
    state.update(used)
    out.iterator
  }

  /** The composed streaming corpus-ingest CAPSTONE — pipe_llm_corpus's
    * per-doc semantics as ONE streaming query, every stage the shared
    * definition of its standalone streaming op:
    *
    *  - quality gate: [[graft.ops.Text.gopherPass]] map-side (the
    *    [[curateDocs]] gate — the same Column expression batch
    *    tx_gopher_rules evaluates);
    *  - decontamination: the [[decontaminateDocs]] probe (shared
    *    ng5ArraySql kernel + the native Bloom-bitmap expression),
    *    stateless, fused into the scan projection;
    *  - dedup: [[bandStructs]]' four MinHash bands PLUS the exact-dup
    *    digest folded in as band 4 of the SAME min-id state family
    *    ([[minIdCore]], bucketFn's core) — exact-dup drop becomes
    *    "∃ smaller-id doc with my digest", which MARKS instead of
    *    dropping (curateDocs' dropDuplicatesWithinWatermark drops the
    *    row; a capstone emits a verdict per doc, so marking is the
    *    composable form) and unifies both dedup states into one
    *    operator with one eviction policy;
    *  - quota: [[quotaFn]]'s mechanics (one long per source, sort by
    *    (ts, doc_id), charge-then-compare) under the CAPSTONE charging
    *    rule — only curated train-split docs charge the budget, the
    *    ordering dependency a sequential runner gets wrong when it
    *    meters raw ingest (pipe_llm_corpus's defining insight).
    *
    * Split assignment hashes doc_id (not the batch capstone's
    * cluster_id, which streaming cannot know): for KEPT docs —
    * the only docs that charge, and the only docs a real ingest
    * materializes — cluster_id = doc_id in the batch rule, so the two
    * assignments coincide exactly where they are consumed; a non-kept
    * cluster member's batch split follows its representative (so a
    * verified pair never straddles splits), which a no-retraction
    * stream cannot replicate for late members — the honest limit,
    * same class as the neardup verdict residual.
    *
    * Plan shape: two chained flatMapGroupsWithState operators (both
    * Append — the supported multiple-stateful combination), keyed
    * (band, bkey) then source; a doc's 1-5 band rows stay inside its
    * own micro-batch through the explode and the dedup stage, so the
    * per-doc combine in the quota stage never waits (asserted by the
    * StreamOpsSpec e2e, including a kill-restart mid-budget). State:
    * O(active buckets within the horizon) longs + |sources| longs.
    *
    * Delivery contract (asymmetry by design): the DEDUP verdict is
    * safe under an at-least-once source — minIdCore treats an equal
    * id as its own prior self, never a collider, so a redelivered doc
    * re-earns its original kept bit. The QUOTA verdict assumes an
    * EXACTLY-ONCE source (file/kafka sources replayed through a
    * checkpoint qualify; an at-least-once upstream does not): the
    * budget state is one long per source, so a doc redelivered in a
    * LATER micro-batch charges again and emits a second verdict. The
    * idempotent alternative — remembering charged doc ids — costs
    * O(docs-per-source) state precisely where this design holds
    * O(1), so the contract is documented rather than paid for; an
    * at-least-once upstream must dedup (e.g. dropDuplicatesWithinWatermark
    * on doc_id) before this operator. */
  def ingestCorpus(docs: DataFrame, bloomBits: Array[Long],
      budgetTokens: Long = 800L, lateness: String = "1 hour",
      horizonSeconds: Long = 24 * 3600): Dataset[IngestVerdict] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.GraftExtensions.register(s)
    // Spark's chained-stateful-operator guard flags ANY stateful op
    // downstream of an event-time fMGWS, because a downstream
    // WATERMARK-FILTERING operator could discard the upstream's
    // emitted rows as late. Our downstream operator is the quota
    // stage: GroupStateTimeout.NoTimeout, no watermark predicate — it
    // processes every input row unconditionally, so the hazard the
    // guard conservatively assumes cannot occur in this plan. The
    // guard is an analysis-time check evaluated at query START, hence
    // a session conf rather than a plan property — which also means
    // this method CANNOT scope it (the caller starts the query later):
    // start the query inside [[withChainedStatefulGuardDisabled]],
    // which saves and restores the session value, so a later query on
    // the same session — one whose chained-stateful plan might be
    // genuinely unsafe — keeps Spark's analysis-time protection.
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, LambdaFunction, UnresolvedNamedLambdaVariable}
    val g = UnresolvedNamedLambdaVariable(Seq("g"))
    val positive = GraftShim.column(ArrayFilter(
      GraftShim.expression(col("gs")),
      LambdaFunction(graft.functions.BloomMightContain(g, bloomBits), Seq(g))))
    val enriched = docs
      .withColumn("gate", graft.ops.Text.gopherPass(col("text")))
      .withColumn("w", split(coalesce(col("text"), lit("")), " "))
      .withColumn("gs", expr(graft.ops.Text.ng5ArraySql))
      .withColumn("flagged", size(positive) > 0)
      .withColumn("n_tokens", size(col("w")).cast("long"))
    val payload = Seq(col("ts"), col("doc_id"), col("source"),
      col("gate"), col("flagged"), col("n_tokens"))
    val mh = enriched
      .withColumn("shs", expr("graft_shingle_array(text, 3)"))
      .filter(size(col("shs")) > 0)
      .withColumn("bb", explode(bandStructs))
      .select(payload :+ col("bb.band").as("band") :+ col("bb.bkey").as("bkey"): _*)
    // band 4 = the exact-dup digest (curateDocs' md5 content key); it
    // exists for EVERY doc, so shingle-less docs still reach a verdict
    val dg = enriched.select(
      payload :+ lit(4).as("band") :+ md5(coalesce(col("text"), lit(""))).as("bkey"): _*)
    mh.unionByName(dg)
      .withWatermark("ts", lateness)
      .as[IngestBandRow]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        ingestDedupFn(horizonSeconds))
      .groupByKey(_._1.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        ingestQuotaFn(budgetTokens))
  }

  /** Runs `body` — which must include STARTING any streaming query
    * whose plan chains stateful operators (e.g. [[ingestCorpus]]) —
    * with Spark's chained-stateful-operator guard disabled, then
    * RESTORES the session's previous value (set-or-unset) in a
    * finally. The guard is evaluated once, at query analysis
    * (`writeStream.start()`), so a query started inside this scope
    * keeps running after the conf is restored — and every later query
    * on the same session gets Spark's protection back. Without this
    * scoping, one ingestCorpus start would silently disarm the guard
    * session-wide, including for a future plan where the hazard the
    * guard checks for (a downstream operator watermark-filtering the
    * upstream fMGWS's late-emitted rows) is real. */
  def withChainedStatefulGuardDisabled[A](s: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private def ingestDedupFn(horizonSeconds: Long)(
      key: (Int, String), rows: Iterator[IngestBandRow],
      state: GroupState[Long]): Iterator[(IngestBandRow, Boolean)] =
    minIdCore[IngestBandRow, (IngestBandRow, Boolean)](
      horizonSeconds, _.doc_id, _.ts, (r, hit) => (r, hit))(rows, state)

  /** The pipe_llm_corpus split rule over a KEPT doc's cluster id
    * (= its own doc_id): first hex char of md5(decimal id) — '0' val,
    * '1' test, else train. Plain-JVM twin of the SQL rule, exact. */
  private[streaming] def splitOf(docId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) match {
      case 0 => "val"
      case 1 => "test"
      case _ => "train"
    }
  }

  private def ingestQuotaFn(budget: Long)(
      source: String, rows: Iterator[(IngestBandRow, Boolean)],
      state: GroupState[Long]): Iterator[IngestVerdict] = {
    // combine each doc's band verdicts — all of a doc's 1-5 band rows
    // travel inside the doc's own micro-batch (the explode and the
    // dedup stage both preserve batch membership), so the combine
    // never spans batches on an in-order stream
    val docs = rows.toArray.groupBy(_._1.doc_id).values.map { rs =>
      val r = rs.head._1
      val exactDup = rs.exists { case (b, hit) => b.band == 4 && hit }
      val nearDup = rs.exists { case (b, hit) => b.band < 4 && hit }
      (r, !exactDup && !nearDup)
    }.toArray.sortBy { case (r, _) => (r.ts.getTime, r.doc_id) }
    var used = state.getOption.getOrElse(0L)
    val out = docs.map { case (r, kept) =>
      val split = splitOf(r.doc_id)
      // the capstone charging rule: ONLY curated train docs spend
      // budget (quality ∧ kept ∧ clean ∧ train) — and a charged doc
      // past the boundary still spends (used_before keeps growing),
      // exactly the batch window's semantics
      val charge = r.gate && kept && !r.flagged && split == "train"
      val before = used
      if (charge) used += r.n_tokens
      IngestVerdict(r.doc_id, r.source, split, r.n_tokens, r.gate, kept,
        r.flagged, before, charge && before + r.n_tokens <= budget)
    }
    state.update(used)
    out.iterator
  }

  /** Stream-static enrichment: each event picks up its user's
    * dimension row (segment) via a BROADCAST left join — in a
    * streaming plan the static side is re-resolved every micro-batch
    * (a catalog-backed dim picks up slow changes between batches) and
    * the stream side never shuffles, so enrichment adds no state and
    * no exchange. Events without a dim row survive with a NULL
    * segment (left join — an enrichment must never drop facts). Adds
    * the same value band as the batch ev_value_bands /
    * ev_enriched_segments. */
  def enrichEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(broadcast(userDim), Seq("user_id"), "left")
      .withColumn("band",
        when(col("cents") >= 50000L, "high")
          .when(col("cents") >= 10000L, "mid")
          .otherwise("low"))

  /** Streaming twin of the batch ev_markov_transitions pair stage:
    * per user, each arriving event pairs with the PREVIOUS event
    * (event-time order, ties on event_id) into a (from_type, to_type)
    * transition row. State is one (ts, event_id, type) triple per
    * user — the "last value per key" pattern — so state size is
    * O(users), independent of stream length; in-batch events are
    * sorted before folding (state-store batches are unordered), and
    * the triple carries across micro-batches so cross-batch
    * transitions are not lost. Downstream aggregation (counts /
    * probabilities) composes as a normal streaming groupBy. */
  def transitionPairs(events: Dataset[Event]): Dataset[(String, String)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transitionFn)
  }

  private def transitionFn(
      userId: Long, events: Iterator[Event], state: GroupState[LastEvent])
      : Iterator[(String, String)] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val out = Seq.newBuilder[(String, String)]
    var last = state.getOption
    sorted.foreach { e =>
      last.foreach(l => out += ((l.event_type, e.event_type)))
      last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
    }
    last.foreach(state.update)
    out.result().iterator
  }

  private def sessionFn(gapSeconds: Long)(
      userId: Long, events: Iterator[Event], state: GroupState[SessionState])
      : Iterator[UserSession] = {
    def close(s: SessionState) =
      UserSession(userId, s.start_sec, s.last_sec, s.n_events, s.total_cents)

    if (events.isEmpty && state.hasTimedOut) {
      // watermark passed the gap deadline: the open session is closed
      val out = state.getOption.map(close).iterator
      state.remove()
      return out
    }

    // fold this batch's events (sorted: state-store batches are not
    // ordered) into the open session, closing on in-batch gaps too
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = Seq.newBuilder[UserSession]
    var open = state.getOption
    sorted.foreach { e =>
      val sec = e.ts.getTime / 1000
      open = open match {
        case Some(s) if sec - s.last_sec > gapSeconds =>
          closed += close(s)
          Some(SessionState(sec, sec, 1, e.cents))
        case Some(s) =>
          Some(SessionState(s.start_sec, math.max(s.last_sec, sec),
            s.n_events + 1, s.total_cents + e.cents))
        case None =>
          Some(SessionState(sec, sec, 1, e.cents))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp((s.last_sec + gapSeconds) * 1000 + 1)
    }
    closed.result().iterator
  }
}
