package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the streaming operators through MemoryStream micro-batches
  * and checks them against their batch twins' semantics
  * ([[graft.ops.Events]] ev_hourly_rollup / ev_sessionization).
  */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // offset from epoch 0: the initial watermark is 0, and an event AT
  // the watermark boundary is treated as late by the state operator
  private val base = 1000800L // seconds, hour-aligned (278 * 3600)
  private def ts(minutes: Long): Timestamp = new Timestamp((base + minutes * 60) * 1000)
  private def sec(minutes: Long): Long = base + minutes * 60

  test("hourlyRollup incrementally matches the batch tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.hourlyRollup(input.toDF())
      .writeStream.format("memory").queryName("rollup")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, 1, "view", ts(10), 100),
        Event(2, 1, "view", ts(20), 50),
        Event(3, 2, "click", ts(70), 25))
      q.processAllAvailable()
      val rows = spark.table("rollup")
        .groupBy("window_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"),
          org.apache.spark.sql.functions.max("total_cents").as("total_cents"))
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(rows == Set(
        (ts(0), "view", 2L, 150L),
        (ts(60), "click", 1L, 25L)))
    } finally q.stop()
  }

  test("hourlyRollup over the real events fixture equals the batch computation") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    def normalized(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.ops.Events.tsTimestampOf(df).as("ts"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

    val raw = spark.read.parquet(s"$dir/events.parquet")
    val expected = normalized(raw)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).cast("long").as("total_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events").cast("long"), col("total_cents"))
      .collect().map(_.toSeq).toSet

    // the file-stream source wants a directory, not a file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ev-stream-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(streamDir.toString)
    val q = StreamOps.hourlyRollup(normalized(stream))
      .writeStream.format("memory").queryName("ev_fixture_rollup")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_fixture_rollup").collect().map(_.toSeq).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sessionize over the real events fixture matches the batch sessionization") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def toEvents(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_id"), col("user_id"), col("event_type"),
      graft.ops.Events.tsTimestampOf(df).as("ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents")).as[Event]

    // batch expectation from the ev_sessionization shape, keyed the
    // same way the stream emits (start/end/count/cents)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsec", "event_id")
    val batch = raw.select(col("user_id"), col("event_id"),
        graft.ops.Events.tsecOf(raw).as("tsec"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("new_s", when(col("tsec") - lag("tsec", 1).over(w) > 1800 ||
        lag("tsec", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("seq", sum("new_s").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "seq")
      .agg(min("tsec").as("start_sec"), max("tsec").as("end_sec"),
        count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
    val lastSeq = batch.groupBy("user_id").agg(max("seq").as("seq"))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("start_sec"), col("end_sec"),
        col("n_events"), col("total_cents"))
      .as[UserSession].collect().toSet
    val batchAll = sessions(batch)
    // sessions closed by a gap MUST be emitted; each user's final
    // session closes only if the end-of-input watermark passes its
    // gap deadline, so it may legitimately stay in state
    val gapClosed = sessions(batch.join(lastSeq, Seq("user_id", "seq"), "left_anti"))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ev-sess-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(streamDir.toString)
    val q = StreamOps.sessionize(toEvents(stream), gapSeconds = 1800,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("ev_fixture_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_fixture_sessions").as[UserSession].collect().toSet
      assert(gapClosed.subsetOf(got),
        s"missing gap-closed sessions: ${gapClosed.diff(got).take(5)}")
      assert(got.subsetOf(batchAll),
        s"stream emitted sessions the batch doesn't have: ${got.diff(batchAll).take(5)}")
      assert(got.size > 100)
    } finally q.stop()
  }

  test("attributedPurchases joins purchases to views within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.attributedPurchases(views.toDF(), purchases.toDF(),
        horizonMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        Event(1, 1, "view", ts(0), 0),   // 20 min before purchase: attributed
        Event(2, 1, "view", ts(-40), 0), // 60 min before: outside horizon
        Event(3, 2, "view", ts(10), 0))  // other user
      purchases.addData(Event(10, 1, "purchase", ts(20), 500))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "purchase_id", "view_id", "cents")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 10L, 1L, 500L)))
    } finally q.stop()
  }

  test("right-outer attributedPurchases emits view-less purchases after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.attributedPurchases(views.toDF(), purchases.toDF(),
        horizonMinutes = 30, lateness = "0 seconds", joinType = "rightOuter")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(Event(1, 1, "view", ts(0), 0))
      purchases.addData(
        Event(10, 1, "purchase", ts(20), 500), // attributed to view 1
        Event(11, 2, "purchase", ts(20), 700)) // no view at all
      q.processAllAvailable()
      // advance BOTH watermarks past purchase_ts so the unmatched row
      // can be declared final and emitted with null view columns
      views.addData(Event(98, 9, "view", ts(600), 0))
      purchases.addData(Event(99, 9, "purchase", ts(600), 0))
      q.processAllAvailable()
      val got = spark.table("attrib_outer")
        .select("purchase_id", "view_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(got.contains((10L, Some(1L))), got)
      assert(got.contains((11L, None)), got)
    } finally q.stop()
  }

  test("attributedPurchases on the fixture matches the batch interval join") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def normalized(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_id"), col("user_id"), col("event_type"),
      graft.ops.Events.tsTimestampOf(df).as("ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

    val batch = {
      val e = normalized(raw)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("cents"))
      v.join(p, col("user_id") === col("p_user_id") &&
          col("view_ts") <= col("purchase_ts") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("purchase_id"), col("view_id"))
        .collect().map(_.toSeq).toSet
    }

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ev-attrib-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = normalized(
      spark.readStream.schema(raw.schema).parquet(streamDir.toString))
    val q = StreamOps.attributedPurchases(
        stream.filter(col("event_type") === "view"),
        stream.filter(col("event_type") === "purchase"),
        horizonMinutes = 30)
      .writeStream.format("memory").queryName("attrib_fixture")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib_fixture")
        .select("purchase_id", "view_id").collect().map(_.toSeq).toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("rollupToParquet lands the same table as the batch rollup, idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-rollup-sink-").toString
    val input = MemoryStream[Event]
    val q = StreamOps.rollupToParquet(input.toDF(), out)
    try {
      input.addData(
        Event(1, 1, "view", ts(10), 100),
        Event(2, 1, "view", ts(20), 50))
      q.processAllAvailable()
      // a second batch UPDATES hour 0 and ADDS hour 1: the hour-0
      // partition must be rewritten in place, not duplicated
      input.addData(
        Event(3, 2, "view", ts(30), 25),
        Event(4, 2, "click", ts(70), 10))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("window_start", "event_type", "n_events", "total_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(got == Set(
        (ts(0), "view", 3L, 175L),
        (ts(60), "click", 1L, 10L)))
    } finally q.stop()
  }

  test("rollupToParquet keeps sibling groups when one group in an hour updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-rollup-sib-").toString
    val input = MemoryStream[Event]
    val q = StreamOps.rollupToParquet(input.toDF(), out)
    try {
      // batch 1: TWO event types land in the same hour partition
      input.addData(
        Event(1, 1, "view", ts(10), 100),
        Event(2, 2, "click", ts(15), 40))
      q.processAllAvailable()
      // batch 2 updates ONLY 'view' for that hour; in Update mode the
      // batch carries no 'click' row, so a sink partitioned by
      // window_start alone would overwrite the hour and lose 'click'
      input.addData(Event(3, 3, "view", ts(20), 60))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("window_start", "event_type", "n_events", "total_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(got == Set(
        (ts(0), "view", 2L, 160L),
        (ts(0), "click", 1L, 40L)))
    } finally q.stop()
  }

  test("rollupToParquet survives a stop/restart from its checkpoint, exactly-once") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    def land(file: String, events: (Long, Long, String, Long, Long)*): Unit =
      events.toSeq
        .map { case (id, uid, typ, m, c) => Event(id, uid, typ, ts(m), c) }
        .toDF().coalesce(1).write.mode("overwrite").parquet(s"$work/stage-$file")
        // atomic arrival: file sources list complete files only
        .ensuring { _ =>
          val staged = java.nio.file.Files.list(
            java.nio.file.Paths.get(s"$work/stage-$file")).toArray
            .map(_.toString).filter(_.endsWith(".parquet"))
          java.nio.file.Files.move(
            java.nio.file.Paths.get(staged.head),
            java.nio.file.Paths.get(s"$in/$file.parquet"))
          true
        }
    val schema = Seq.empty[Event].toDF().schema
    def start() = StreamOps.rollupToParquet(
      spark.readStream.schema(schema).parquet(in), out,
      checkpointDir = Some(ckpt))

    land("a", (1, 1, "view", 10, 100), (2, 1, "view", 20, 50))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // second file arrives while the query is DOWN; the restart must
    // pick it up from the checkpoint and update hour 0 in place
    land("b", (3, 2, "view", 30, 25), (4, 2, "click", 70, 10))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("window_start", "event_type", "n_events", "total_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(got == Set(
        (ts(0), "view", 3L, 175L),
        (ts(60), "click", 1L, 10L)))
    } finally q2.stop()
  }

  test("dedupEvents drops re-deliveries of the same event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "view", ts(0), 10),
        Event(1, 1, "view", ts(0), 10),  // same-batch duplicate
        Event(2, 2, "view", ts(5), 20))
      q.processAllAvailable()
      input.addData(Event(1, 1, "view", ts(0), 10)) // cross-batch re-delivery
      q.processAllAvailable()
      val got = spark.table("dedup").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }

  test("transitionPairs matches the batch LEAD pairing, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.transitionPairs(input.toDS())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("transitions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two users, in-batch transitions (u1 arrives unordered)
      input.addData(
        Event(2, 1, "cart", ts(5), 0),
        Event(1, 1, "view", ts(0), 0),
        Event(3, 2, "view", ts(1), 0))
      q.processAllAvailable()
      // batch 2: cross-batch transitions continue from held state
      input.addData(
        Event(4, 1, "purchase", ts(9), 0),
        Event(5, 2, "view", ts(7), 0))
      q.processAllAvailable()
      val got = spark.table("transitions")
        .as[(String, String)].collect().toSeq.sorted
      // batch expectation: LEAD over each user's (ts, event_id) order
      assert(got == Seq(
        ("cart", "purchase"), ("view", "cart"), ("view", "view")))
    } finally q.stop()
  }

  test("enrichEvents broadcast-joins the dim per batch and keeps dim-less events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("user_id", "segment")
    val input = MemoryStream[Event]
    val q = StreamOps.enrichEvents(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = Seq(
        Event(1, 1, "view", ts(0), 5000),
        Event(2, 2, "purchase", ts(1), 60000),
        Event(3, 7, "view", ts(2), 20000)) // no dim row for user 7
      input.addData(evs: _*)
      q.processAllAvailable()
      val got = spark.table("enrich")
        .select("event_id", "segment", "band")
        .as[(Long, Option[String], String)].collect().toSeq.sortBy(_._1)
      assert(got == Seq(
        (1L, Some("BUILDING"), "low"),
        (2L, Some("MACHINERY"), "high"),
        (3L, None, "mid")))
      // parity: the same transformation over a batch frame
      val batch = StreamOps.enrichEvents(evs.toDF(), dim)
        .select("event_id", "segment", "band")
        .as[(Long, Option[String], String)].collect().toSeq.sortBy(_._1)
      assert(batch == got)
    } finally q.stop()
  }

  test("curateDocs gates on quality and drops content re-deliveries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good1 = "the quick brown fox jumps over a lazy dog of sorts and more words here"
    val good2 = "a data pipeline is made of many stages and the tokens flow through them"
    val input = MemoryStream[Doc]
    val q = StreamOps.curateDocs(input.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, ts(0), good1, "en", "web"),
        Doc(2, ts(1), good1, "en", "mirror"), // same-batch content dup
        Doc(3, ts(2), "x y z", "en", "web")) // fails the quality gate
      q.processAllAvailable()
      input.addData(
        Doc(4, ts(10), good1, "en", "web"), // cross-batch content dup
        Doc(5, ts(11), good2, "en", "web"))
      q.processAllAvailable()
      val got = spark.table("curated").select("doc_id")
        .as[Long].collect().toSeq.sorted
      // doc 1 xor 2 survives (same micro-batch, same digest — one wins);
      // 3 fails quality, 4 is a cross-batch dup, 5 is new content
      assert(got.size == 2 && got.last == 5L && (got.head == 1L || got.head == 2L), got)
    } finally q.stop()
  }

  test("decontaminateDocs flags benchmark-overlapping docs statelessly, no false negatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bits = graft.ops.Text.bloomBitsOf(Seq(
      "alpha bravo charlie delta echo",
      "bravo charlie delta echo foxtrot").toDF("g"))
    val input = MemoryStream[Doc]
    val q = StreamOps.decontaminateDocs(input.toDF(), bits)
      .writeStream.format("memory").queryName("decon")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, ts(0), "alpha bravo charlie delta echo golf hotel", "en", "web"),
        Doc(2, ts(1), "one two three four five six", "en", "web"),
        Doc(3, ts(2), "tiny", "en", "web")) // < 5 words: zero grams
      q.processAllAvailable()
      input.addData( // second micro-batch: both benchmark grams present
        Doc(4, ts(10), "x1 x2 alpha bravo charlie delta echo foxtrot", "en", "web"))
      q.processAllAvailable()
      val got = spark.table("decon")
        .select($"doc_id", $"n_grams", $"bloom_grams", $"flagged")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (1L, 3L, 1L, true), // "alpha bravo charlie delta echo" hits
        (2L, 2L, 0L, false),
        (3L, 0L, 0L, false),
        (4L, 4L, 2L, true)))
      // independent kernel replay: sliding-window grams + BloomImpl
      val texts = Map(1L -> "alpha bravo charlie delta echo golf hotel",
        2L -> "one two three four five six", 3L -> "tiny",
        4L -> "x1 x2 alpha bravo charlie delta echo foxtrot")
      got.foreach { case (id, _, blm, _) =>
        val model = texts(id).split(" ").toSeq.sliding(5).filter(_.size == 5)
          .map(_.mkString(" ")).toSet
          .count(g => graft.functions.BloomImpl.contains(
            org.apache.spark.unsafe.types.UTF8String.fromString(g), bits))
        assert(blm == model.toLong, s"doc $id")
      }
    } finally q.stop()
  }

  test("curateDocs quality gate agrees with the batch tx_gopher_rules gate") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val streamGate = d.select($"doc_id",
      graft.ops.Text.gopherPass($"text").cast("int").as("p"))
    val batchGate = graft.ops.Text.gopherSignals(d)
      .select($"doc_id", $"quality_pass".as("b"))
    val disagree = streamGate.join(batchGate, Seq("doc_id"))
      .filter($"p" =!= $"b").count()
    assert(disagree == 0L)
  }

  test("approxUsersHourly emits windows register-exact with the batch HLL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def normalized(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.ops.Events.tsTimestampOf(df).as("ts"),
      col("event_type"), col("user_id"))

    // batch twin: the ev_approx_users register pipeline, grouped by
    // hour as well — the same integer math the stream maintains
    val batch = normalized(raw)
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"), md5(col("user_id").cast("string")).as("hx"))
      .select(col("window_start"), col("event_type"),
        (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % 64)
          .cast("int").as("bucket"),
        conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("w"))
      .withColumn("rho", expr(graft.ops.Hll.rhoLadderSql).cast("int"))
      .groupBy(col("window_start"), col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("mrho"), count(lit(1)).as("bn"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
        count(lit(1)).as("np"), sum(col("bn")).cast("long").as("n_events"))
      .select(col("window_start"), col("event_type"),
        expr(s"CAST(${graft.ops.Hll.ScaledAlphaM2}L div " +
          "(1000 * (sp + (64 - np) * 8589934592L)) AS BIGINT)").as("approx_users"),
        col("n_events"))
      .as[HourlyUsers].collect()
      .map(h => (h.window_start, h.event_type) -> (h.approx_users, h.n_events)).toMap

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ev-hll-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = normalized(
      spark.readStream.schema(raw.schema).parquet(streamDir.toString))
    val q = StreamOps.approxUsersHourly(stream, lateness = "0 seconds")
      .writeStream.format("memory").queryName("ev_hll")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_hll").as[HourlyUsers].collect()
        .map(h => (h.window_start, h.event_type) -> (h.approx_users, h.n_events)).toMap
      // every emitted window must be BIT-EQUAL to the batch estimator
      got.foreach { case (k, v) =>
        assert(batch.get(k).contains(v), s"window $k: stream=$v batch=${batch.get(k)}")
      }
      // and all but the watermark-open tail must have emitted: only
      // windows whose end exceeds the final watermark may be held
      val maxTs = batch.keys.map(_._1.getTime).max
      val mustEmit = batch.keys.filter(_._1.getTime + 3600 * 1000L < maxTs)
      mustEmit.foreach { k =>
        assert(got.contains(k), s"window $k closed but never emitted")
      }
      assert(got.nonEmpty)
    } finally q.stop()
  }

  /** Lands `events` as one complete parquet file in `in` — staged
    * then moved, because the file-stream source lists files atomically
    * and a half-written file would be read as a short batch. */
  private def landFile(work: java.nio.file.Path, in: String, file: String,
      events: Seq[Event]): Unit = {
    import spark.implicits._
    events.toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$work/stage-$file")
    val staged = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$work/stage-$file")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(staged.head),
      java.nio.file.Paths.get(s"$in/$file.parquet"))
  }

  test("sessionize state survives a stop/restart; late data after restart is dropped") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-sess-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    val schema = Seq.empty[Event].toDF().schema
    def start() = StreamOps.sessionize(
        spark.readStream.schema(schema).parquet(in).as[Event],
        gapSeconds = 1800, lateness = "0 seconds")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // phase 1: user 1 has an OPEN session (events at t0, t10); user 2
    // one event. Nothing closes; all state lives in the state store.
    landFile(work, in, "a", Seq(
      Event(1, 1, "view", ts(0), 10),
      Event(2, 1, "click", ts(10), 20),
      Event(3, 2, "view", ts(5), 5)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 arrives while the query is DOWN:
    //  - user 1 at t50: >30 min after t10 — closes session (t0,t10)
    //    and opens a new one. Correct ONLY if the open-session state
    //    was recovered from the checkpoint; a fresh query would emit
    //    (t50,t50) with no (t0,t10) session at all.
    //  - t1000/t2000 advance the watermark so every open session
    //    times out and is flushed.
    landFile(work, in, "b", Seq(
      Event(4, 1, "view", ts(50), 30),
      Event(99, 9, "view", ts(1000), 0)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // a LATE event spanning the restart: t20 is far behind the
      // recovered watermark (t1000, persisted in the checkpoint's
      // commit log) — the state operator must drop it, not resurrect
      // user 2's already-timed-out session
      landFile(work, in, "c", Seq(
        Event(5, 2, "view", ts(20), 7),
        Event(100, 9, "view", ts(2000), 0)))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).as[UserSession].collect().toSeq
      val got = rows.toSet
      // exactly-once: no session row lands twice across the restart
      assert(rows.size == got.size, s"duplicated sessions: $rows")
      assert(got.contains(UserSession(1, sec(0), sec(10), 2, 30)), got)
      assert(got.contains(UserSession(1, sec(50), sec(50), 1, 30)), got)
      // user 2's session holds ONLY the pre-restart event: the late
      // t20 event neither extended nor re-opened it
      assert(got.contains(UserSession(2, sec(5), sec(5), 1, 5)), got)
      assert(!got.exists(s => s.user_id == 2 && s.n_events > 1), got)
    } finally q2.stop()
  }

  test("approxUsersHourly HLL registers survive a stop/restart mid-window") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-hll-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    val schema = Seq.empty[Event].toDF().schema
    def start() = StreamOps.approxUsersHourly(
        spark.readStream.schema(schema).parquet(in), lateness = "0 seconds")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // phase 1: hour-0 'view' events from users 1..40 in minutes 0..29
    // — the window stays OPEN (watermark at ts(29)), its 64 HLL
    // registers in state
    val phase1 = (1L to 40L).map(u => Event(u, u, "view", ts(u % 30), 0))
    landFile(work, in, "a", phase1)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 while DOWN: users 41..60 land in the SAME hour but in
    // minutes 30..49 — AFTER the recovered watermark (ts(29), from
    // the checkpoint), so none is late — then a far-future event
    // closes the window. The emitted estimate must cover ALL 60 users
    // — i.e. the phase-1 registers were recovered, not reset.
    val phase2 = (41L to 60L).map(u => Event(u, u, "view", ts(u - 11), 0)) :+
      Event(999, 999, "click", ts(600), 0)
    landFile(work, in, "b", phase2)
    val q2 = start()
    try {
      q2.processAllAvailable()
      landFile(work, in, "c", Seq(Event(1000, 999, "click", ts(1200), 0)))
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[HourlyUsers].collect()
        .filter(_.event_type == "view")
      assert(got.length == 1, s"hour-0 view window must emit exactly once: ${got.toSeq}")
      assert(got.head.n_events == 60L, got.head)

      // bit-equal oracle: the batch twin over the UNION of both phases
      val all = (phase1 ++ phase2).toDF()
      val batch = all
        .select(org.apache.spark.sql.functions.window($"ts", "1 hour")
            .getField("start").as("window_start"), $"event_type",
          org.apache.spark.sql.functions.md5($"user_id".cast("string")).as("hx"))
        .select($"window_start", $"event_type",
          (org.apache.spark.sql.functions.conv(
            org.apache.spark.sql.functions.substring($"hx", 1, 8), 16, 10)
            .cast("long") % 64).cast("int").as("bucket"),
          org.apache.spark.sql.functions.conv(
            org.apache.spark.sql.functions.substring($"hx", 9, 8), 16, 10)
            .cast("long").as("w"))
        .withColumn("rho", org.apache.spark.sql.functions
          .expr(graft.ops.Hll.rhoLadderSql).cast("int"))
        .filter($"event_type" === "view")
        .groupBy($"bucket").agg(org.apache.spark.sql.functions.max($"rho").as("mrho"))
        .select(org.apache.spark.sql.functions
          .expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mrho AS INT)))").as("sp"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("np"))
        .select(org.apache.spark.sql.functions.expr(
          s"CAST(${graft.ops.Hll.ScaledAlphaM2}L div " +
            "(1000 * (sp + (64 - np) * 8589934592L)) AS BIGINT)").as("approx_users"))
        .as[Long].head()
      assert(got.head.approx_users == batch,
        s"stream=${got.head.approx_users} batch=$batch — registers lost in restart?")
    } finally q2.stop()
  }

  test("neardupCandidates matches the batch min-id band-collision rule, across batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the REAL fixture docs, in-order arrival (ts monotone in doc_id)
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => Doc(r.getLong(0), ts(r.getLong(0)), r.getString(1),
        r.getString(2), r.getString(3)))
      .sortBy(_.doc_id)
    assert(fixture.length > 20)

    // batch twin over the SAME band-key derivation: hit iff a smaller
    // doc_id shares the (band, bkey) bucket
    val twin = StreamOps.bandKeys(fixture.toSeq.toDF())
      .withColumn("minid", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .select(col("doc_id"), col("band"), (col("minid") < col("doc_id")).as("hit"))
      .as[(Long, Int, Boolean)].collect().toSet

    // stream in TWO micro-batches split mid-corpus, so some buckets
    // are occupied in batch 1 and hit from batch 2 (the state-carry
    // path, not just in-batch comparison)
    val (first, second) = fixture.splitAt(fixture.length / 2)
    val input = MemoryStream[Doc]
    // horizon spans the whole fixture's ts range: nothing evicts
    // mid-test, so the batch twin (which sees everything) is exact
    val q = StreamOps.neardupCandidates(input.toDF(), lateness = "0 seconds",
        horizonSeconds = 86400L * 30)
      .toDF("doc_id", "band", "hit")
      .writeStream.format("memory").queryName("nd_cands")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(first.toSeq: _*)
      q.processAllAvailable()
      input.addData(second.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("nd_cands")
        .as[(Long, Int, Boolean)].collect().toSet
      assert(got == twin, {
        val missing = twin.diff(got).take(5)
        val extra = got.diff(twin).take(5)
        s"stream != batch twin; missing=$missing extra=$extra"
      })
      // the fixture really exercises both outcomes, and specifically
      // CROSS-batch hits: a batch-2 doc whose bucket hit even though
      // no smaller batch-2 doc shares it
      assert(got.exists(_._3) && got.exists(!_._3))
      val splitId = second.head.doc_id
      val batch2Hits = twin.filter { case (d, _, h) => h && d >= splitId }
      assert(batch2Hits.nonEmpty, "fixture has no cross-half collisions to test")
    } finally q.stop()
  }

  test("neardupCandidates min-id state is order-insensitive across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // four docs sharing ONE text (⇒ identical band keys), arriving OUT
    // of id order across three batches: 10,20 | 5 | 15. Min-id state
    // must judge each doc against the smallest id seen so far — an
    // occupied bit would false-positive doc 5 (round-6 ADVICE).
    val t = "alpha beta gamma delta epsilon zeta"
    def d(id: Long) = Doc(id, ts(id), t, "en", "web")
    val input = MemoryStream[Doc]
    val q = StreamOps.neardupCandidates(input.toDF(), lateness = "1 hour",
        horizonSeconds = 86400L)
      .toDF("doc_id", "band", "hit")
      .writeStream.format("memory").queryName("nd_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(d(10), d(20)); q.processAllAvailable()
      input.addData(d(5)); q.processAllAvailable()
      input.addData(d(15)); q.processAllAvailable()
      val verdicts = spark.table("nd_ooo")
        .groupBy($"doc_id").agg(org.apache.spark.sql.functions.max($"hit").as("hit"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts == Map(
        10L -> false, // first arrival
        20L -> true,  // in-batch smaller collider (10)
        5L -> false,  // SMALLER than everything seen: the batch rule says no dup
        15L -> true)) // min is 5 by now
    } finally q.stop()
  }

  test("neardupCandidates does not self-flag duplicate deliveries of the same doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // at-least-once upstreams re-deliver: the same (doc_id, band) row
    // twice in ONE micro-batch (batch 1), and again across batches
    // (batch 2). Equal ids are not colliders — the verdict rule is
    // "∃ STRICTLY smaller-id doc", so a doc must never be flagged as a
    // near-dup of itself (the round-7 ADVICE hole: "any non-first
    // sorted row is a hit" flagged the in-batch duplicate). A
    // genuinely smaller doc arriving later must still flag re-deliveries.
    val t = "alpha beta gamma delta epsilon zeta"
    def d(id: Long) = Doc(id, ts(id), t, "en", "web")
    val input = MemoryStream[Doc]
    val q = StreamOps.neardupCandidates(input.toDF(), lateness = "1 hour",
        horizonSeconds = 86400L)
      .toDF("doc_id", "band", "hit")
      .writeStream.format("memory").queryName("nd_dup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(d(10), d(10)); q.processAllAvailable() // in-batch dup
      input.addData(d(10)); q.processAllAvailable()        // cross-batch dup
      val afterDups = spark.table("nd_dup")
        .as[(Long, Int, Boolean)].collect()
      assert(afterDups.length == 12, s"3 deliveries × 4 bands, got ${afterDups.length}")
      assert(afterDups.forall(!_._3),
        s"duplicate delivery self-flagged: ${afterDups.filter(_._3).take(3).toSeq}")
      // a smaller collider still flags a subsequent re-delivery
      input.addData(d(3)); q.processAllAvailable()
      input.addData(d(10)); q.processAllAvailable()
      val verdicts = spark.table("nd_dup")
        .groupBy($"doc_id").agg(org.apache.spark.sql.functions.max($"hit").as("hit"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts == Map(10L -> true, 3L -> false))
    } finally q.stop()
  }

  test("neardupCandidates state and horizon timeouts survive a stop/restart") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-nd-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    val tA = "alpha beta gamma delta epsilon zeta"
    val tB = "one two three four five six seven"
    val tC = "red orange yellow green blue indigo"
    val schema = Seq.empty[Doc].toDF().schema
    def landDocs(file: String, docs: Seq[Doc]): Unit = {
      docs.toDF().coalesce(1).write.mode("overwrite").parquet(s"$work/stage-$file")
      val staged = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/stage-$file")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staged.head),
        java.nio.file.Paths.get(s"$in/$file.parquet"))
    }
    // horizon 50 min: bucket state lives 50 min past its last doc
    def start() = StreamOps.neardupCandidates(
        spark.readStream.schema(schema).parquet(in),
        lateness = "0 seconds", horizonSeconds = 50 * 60)
      .toDF("doc_id", "band", "hit")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // phase 1: tA docs 2 then 1 OUT of order in one batch (min-id ⇒
    // 1 false, 2 true), tC doc 3 alone at t0 — its horizon (t0+50min)
    // will expire across the restart
    landDocs("a", Seq(Doc(3, ts(0), tC, "en", "web"),
      Doc(1, ts(1), tA, "en", "web"), Doc(2, ts(2), tA, "en", "web")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 lands while the query is DOWN, then a fresh query
    // recovers from the checkpoint:
    //  - doc 4 (tA, t10): hit ⇔ the tA bucket's min-id=1 was RECOVERED
    //    (processed against the recovered watermark t2, so not late)
    //  - doc 5 (tB, t10): fresh bucket, false
    //  - doc 99 (t120): advances the watermark past every horizon
    landDocs("b", Seq(Doc(4, ts(10), tA, "en", "web"),
      Doc(5, ts(10), tB, "en", "web"),
      Doc(99, ts(120), "filler words to advance the watermark only", "en", "web")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // a data-less-for-those-keys batch: horizon timeouts (recovered
      // from the checkpoint) fire for tA/tB/tC — their last activity
      // (t10/t10/t0) + 50 min all sit behind the watermark (t120).
      // Timeouts fire only for keys with no new rows in the batch,
      // hence the separate filler-only file.
      landDocs("c", Seq(
        Doc(100, ts(125), "more filler words advancing time again", "en", "web")))
      q2.processAllAvailable()
      // docs 6 (tC) and 7 (tA): their buckets were evicted by the
      // horizon — doc 3 < 6 and doc 1 < 7 DID share these buckets, but
      // outside the horizon, which is the operator's contract ("a
      // near-dup of anything seen in the last N hours") — so a
      // recovered-then-expired bucket must read as fresh ⇒ false.
      landDocs("d", Seq(Doc(6, ts(126), tC, "en", "web"),
        Doc(7, ts(126), tA, "en", "web")))
      q2.processAllAvailable()
      // and the re-occupied tA bucket serves again: min-id is 7 now
      landDocs("e", Seq(Doc(8, ts(127), tA, "en", "web")))
      q2.processAllAvailable()
      val verdicts = spark.read.parquet(out)
        .groupBy($"doc_id").agg(org.apache.spark.sql.functions.max($"hit").as("hit"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts(1L) == false && verdicts(2L) == true, verdicts)
      assert(verdicts(4L) == true,
        s"tA min-id state lost across restart: $verdicts")
      assert(verdicts(5L) == false, verdicts)
      assert(verdicts(6L) == false,
        s"tC bucket should have expired by horizon across the restart: $verdicts")
      assert(verdicts(7L) == false && verdicts(8L) == true,
        s"expired tA bucket must restart fresh then re-occupy: $verdicts")
      // exactly-once across the restart: every (doc, band) row lands once
      val rows = spark.read.parquet(out).as[(Long, Int, Boolean)].collect().toSeq
      assert(rows.size == rows.toSet.size, "duplicated rows across restart")
    } finally q2.stop()
  }

  test("sessionize closes sessions on gaps and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(input.toDS(), gapSeconds = 1800, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min
      // gap (new session). user 2: one event.
      input.addData(
        Event(1, 1, "view", ts(0), 10),
        Event(2, 1, "click", ts(10), 20),
        Event(3, 2, "view", ts(5), 5))
      q.processAllAvailable()
      input.addData(Event(4, 1, "view", ts(50), 30)) // gap > 30 min for user 1
      q.processAllAvailable()
      // advance event time far enough that every open session times out
      input.addData(Event(99, 9, "view", ts(1000), 0))
      q.processAllAvailable()
      input.addData(Event(100, 9, "view", ts(2000), 0))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .as[UserSession].collect().toSet
      assert(got.contains(UserSession(1, sec(0), sec(10), 2, 30)), got)  // gap-closed
      assert(got.contains(UserSession(1, sec(50), sec(50), 1, 30)), got) // timeout-closed
      assert(got.contains(UserSession(2, sec(5), sec(5), 1, 5)), got)    // timeout-closed
    } finally q.stop()
  }
  test("quotaAdmit charges the per-source budget identically across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // budget 8 tokens; source web sends 3 + 4 + 2 tokens with the
    // budget boundary (7 -> 9) straddling the micro-batch split;
    // source blog proves budgets are independent
    val input = MemoryStream[Doc]
    val q = StreamOps.quotaAdmit(input.toDF(), budgetTokens = 8L)
      .writeStream.format("memory").queryName("quota")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, ts(0), "a b c", "en", "web"),
        Doc(10, ts(0), "w x y z one two three", "en", "blog")) // 7 tokens
      q.processAllAvailable()
      input.addData(
        Doc(2, ts(1), "d e f g", "en", "web"),
        Doc(3, ts(2), "h i", "en", "web"),
        Doc(11, ts(1), "v w", "en", "blog")) // 7 + 2 > 8: rejected
      q.processAllAvailable()
      val got = spark.table("quota")
        .as[(Long, String, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._4, r._5))).toMap
      // the batch rule (used_before + n <= 8) on the merged stream:
      assert(got(1L) == ((0L, true)))
      assert(got(2L) == ((3L, true)))   // 3 + 4 = 7 <= 8
      assert(got(3L) == ((7L, false)))  // 7 + 2 = 9 > 8, across the split
      assert(got(10L) == ((0L, true)))
      assert(got(11L) == ((7L, false))) // blog's own budget, not web's
    } finally q.stop()
  }

  // ---- the composed corpus-ingest capstone -------------------------

  // gate-passing fixtures (>= 10 words, >= 2 stopwords, mean word
  // length in [3, 10], >= 80% alpha); B = A + " omega" is a GENUINE
  // near-dup of A (all 4 MinHash bands collide, digest differs —
  // precomputed against the real md5 band math); C contains the
  // benchmark 5-gram; all other pairs share zero bands
  private val tA = "the quick brown fox jumps over a lazy dog of sorts and more" // 13
  private val tB = tA + " omega" // 14 tokens, near-dup of tA
  private val tC = "the alpha bravo charlie delta echo words flow through a pipeline of stages" // 13
  private val tD = "a data pipeline is made of many stages and the tokens flow through them" // 14
  private val tE = "every corpus needs the careful curation of tokens and sources daily here" // 12
  private val tF = "models train better when the data is clean and the splits hold firm" // 13
  private val tG = "another set of clean sentences for the quota to charge against today" // 12
  private val tH = "blogs write about the craft of coding and shipping software to users" // 12

  test("ingestCorpus composes gate+decon+dedup+quota with pipe_llm_corpus semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bits = graft.ops.Text.bloomBitsOf(
      Seq("alpha bravo charlie delta echo").toDF("g"))
    val input = MemoryStream[Doc]
    val guardKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val q = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.ingestCorpus(input.toDF(), bits, budgetTokens = 30L)
        .writeStream.format("memory").queryName("ingest")
        .outputMode(OutputMode.Append()).start()
    }
    // the disable is SCOPED to the start: the session keeps Spark's
    // chained-stateful guard for every later streaming query
    assert(spark.conf.get(guardKey) == "true",
      "chained-stateful guard must be restored after a scoped start")
    try {
      // splits by the md5(doc_id) rule: ids 1-5 and 7-10 are train,
      // id 6 is test — chosen so every charging case is exercised
      input.addData(
        Doc(1, ts(0), tA, "en", "web"), // curated train: charges, admitted
        Doc(2, ts(1), "x y z", "en", "web"), // fails the gate
        Doc(3, ts(2), tA, "en", "web"), // exact dup of 1
        Doc(4, ts(3), tB, "en", "web"), // NEAR dup of 1 (bands, not digest)
        Doc(5, ts(4), tC, "en", "web"), // benchmark-contaminated
        Doc(6, ts(5), tD, "en", "web"), // curated but test split: no charge
        Doc(7, ts(6), tE, "en", "web")) // charges: 13 + 12 = 25 <= 30
      q.processAllAvailable()
      input.addData(
        Doc(8, ts(10), tF, "en", "web"), // charges past budget: 25+13 > 30
        Doc(9, ts(11), tG, "en", "web"), // still charging: before = 38
        Doc(10, ts(12), tH, "en", "blog")) // blog's own fresh budget
      q.processAllAvailable()
      val got = spark.table("ingest").as[IngestVerdict]
        .collect().map(v => v.doc_id -> v).toMap
      assert(got.size == 10)
      // the pipe_llm_corpus per-doc semantics, replayed by hand:
      assert(got(1L) == IngestVerdict(1, "web", "train", 13, true, true, false, 0, true))
      assert(got(2L) == IngestVerdict(2, "web", "train", 3, false, true, false, 13, false))
      assert(got(3L) == IngestVerdict(3, "web", "train", 13, true, false, false, 13, false))
      assert(got(4L) == IngestVerdict(4, "web", "train", 14, true, false, false, 13, false))
      assert(got(5L) == IngestVerdict(5, "web", "train", 13, true, true, true, 13, false))
      assert(got(6L) == IngestVerdict(6, "web", "test", 14, true, true, false, 13, false))
      assert(got(7L) == IngestVerdict(7, "web", "train", 12, true, true, false, 13, true))
      assert(got(8L) == IngestVerdict(8, "web", "train", 13, true, true, false, 25, false))
      assert(got(9L) == IngestVerdict(9, "web", "train", 12, true, true, false, 38, false))
      assert(got(10L) == IngestVerdict(10, "blog", "train", 12, true, true, false, 0, true))
      // cross-check the split rule against the batch capstone's SQL rule
      Seq(1L, 6L, 10L).foreach { id =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val want = hex.head match {
          case '0' => "val"; case '1' => "test"; case _ => "train"
        }
        assert(got(id).split == want, s"split rule drift at doc $id")
      }
    } finally q.stop()
  }

  test("ingestCorpus on the sf0.01 fixture: batch parity with pipe_llm_corpus where the rules coincide") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit, md5, min, size}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.01"
    // ---- batch side: the capstone's per-doc verdicts (budget 800) ----
    val batch = graft.SparkEntry.queries("pipe_llm_corpus")(spark, dir)
      .collect().map { r =>
        (r.getLong(r.fieldIndex("doc_id")),
          (r.getString(r.fieldIndex("source")),
            r.getInt(r.fieldIndex("quality_pass")) == 1,
            r.getInt(r.fieldIndex("kept")) == 1,
            r.getString(r.fieldIndex("split")),
            r.getLong(r.fieldIndex("n_tokens")),
            r.getLong(r.fieldIndex("used_before")),
            r.getInt(r.fieldIndex("admitted")) == 1))
      }.toMap
    // ---- stream side: the REAL 500 docs, in order. documents carries
    // no timestamp, so ts is synthesized monotone in doc_id — which
    // makes the stream's (ts, doc_id) quota order provably equal the
    // batch window's ORDER BY doc_id. The decon reference is one bogus
    // 5-gram (pipe_llm_corpus has no decon stage; flagged must stay
    // false so the two charging rules coincide). ----
    val docsDF = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val docs = docsDF.collect().map { r =>
      Doc(r.getLong(0), ts(r.getLong(0)), r.getString(1), r.getString(2), r.getString(3))
    }.sortBy(_.doc_id)
    assert(docs.length == batch.size)
    val bits = graft.ops.Text.bloomBitsOf(
      Seq("qqqxyzzy plugh waldo fnord grault").toDF("g"))
    val input = MemoryStream[Doc]
    val q = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.ingestCorpus(input.toDF(), bits, budgetTokens = 800L)
        .writeStream.format("memory").queryName("ingest_fixture")
        .outputMode(OutputMode.Append()).start()
    }
    val got =
      try {
        docs.grouped(100).foreach { chunk => // 5 real micro-batches
          input.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
        spark.table("ingest_fixture").as[IngestVerdict]
          .collect().map(v => v.doc_id -> v).toMap
      } finally q.stop()
    assert(got.size == docs.length, "one verdict per doc")

    // ---- 1. the dedup STATE MACHINE ≡ the band math, whole fixture:
    // arrival in id order makes stream-kept(d) ⟺ no smaller-id doc
    // shares any of d's five buckets (4 MinHash bands + digest), a
    // predicate recomputable batch-side from the shared definitions ----
    val tsDocs = docsDF.withColumn("ts", lit(ts(0)))
    val allKeys = StreamOps.bandKeys(tsDocs).select(col("doc_id"), col("band"), col("bkey"))
      .unionByName(tsDocs.select(col("doc_id"), lit(4).as("band"),
        md5(coalesce(col("text"), lit(""))).as("bkey")))
    val collided = allKeys
      .join(allKeys.groupBy(col("band"), col("bkey")).agg(min(col("doc_id")).as("mn")),
        Seq("band", "bkey"))
      .filter(col("doc_id") > col("mn"))
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    docs.foreach { d =>
      assert(got(d.doc_id).kept == !collided(d.doc_id),
        s"dedup state drift vs band math at doc ${d.doc_id}")
    }

    // ---- 2. per-doc field parity where the rules are the same rule ----
    var bothKept = 0
    docs.foreach { d =>
      val s = got(d.doc_id); val b = batch(d.doc_id)
      assert(s.quality_pass == b._2, s"gate vs gopher quality drift at doc ${d.doc_id}")
      assert(!s.flagged, s"bogus decon reference flagged doc ${d.doc_id}")
      assert(s.n_tokens >= b._5,
        s"scrub may only REMOVE tokens (doc ${d.doc_id}: ${s.n_tokens} < ${b._5})")
      if (s.kept && b._3) {
        bothKept += 1
        // kept ⇒ batch cluster_id = doc_id ⇒ md5(cluster) ≡ md5(doc_id)
        assert(s.split == b._4, s"split rules must coincide on kept doc ${d.doc_id}")
      }
    }
    assert(bothKept >= 100, s"parity subset vacuously small: $bothKept")
    assert(docs.exists(d => !got(d.doc_id).kept), "no dup ever dropped — vacuous")

    // ---- 3. quota parity per source, on the agreed PREFIX: walking
    // docs in order, used_before/admitted must match EXACTLY until the
    // first doc whose charging behaviour legitimately diverges (kept
    // divergence — stream min-id vs batch verified-cluster — or a
    // scrub-shortened token count); after that the running budgets
    // separate and comparison stops for that source. ----
    var crossingSources = 0
    var chargedPastBoundary = 0
    docs.groupBy(_.source).foreach { case (src, srcDocs) =>
      var aligned = true
      var sawBoundary = false
      srcDocs.sortBy(_.doc_id).foreach { d =>
        if (aligned) {
          val s = got(d.doc_id); val b = batch(d.doc_id)
          assert(s.used_before == b._6,
            s"quota drift at doc ${d.doc_id} of $src before any divergence")
          val chargeB = b._2 && b._3 && b._4 == "train"
          val chargeS = s.quality_pass && s.kept && !s.flagged && s.split == "train"
          if (chargeB != chargeS || (chargeB && s.n_tokens != b._5)) {
            aligned = false // documented divergence class; budgets separate
          } else if (chargeB) {
            assert(s.admitted == b._7, s"admission drift at doc ${d.doc_id} of $src")
            if (!s.admitted) { // a charging doc past the 800 boundary
              if (!sawBoundary) crossingSources += 1
              sawBoundary = true
            } else if (sawBoundary) {
              fail(s"doc ${d.doc_id} of $src admitted after the boundary crossed")
            }
            if (sawBoundary && s.used_before > 800) chargedPastBoundary += 1
          } else {
            assert(!s.admitted && !b._7, s"non-charging doc ${d.doc_id} admitted")
          }
        }
      }
    }
    assert(crossingSources >= 1,
      "no source crossed its 800-token boundary inside the agreed prefix — vacuous")
    assert(chargedPastBoundary >= 1,
      "charge-past-boundary semantics never exercised on the fixture")
  }

  test("ingestCorpus leaves the chained-stateful guard ARMED: an unscoped start fails analysis") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bits = graft.ops.Text.bloomBitsOf(Seq("alpha bravo").toDF("g"))
    val input = MemoryStream[Doc]
    // building the Dataset must not touch the conf; only a start
    // inside withChainedStatefulGuardDisabled may pass analysis
    val ds = StreamOps.ingestCorpus(input.toDF(), bits)
    val err = intercept[Exception] {
      val q = ds.writeStream.format("memory").queryName("ingest_unscoped")
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(err.getMessage.toLowerCase.contains("correctness"),
      s"expected Spark's chained-stateful correctness guard, got: ${err.getMessage}")
  }

  test("ingestCorpus quota and dedup state survive a kill-restart mid-budget") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ingest-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    val bits = graft.ops.Text.bloomBitsOf(
      Seq("alpha bravo charlie delta echo").toDF("g"))
    val schema = Seq.empty[Doc].toDF().schema
    def landDocs(file: String, docs: Seq[Doc]): Unit = {
      docs.toDF().coalesce(1).write.mode("overwrite").parquet(s"$work/stage-$file")
      val staged = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/stage-$file")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staged.head),
        java.nio.file.Paths.get(s"$in/$file.parquet"))
    }
    def start() = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.ingestCorpus(
          spark.readStream.schema(schema).parquet(in), bits,
          budgetTokens = 30L, lateness = "0 seconds")
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    }
    // phase 1: two charged docs spend 25 of the 30-token budget
    landDocs("a", Seq(Doc(1, ts(0), tA, "en", "web"),
      Doc(7, ts(1), tE, "en", "web")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 lands while the query is DOWN; the restart must recover
    // BOTH state families: the source budget (25 spent) and the dedup
    // min-id buckets (doc 1's digest + bands)
    landDocs("b", Seq(
      Doc(3, ts(10), tA, "en", "web"), // exact dup of PRE-restart doc 1
      Doc(8, ts(11), tF, "en", "web"), // budget boundary: 25 + 13 > 30
      Doc(9, ts(12), tG, "en", "web"),
      Doc(20, ts(13), tH, "en", "blog"))) // fresh source: own budget
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[IngestVerdict]
        .collect().map(v => v.doc_id -> v).toMap
      assert(got.size == 6, s"exactly-once across restart: $got")
      assert(got(1L).admitted && got(1L).used_before == 0, got(1L))
      assert(got(7L).admitted && got(7L).used_before == 13, got(7L))
      assert(!got(3L).kept,
        s"dedup min-id state lost across restart: ${got(3L)}")
      assert(got(3L).used_before == 25, got(3L))
      assert(!got(8L).admitted && got(8L).used_before == 25,
        s"quota state lost across restart: ${got(8L)}")
      assert(!got(9L).admitted && got(9L).used_before == 38, got(9L))
      assert(got(20L).admitted && got(20L).used_before == 0, got(20L))
    } finally q2.stop()
  }

  test("dupGramCandidates flags cross-doc quotes and within-doc repeats, across batches") {
    // P is an 8-word phrase = exactly one gram. Doc 1 (batch 1)
    // carries its FIRST occurrence (must emit hit = false); doc 4's
    // quote arrives in batch 2 (hit = true — the state crossed the
    // micro-batch boundary); doc 5 repeats P within itself at
    // positions 0 and 9 (first false, second true — the batch
    // "count >= 2" rule covers within-doc repetition, which a
    // doc-id-keyed state would miss). Every other gram is unique:
    // its occurrence must emit hit = false, not be dropped.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val P = "g1 g2 g3 g4 g5 g6 g7 g8"
    val input = MemoryStream[Doc]
    val q = StreamOps.dupGramCandidates(input.toDF(), lateness = "0 seconds")
      .writeStream.format("memory").queryName("dupgrams")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, ts(1), s"a1 a2 $P a3 a4", "en", "web"), // P at pos 2
        Doc(2, ts(2), "b1 b2 b3 b4 b5 b6 b7 b8 b9", "en", "web"))
      q.processAllAvailable()
      input.addData(
        Doc(4, ts(3), s"c1 $P c2 c3", "en", "mirror"), // P at pos 1
        Doc(5, ts(4), s"$P x9 $P", "en", "web")) // P at 0 AND 9
      q.processAllAvailable()
      val got = spark.table("dupgrams").as[(Long, Int, Boolean)].collect()
      val hits = got.filter(_._3).map(r => (r._1, r._2)).toSet
      assert(hits == Set((4L, 1), (5L, 0), (5L, 9)),
        s"hits: $hits\nall: ${got.mkString("\n")}")
      // batch parity: the flagged occurrences are EXACTLY the gram
      // occurrences the batch dup rule (count >= 2 over these docs,
      // in-order ingest) marks, minus the unretractable first
      // occurrence of each duplicated gram — here P@doc1 alone
      // every gram occurrence emitted exactly once: docs of 12, 9,
      // 11 and 17 words yield (len - 7) occurrences each
      assert(got.length == 5 + 2 + 4 + 10)
      assert(got.filter(r => r._1 == 1L && r._2 == 2).head._3 == false)
    } finally q.stop()
  }

  test("packOccurrence: monotone in (doc_id, pos), loud failure past the 2^21 bound") {
    assert(StreamOps.packOccurrence(3L, 5) == ((3L << 21) | 5L))
    assert(StreamOps.packOccurrence(3L, 5) < StreamOps.packOccurrence(3L, 6))
    // max pos of one doc still orders below pos 0 of the next doc
    assert(StreamOps.packOccurrence(3L, (1 << 21) - 1) <
      StreamOps.packOccurrence(4L, 0))
    // the aliasing cases fail LOUDLY instead of wrapping the mask
    intercept[IllegalArgumentException](StreamOps.packOccurrence(3L, 1 << 21))
    intercept[IllegalArgumentException](StreamOps.packOccurrence(3L, -1))
    // ...and so does a doc_id past the 42-bit budget (the << 21 shift
    // would overflow into the sign bit and reorder occurrence ids)
    assert(StreamOps.packOccurrence((1L << 42) - 1, 5) > 0)
    intercept[IllegalArgumentException](StreamOps.packOccurrence(1L << 42, 0))
    intercept[IllegalArgumentException](StreamOps.packOccurrence(-1L, 0))
  }

  test("kmvUsersHourly: cross-batch dedup, bottom-k parity, exact small windows") {
    // Window 0 sees users 1..6 split over TWO micro-batches, with user
    // 1 in BOTH — the state merge must dedup by hash before eviction
    // (the streaming face of pipe_bottomk_merge's both-sides pin), and
    // the emitted sketch must equal the bottom-3 of md5("1")..md5("6")
    // computed here from first principles. Window 1 holds a single
    // user: k_used = 1 and the estimate is the EXACT count.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val input = MemoryStream[Event]
    val q = StreamOps.kmvUsersHourly(input.toDF(), lateness = "0 seconds", k = 3)
      .writeStream.format("memory").queryName("ev_kmv")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "view", ts(5), 0), Event(2, 2, "view", ts(10), 0),
        Event(3, 3, "view", ts(15), 0))
      q.processAllAvailable() // micro-batch 1: users 1,2,3 in window 0
      input.addData(
        Event(4, 1, "view", ts(20), 0), // user 1 AGAIN — must dedup
        Event(5, 4, "view", ts(25), 0), Event(6, 5, "view", ts(30), 0),
        Event(7, 6, "view", ts(35), 0),
        Event(8, 7, "view", ts(70), 0)) // window 1: its only user
      q.processAllAvailable()
      input.addData(Event(9, 9, "view", ts(190), 0)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("ev_kmv").as[KmvSampleRow].collect()
      val w0 = got.filter(_.window_start == ts(0)).sortBy(_.rk)
      val expected = (1 to 6).map(u => md5hex(u.toString) -> u.toLong)
        .sortBy(_._1).take(3)
      assert(w0.map(_.h).toSeq == expected.map(_._1), w0.mkString("\n"))
      assert(w0.map(_.user_id).toSeq == expected.map(_._2)) // hash->id aligned
      assert(w0.forall(_.k_used == 3))
      val expEst = 2L * 4294967296L /
        java.lang.Long.parseLong(expected.last._1.substring(0, 8), 16)
      assert(w0.head.ndv_est == expEst)
      val w1 = got.filter(_.window_start == ts(60))
      assert(w1.length == 1 && w1.head.user_id == 7L &&
        w1.head.k_used == 1 && w1.head.ndv_est == 1L, w1.mkString("\n"))
    } finally q.stop()
  }

  test("kmvUsersHourly parity: closed windows equal the registered ev_kmv_users rows") {
    // The batch twin is the DuckDB-oracled ev_kmv_users query — every
    // window the stream closes must match its rows FIELD-FOR-FIELD
    // (sample hashes, user ids, k_used, estimate), which puts the
    // streaming sketch's math under the oracle, the way the HLL parity
    // test above anchors approxUsersHourly to ev_approx_users.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("ev_kmv_users")(spark, dir).collect()
      .map(r => ((r.getLong(r.fieldIndex("epoch_hour")),
        r.getString(r.fieldIndex("event_type")),
        r.getInt(r.fieldIndex("rk")))) ->
        ((r.getString(r.fieldIndex("h")), r.getLong(r.fieldIndex("user_id")),
          r.getInt(r.fieldIndex("k_used")),
          r.getLong(r.fieldIndex("ndv_est"))))).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ev-kmv-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val src = spark.readStream.schema(raw.schema).parquet(streamDir.toString)
    val stream = src.select(
      graft.ops.Events.tsTimestampOf(src).as("ts"),
      col("event_type"), col("user_id"))
    val q = StreamOps.kmvUsersHourly(stream, lateness = "0 seconds")
      .writeStream.format("memory").queryName("ev_kmv_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_kmv_parity").as[KmvSampleRow].collect()
        .map(r => ((r.window_start.getTime / 3600000L, r.event_type, r.rk)) ->
          ((r.h, r.user_id, r.k_used, r.ndv_est))).toMap
      got.foreach { case (k, v) =>
        assert(batch.get(k).contains(v), s"row $k: stream=$v batch=${batch.get(k)}")
      }
      // all but the watermark-open tail must have emitted
      val maxHour = batch.keys.map(_._1).max
      val mustEmit = batch.keys.filter(_._1 + 1 < maxHour)
      mustEmit.foreach { k =>
        assert(got.contains(k), s"window $k closed but never emitted")
      }
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("kmvOverlapHourly: full-sketch pair algebra from first principles, k=3") {
    // Window 0, two types sharing users: view sees 1..6, click sees
    // 1..4 — both sketches FULL at k=3, so the theta estimator (not
    // the exact small-union path) is what the assertion pins. Expected
    // values are derived here from first principles (md5 sort + the
    // Beyer 2007 arithmetic), independently of kmvPairStats.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val input = MemoryStream[Event]
    val q = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.kmvOverlapHourly(input.toDF(), lateness = "0 seconds", k = 3)
        .writeStream.format("memory").queryName("ev_kmv_overlap_s")
        .outputMode(OutputMode.Append()).start()
    }
    try {
      input.addData(
        (1L to 6L).map(u => Event(u, u, "view", ts(u), 0)) ++
          (1L to 4L).map(u => Event(10 + u, u, "click", ts(30 + u), 0)): _*)
      q.processAllAvailable()
      input.addData(Event(99, 99, "error", ts(190), 0)) // advance watermark
      q.processAllAvailable()
      input.addData(Event(100, 99, "error", ts(400), 0))
      q.processAllAvailable()
      val got = spark.table("ev_kmv_overlap_s").as[KmvOverlapRow].collect()
        .filter(_.window_start == ts(0))
      assert(got.length == 1, got.toSeq.mkString("\n"))
      val r = got.head
      assert(r.type_a == "click" && r.type_b == "view")
      // first principles: per-type bottom-3 samples, union, bottom-3
      val sView = (1 to 6).map(u => md5hex(u.toString)).sorted.take(3)
      val sClick = (1 to 4).map(u => md5hex(u.toString)).sorted.take(3)
      val union = (sView.toSet ++ sClick.toSet).toSeq.sorted
      val top = union.take(3)
      val expBoth = top.count(h => sView.contains(h) && sClick.contains(h)).toLong
      val theta = java.lang.Long.parseLong(top.last.substring(0, 8), 16)
      val expUnion =
        if (union.size < 3) union.size.toLong else 2L * 4294967296L / theta
      val expInter =
        if (union.size < 3) expBoth else expBoth * expUnion / 3
      assert(r.k_used == top.size && r.n_both == expBoth, r)
      assert(r.union_est == expUnion && r.inter_est == expInter, r)
      assert(r.jaccard_ppm == expBoth * 1000000L / top.size, r)
      assert(union.size >= 3, "fixture must exercise the FULL-sketch path")
    } finally q.stop()
  }

  test("kmvOverlapHourly parity: a closed window equals the oracled batch ev_kmv_overlap") {
    // The batch op is global over its fixture; restricting the fixture
    // to ONE hour (plus a same-(type, user) sentinel in a later hour,
    // which changes no per-type distinct set but advances the
    // watermark past the hour) makes the global batch computation and
    // the per-window streaming one range over identical per-type user
    // sets — so every pair row must match FIELD-FOR-FIELD, putting the
    // streaming pair math under the DuckDB oracle the way the KMV
    // sample parity test above anchors kmvUsersHourly.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val hourSec = 473632L * 3600
    val hour = raw.filter(unix_timestamp(col("ts")).between(hourSec, hourSec + 3599))
    // sentinel: a (type, user) pair the hour already contains, 2 h later
    val seed = hour.select(col("event_type"), col("user_id")).head()
    val sentinel = hour.limit(1)
      .withColumn("ts", timestamp_seconds(lit(hourSec + 7200)))
      .withColumn("event_type", lit(seed.getString(0)))
      .withColumn("user_id", lit(seed.getLong(1)))
    val work = java.nio.file.Files.createTempDirectory("graft-kmv-ov-")
    hour.unionByName(sentinel).coalesce(1).write.mode("overwrite")
      .parquet(s"$work/events.parquet")
    val batch = graft.SparkEntry.queries("ev_kmv_overlap")(spark, work.toString)
      .collect()
      .map(r => ((r.getString(0), r.getString(1))) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val src = spark.readStream.schema(raw.schema).parquet(s"$work/events.parquet")
    val stream = src.select(graft.ops.Events.tsTimestampOf(src).as("ts"),
      col("event_type"), col("user_id"))
    val q = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.kmvOverlapHourly(stream, lateness = "0 seconds")
        .writeStream.format("memory").queryName("ev_kmv_overlap_parity")
        .outputMode(OutputMode.Append()).start()
    }
    try {
      q.processAllAvailable()
      val got = spark.table("ev_kmv_overlap_parity").as[KmvOverlapRow].collect()
        .filter(_.window_start.getTime == hourSec * 1000)
      assert(got.nonEmpty, "the pinned hour emitted no pair rows")
      // 5 event types in hour 473632 → all 10 pairs must have closed
      assert(got.length == batch.size,
        s"stream closed ${got.length} pairs, batch has ${batch.size}")
      got.foreach { r =>
        val v = (r.k_used, r.n_both, r.union_est, r.inter_est, r.jaccard_ppm)
        assert(batch.get((r.type_a, r.type_b)).contains(v),
          s"(${r.type_a}, ${r.type_b}): stream=$v batch=${batch.get((r.type_a, r.type_b))}")
      }
    } finally q.stop()
  }

  test("kmvOverlapHourly state survives a kill-restart between sample and pair emission") {
    // Phase 1 lands half of each type's users and stops the query with
    // the window OPEN (stage-1 KMV state mid-sketch). Phase 2 lands
    // the rest plus the watermark-advancing tail, restarts from the
    // checkpoint, and the emitted pair must equal the uninterrupted
    // computation over BOTH phases — recovered sketches, not reset.
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val work = java.nio.file.Files.createTempDirectory("graft-kmv-ov-restart-")
    val (in, out, ckpt) = (s"$work/in", s"$work/out", s"$work/ckpt")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    val schema = Seq.empty[Event].toDF().schema
    def start() = StreamOps.withChainedStatefulGuardDisabled(spark) {
      StreamOps.kmvOverlapHourly(
          spark.readStream.schema(schema).parquet(in), lateness = "0 seconds", k = 3)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    }
    val phase1 = Seq(Event(1, 1, "view", ts(5), 0), Event(2, 2, "view", ts(6), 0),
      Event(3, 1, "click", ts(7), 0), Event(4, 3, "click", ts(8), 0))
    landFile(work, in, "a", phase1)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val phase2 = Seq(Event(5, 5, "view", ts(20), 0), Event(6, 6, "view", ts(21), 0),
      Event(7, 4, "click", ts(22), 0), Event(8, 2, "click", ts(23), 0),
      Event(9, 99, "error", ts(190), 0))
    landFile(work, in, "b", phase2)
    val q2 = start()
    try {
      q2.processAllAvailable()
      landFile(work, in, "c", Seq(Event(10, 99, "error", ts(400), 0)))
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[KmvOverlapRow].collect()
        .filter(r => r.window_start == ts(0) &&
          r.type_a == "click" && r.type_b == "view")
      assert(got.length == 1, s"pair must emit exactly once: ${got.toSeq}")
      // uninterrupted expectation over both phases, from first principles
      val sView = Seq(1, 2, 5, 6).map(u => md5hex(u.toString)).sorted.take(3)
      val sClick = Seq(1, 3, 4, 2).map(u => md5hex(u.toString)).sorted.take(3)
      val (kU, nB, uE, iE, jP) = StreamOps.kmvPairStats(sView, sClick, 3)
      val r = got.head
      assert((r.k_used, r.n_both, r.union_est, r.inter_est, r.jaccard_ppm) ==
        ((kU, nB, uE, iE, jP)), r)
      // and the sketches were truly cross-phase: a reset phase-2-only
      // view sketch would be {5,6}'s hashes, not the 4-user bottom-3
      assert(sView != Seq(5, 6).map(u => md5hex(u.toString)).sorted.take(3))
    } finally q2.stop()
  }
}
