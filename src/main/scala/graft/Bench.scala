package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line `{"metric":"total",...}` on stdout.
  *
  * Two modes:
  *
  *  - ORCHESTRATOR (the default): groups the registered queries by
  *    family (q/tx/ss/ev/dd/md/pipe/mm) and runs each family in a
  *    FRESH CHILD JVM, then merges the children's JSON artifacts into
  *    the single-line contract output. Why (measured, round 8): a
  *    single JVM running all 172 queries accumulates heap/GC/
  *    code-cache state that distorts the suite TAIL — tx_rolling_hash
  *    read 40.0 s at sf10 in-suite vs 5.8 s isolated in a fresh JVM,
  *    a 7× artifact of the HARNESS, not the plan, and per-query
  *    numbers that depend on suite position cannot certify scale
  *    ratios. tools/check.py got child-process isolation in round 8
  *    for the same class of failure (DuckDB allocator state on the
  *    tail); this gives the Spark side the same discipline at family
  *    granularity: ~8 children, each ≤ ~31 queries, so accumulation
  *    is bounded while the per-run overhead stays ~8 JVM+session
  *    startups instead of 172. Children run SEQUENTIALLY (concurrent
  *    local[32] sessions would contend for every core and measure
  *    each other). Memoized indexes (TrainMemo) are per-JVM, so a
  *    family that trains a model pays for it inside its own child —
  *    cross-family memo sharing (e.g. dd_* reading a model an ss_*
  *    query trained) no longer hides the cost, which is the honest
  *    accounting for per-family numbers.
  *
  *    SPARK_GRAFT_ISOLATE=query  → one child per query (full
  *    isolation — the re-measure tool for suspected harness
  *    artifacts; ~172 JVM startups, dev use);
  *    SPARK_GRAFT_ISOLATE=none   → the legacy single-JVM loop.
  *
  *  - CHILD (SPARK_GRAFT_CHILD=1, set by the orchestrator): the
  *    original in-process loop over SPARK_GRAFT_ONLY, writing its
  *    line to SPARK_GRAFT_OUT (a per-family temp file the parent
  *    merges).
  *
  * Two round-11 harness-budget fixes (round 10's driver bench hit its
  * time limit and shipped NO artifact): the orchestrator flushes the
  * merged artifact after EVERY family (a timeout now leaves partial
  * per-query data tagged `"partial":true`), and the min-of-N re-run
  * is ADAPTIVE — only queries whose first run is ≥
  * SPARK_GRAFT_MIN2_THRESHOLD (default 0.3 s since r15; 1.0 before)
  * re-run, cutting the re-measure cost of the fast tail nobody
  * compares.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val isolate = sys.env.getOrElse("SPARK_GRAFT_ISOLATE", "family")
    if (sys.env.contains("SPARK_GRAFT_CHILD") || isolate == "none")
      runInProcess()
    else orchestrate(isolate)
  }

  private def f(v: Double): String =
    "%.4f".formatLocal(java.util.Locale.ROOT, v)

  /** Ambient-noise canary: a fixed, deterministic, single-threaded
    * CPU loop (2^25 xorshift64 steps, ~40 ms on an idle core) timed at
    * bench start and end. Two rounds running, driver-side and
    * builder-side runs of IDENTICAL code disagreed by a uniform
    * 25-30% (median per-query ratio 1.28× spread across untouched
    * families — machine load, not plans), and proving that each time
    * cost a ratio-distribution analysis. The canary puts the
    * machine's speed IN the artifact: readers normalize totals by
    * canary ratio instead of re-deriving ambient load forensically.
    */
  private def canaryMs(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 25)) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    // sink the value so the loop cannot be dead-code-eliminated
    if (x == 42L) System.err.println("canary")
    (System.nanoTime() - t0) / 1e6
  }

  private def canaryJson(samples: Seq[Double]): String =
    if (samples.isEmpty) ""
    else s""","canary_ms":[${samples.map(f).mkString(",")}]"""

  /** Multi-core canary: the same xorshift loop on EVERY bench core at
    * once, reporting wall ms. The single-threaded canary cannot see
    * co-tenant load that leaves one core idle-ish but starves a
    * 32-thread stage — r14's driver run recorded canary_ms 73-80 (clean)
    * while six untouched queries read 2-3× their r13 numbers at 32
    * cores and none of it reproduced on re-runs (r15 adjudication,
    * OPTIMIZATION_r15.md §1). par/serial ≫ 1 on a quiet machine is
    * normal only insofar as SMT/turbo bite; a mid-run JUMP in the par
    * samples is the contention signature readers need. */
  private def canaryParMs(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + tid
        var i = 0
        while (i < (1 << 25)) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        if (x == 42L) System.err.println("canary")
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  private def canaryParJson(samples: Seq[Double]): String =
    if (samples.isEmpty) ""
    else s""","canary_par_ms":[${samples.map(f).mkString(",")}]"""

  /** q1..q28 share the "q" family; everything else groups on the
    * prefix before the first underscore (tx, ss, ev, dd, md, pipe,
    * mm). */
  private[graft] def familyOf(name: String): String =
    if (name.length > 1 && name(0) == 'q' && name(1).isDigit) "q"
    else name.takeWhile(_ != '_')

  private def orchestrate(isolate: String): Unit = {
    import scala.jdk.CollectionConverters._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    val groups: Seq[(String, Seq[String])] =
      if (isolate == "query") names.map(n => n -> Seq(n))
      else names.groupBy(familyOf).toSeq.sortBy(_._1)
        .map { case (k, v) => k -> v.sorted }
    // children replicate this JVM exactly: same binary, same flags
    // (add-opens, -Xmx, code-cache — all injected by build.sbt's fork),
    // same classpath; -cp variants are filtered out defensively since
    // the classpath travels explicitly
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-cp") || a.startsWith("-classpath"))
    val cp = sys.props("java.class.path")
    val tmpDir = java.nio.file.Files.createTempDirectory("graftbench")
    def toD(v: JValue): Double = v match {
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case _ => 0.0
    }
    var queries = Vector.empty[(String, Double)]
    var failed = Vector.empty[String]
    var runsAll = Vector.empty[(String, Seq[Double])]
    var coldQueries = Vector.empty[(String, Double)] // per-query cold (r14 verdict #6)
    var coldTotal = 0.0 // accumulated from each child's cold_total
    // chronological canary samples: parent start, each child's two
    // (start/end of that family's JVM), parent end — a reader sees
    // WHEN during the run the machine slowed, not just that it did
    var canaries = Vector(canaryMs())
    val benchCpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var canariesPar = Vector(canaryParMs(benchCpus))
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT", "docs/bench_latest.json")
    // merged-artifact line over everything collected SO FAR. Written
    // after EVERY family (partial: true) and once at the end (no
    // partial key): round 10's driver bench timed out (rc=124) and,
    // because the merge only flushed at the end, the round shipped
    // with ZERO per-query data — a timeout must degrade to partial
    // data, not none.
    def mergedLine(partial: Boolean): String = {
      val failedSet = failed.toSet
      val qsSorted = queries.sortBy(_._1)
      val total = qsSorted.collect {
        case (n, t) if !failedSet(n) => t
      }.sum
      val qs = qsSorted.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      val failedJson =
        if (failed.isEmpty) ""
        else failed.sorted.map("\"" + _ + "\"")
          .mkString(""","failed":[""", ",", "]")
      val runsJson =
        if (runsAll.isEmpty) ""
        else runsAll.sortBy(_._1).map { case (k, ts) =>
          "\"" + k + "\":[" + ts.map(f).mkString(",") + "]"
        }.mkString(""","runs":{""", ",", "}")
      val partialJson = if (partial) ""","partial":true""" else ""
      // per-query COLD times (first successful run): the memoized
      // families' headline min-of-N numbers are warm serving costs —
      // dd_dup_clusters at 0.14 s is a memo hit whose build cost moved
      // into whichever family consumer ran first. cold_total disclosed
      // the aggregate since r13; this keys it per query so every
      // memo-amortized number stays auditable (r14 verdict #6;
      // additions-only — consumers of "queries" are untouched).
      val coldJson =
        if (coldQueries.isEmpty) ""
        else coldQueries.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f(v) }
          .mkString(""","cold_queries":{""", ",", "}")
      s"""{"metric":"total","value":${f(total)},"unit":"sec","cold_total":${f(coldTotal)},"queries":$qs$coldJson$failedJson$runsJson${canaryJson(canaries)}${canaryParJson(canariesPar)}$partialJson,"sf":"$sfDir"}"""
    }
    def flush(line: String): Unit =
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
      catch { case e: Exception => System.err.println(s"[bench] artifact write: $e") }
    groups.foreach { case (gname, qnames) =>
      val outF = tmpDir.resolve(s"$gname.json")
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      // the child's stdout JSON line is redundant with its artifact
      // file; only the PARENT may print to stdout (one-line contract)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val env = pb.environment()
      env.put("SPARK_GRAFT_CHILD", "1")
      env.put("SPARK_GRAFT_ONLY", qnames.mkString(","))
      env.put("SPARK_GRAFT_OUT", outF.toString)
      val rc = pb.start().waitFor()
      val text =
        try new String(java.nio.file.Files.readAllBytes(outF), "UTF-8")
        catch { case _: Exception => "" }
      if (text.trim.isEmpty) {
        // a crashed child (OOM, hard JVM death) fails its whole group
        // loudly — silently dropping a family would read as a speedup.
        // The queries land in "failed" ONLY, never in "queries": a
        // 0.0000 entry there would read as a massive speedup to any
        // round-over-round diff that forgets to consult "failed"
        // (runInProcess's convention — slowest failed elapsed — is a
        // real measurement; a dead child has none to report)
        System.err.println(
          s"[bench] family $gname: child rc=$rc produced no artifact — marking ${qnames.size} queries failed")
        failed ++= qnames
      } else {
        val j = JsonMethods.parse(text)
        j \ "queries" match {
          case JObject(fields) =>
            fields.foreach { case (k, v) => queries :+= (k -> toD(v)) }
          case _ =>
        }
        j \ "failed" match {
          case JArray(xs) => failed ++= xs.collect { case JString(s) => s }
          case _ =>
        }
        j \ "runs" match {
          case JObject(fields) => fields.foreach {
            case (k, JArray(xs)) => runsAll :+= (k -> xs.map(toD))
            case _ =>
          }
          case _ =>
        }
        j \ "cold_queries" match {
          case JObject(fields) =>
            fields.foreach { case (k, v) => coldQueries :+= (k -> toD(v)) }
          case _ =>
        }
        j \ "cold_total" match {
          case v: org.json4s.JValue if v != org.json4s.JNothing => coldTotal += toD(v)
          case _ =>
        }
        j \ "canary_ms" match {
          case JArray(xs) => canaries ++= xs.map(toD)
          case _ =>
        }
        j \ "canary_par_ms" match {
          case JArray(xs) => canariesPar ++= xs.map(toD)
          case _ =>
        }
      }
      flush(mergedLine(partial = true)) // timeout ⇒ partial data, not none
    }
    canaries :+= canaryMs()
    canariesPar :+= canaryParMs(benchCpus)
    val line = mergedLine(partial = false)
    println(line)
    flush(line)
    // Trailing SHORT summary line (round-12 fix): the full merged line
    // above grew past the driver's stdout tail-capture window (~6 KB at
    // 190 queries), so BENCH_r10/r11 recorded `parsed: null` even on
    // rc=0 runs. The LAST stdout line must always fit the window:
    // repeat the headline numbers (total/n/failed/sf) in ~150 bytes.
    // Full per-query data stays in the preceding line and in $outPath.
    // Distinct metric tag ("total_summary", not a second "total"): a
    // consumer that parses the first or every "total" line must not
    // double-count. n_queries counts queries whose time is IN the
    // total (failed ones are excluded from it), so value and n_queries
    // stay consistent.
    val failedSet = failed.toSet
    val total = queries.collect { case (n, t) if !failedSet(n) => t }.sum
    val nTimed = queries.count { case (n, _) => !failedSet(n) }
    // min = the machine's clean speed, max/min = jitter during the run;
    // totals from different machines/runs compare after dividing by
    // canary_min_ms (the summary stays ~150 bytes — see line-size note)
    val canarySummary =
      if (canaries.isEmpty) ""
      else s""","canary_min_ms":${f(canaries.min)},"canary_max_ms":${f(canaries.max)}""" +
        (if (canariesPar.isEmpty) ""
         else s""","canary_par_min_ms":${f(canariesPar.min)},"canary_par_max_ms":${f(canariesPar.max)}""")
    println(
      s"""{"metric":"total_summary","value":${f(total)},"unit":"sec","cold_total":${f(coldTotal)}$canarySummary,"n_queries":$nTimed,"n_failed":${failed.size},"sf":"$sfDir","full":"$outPath"}""")
  }

  private def runInProcess(): Unit = {
    val canaryStart = canaryMs() // before ANY Spark/JIT cost lands
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val canaryParStart = canaryParMs(cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT/codegen/file-index costs land here, not on the
    // alphabetically-first timed query
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.range(1000).selectExpr("md5(CAST(id AS STRING)) AS h")
        .groupBy("h").count().write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // min-of-N (default 2): a single ambient-noise spike (first-touch
    // page cache, JIT, a concurrent process) otherwise reads as a 10×
    // "regression" — BENCH_r02 recorded q5 at 19.5 s that re-ran at
    // 1.48 s. The min is the steady-state cost of the PLAN, which is
    // what round-over-round comparisons need.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt)
    // ADAPTIVE second run: a query whose FIRST run already finished
    // under this threshold gets no re-run — the min exists to kill
    // noise spikes, which only matter on the slow tail, and a spiked
    // fast query's first run lands ABOVE the threshold and re-runs
    // anyway (recovering its true min). Round 10's driver bench timed
    // out (rc=124) with 130 of 181 queries sub-second: their second
    // runs were ~45 s of pure re-measurement of numbers nobody
    // compares. 1.0 s: a spike on a ≤ 1 s query distorts the suite
    // total by ≤ its own size and the per-query diff already treats
    // the sub-second class as noise; the measured full-suite wall at
    // sf0.1 is ~540 s (r10 shape, unconditional min-of-2) → 409 s
    // (0.7) → ~380 s (1.0). Failed runs also retry (a transient crash
    // must not stick). Set to 0 to force unconditional min-of-N.
    // default lowered 1.0 → 0.3 in r15: the r14 driver's false
    // "regressions" (2-3× on untouched sub-second queries, none
    // reproducible) lived exactly in the 0.3-1.0 s single-run class;
    // min-of-2 on it costs ~60 s of suite wall (the suite is ~150 s
    // warm, half its r10 size) and buys ambient-spike immunity on the
    // numbers every round-over-round diff reads. The <0.3 s tail
    // stays single-run — a spike there distorts the total by ≤ its
    // own size and spiked runs land over the threshold and re-run.
    val min2Threshold = sys.env.getOrElse("SPARK_GRAFT_MIN2_THRESHOLD", "0.3").toDouble
    // dev aid: SPARK_GRAFT_ONLY=q1_x,dd_y times a subset while iterating
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val allRuns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // (elapsed, succeeded): a failed run must not contribute its
      // fail-fast elapsed time to the min — min-of-N would otherwise
      // report a 0.1 s crash as a 100× "speedup"
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        // noop sink fully executes the plan (count() can prune projections)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      var times = Vector(once())
      // minOption is None while every run failed → forall true → retry
      while (times.size < runs &&
        times.collect { case (t, true) => t }.minOption
          .forall(_ >= min2Threshold)) times :+= once()
      (name, times)
    }
    val results = allRuns.map { case (name, times) =>
      val good = times.collect { case (t, true) => t }
      // all runs failed: report the SLOWEST failure and mark the query
      // failed in the JSON — a fail-fast crash (e.g. an
      // AnalysisException in 0.08 s) must never read as a speedup
      (name, if (good.nonEmpty) good.min else times.map(_._1).max, good.isEmpty)
    }
    val failed = results.collect { case (n, _, true) => n }
    // 4-decimal (0.1 ms) precision: full double toString made the
    // one-line JSON ~2× longer and the driver's tail capture truncated
    // it to 62 of 143 queries — the artifact must carry ALL of them
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // headline total counts succeeding queries only: a fail-fast (or
    // slow-fail) elapsed time must not skew round-over-round totals —
    // the failure itself is flagged in "failed"
    val total = results.collect { case (_, t, false) => t }.sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // scale-evidence mode (SPARK_GRAFT_REPORT=runs): emit every run's
    // elapsed time per query, in order — run 1 carries the cold cost
    // (index builds, first-touch IO), later runs the warm serving cost.
    // Off by default so the driver's JSON schema stays untouched.
    val runsJson =
      if (sys.env.get("SPARK_GRAFT_REPORT").contains("runs"))
        allRuns.map { case (k, ts) =>
          "\"" + k + "\":[" + ts.map(t => f(t._1)).mkString(",") + "]"
        }.mkString(""","runs":{""", ",", "}")
      else ""
    // cold total = sum of first SUCCESSFUL runs (non-failed queries):
    // the headline min-of-N total is a WARM number — one-time TrainMemo
    // index builds amortize into later runs — and the artifact must
    // disclose what it amortizes (at sf10 the gap is ~1000 s of
    // train-once cost). First SUCCESSFUL, not first: a fail-fast crash
    // (0.08 s) on run 1 of a query that later succeeds would otherwise
    // UNDERSTATE the train-once gap this field exists to disclose.
    val failedSet2 = failed.toSet
    val coldPerQuery = allRuns.collect {
      case (n, ts) if !failedSet2(n) && ts.exists(_._2) =>
        n -> ts.collectFirst { case (t, true) => t }.get
    }
    val coldTotal = coldPerQuery.map(_._2).sum
    // per-query cold alongside the warm min (r14 verdict #6): a memo
    // hit shows as cold ≈ warm on the consumer that hit and the build
    // cost shows on the first consumer's cold — additions-only key.
    val coldJson = coldPerQuery.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString(""","cold_queries":{""", ",", "}")
    val canaries = Seq(canaryStart, canaryMs())
    val canariesPar = Seq(canaryParStart, canaryParMs(cpus.toInt))
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","cold_total":${f(coldTotal)},"queries":$qs$coldJson$failedJson$runsJson${canaryJson(canaries)}${canaryParJson(canariesPar)},"sf":"$sfDir"}"""
    println(line)
    // full-artifact file: the driver's stdout capture keeps only the
    // LAST 2000 chars (BENCH_r06 lost 81 of 143 per-query times), so
    // the complete line also lands in a file — docs/bench_latest.json
    // by default (committed next round: the durable scale record), or
    // SPARK_GRAFT_OUT for explicit runs (docs/bench_sf{1,10}.json).
    // Best-effort: a read-only checkout must not fail the bench.
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "docs/bench_latest.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench] artifact write: $e") }
    spark.stop()
  }
}
