package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // dev aid: SPARK_GRAFT_ONLY=q1_x,dd_y times a subset while iterating
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val allRuns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // (elapsed, succeeded): a failed run must not contribute its
      // fail-fast elapsed time to the min — min-of-N would otherwise
      // report a 0.1 s crash as a 100× "speedup"
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink fully executes the plan (count() can prune projections)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
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
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
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
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs$failedJson$runsJson,"sf":"$sfDir"}"""
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
