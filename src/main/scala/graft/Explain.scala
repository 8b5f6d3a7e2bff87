package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a registered query's formatted physical plan.
  *
  * {{{ sbt "runMain graft.Explain ss_lsh_neardups [sfDir]" }}}
  *
  * Dump mode (the plan-evidence writer for plans/rNN/):
  * {{{ sbt "runMain graft.Explain dump <outDir> <sfDir> <suffix> q1,q2|all" }}}
  * writes `<outDir>/<name>_<suffix>.txt` per query with the
  * `.explain("formatted")` output. Same env contract as Bench
  * (SPARK_GRAFT_CPUS) so the dumped plan is the plan the bench runs.
  */
object Explain {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dump")) {
      if (args.length < 5) {
        System.err.println(
          "usage: graft.Explain dump <outDir> <sfDir> <suffix> <q1,q2|all>")
        sys.exit(2)
      }
      val Array(_, outDir, sfDir, suffix, namesArg) = args.take(5)
      val names =
        if (namesArg == "all") SparkEntry.queries.keys.toSeq.sorted
        else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val spark = session()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      names.foreach { name =>
        val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        try {
          val txt = formatted(SparkEntry.queries(name)(spark, sfDir))
          java.nio.file.Files.writeString(out, txt)
          println(s"wrote $out")
        } catch {
          case e: Exception => System.err.println(s"[explain] $name: $e")
        }
      }
      spark.stop()
    } else {
      val name = args(0)
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val spark = session()
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      spark.stop()
    }
  }
}
