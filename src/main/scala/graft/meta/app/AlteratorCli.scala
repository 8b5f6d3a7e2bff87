package graft.meta.app

import scala.util.{Failure, Success, Try}

import graft.meta.catalog.{CatalogAdapter, SparkSessionCatalog}
import graft.meta.sources.Worklist

/** User-facing CLI mirroring the reference's argument surface
  * (easy_alterator.py:20-154):
  *
  * {{{
  * graft.meta.app.AlteratorCli \
  *   -p <dir>... | -c <config.yaml> -cp <path_key> \
  *   [-fs hql|txt] [-fp <prefix>] [--validate] [--force] \
  *   [--account-id <id>]
  * graft.meta.app.AlteratorCli --sync -src db.tbl -tgt db.tbl \
  *   [-pcheck 0|1] [--validate] [--force]
  * }}}
  *
  * The catalog is Spark's session catalog (Hive metastore when the
  * session has one — the Glue stand-in). `run` takes the adapter as a
  * parameter so tests drive both modes against `InMemoryCatalog`
  * without a metastore.
  */
object AlteratorCli {

  final case class CliConfig(
      paths: Seq[String] = Nil,
      config: Option[String] = None,
      pathKey: Option[String] = None,
      suffix: String = "hql",
      prefix: String = "",
      validate: Boolean = false,
      force: Boolean = false,
      sync: Boolean = false,
      src: Option[String] = None,
      tgt: Option[String] = None,
      partCheck: Boolean = true,
      accountId: String = "",
      emitIcebergDdl: Boolean = false)

  def parse(args: Array[String]): Either[String, CliConfig] = {
    @annotation.tailrec
    def loop(rest: List[String], cfg: CliConfig): Either[String, CliConfig] = rest match {
      case Nil => Right(cfg)
      case ("-p" | "--path") :: tail =>
        val (vals, rem) = tail.span(!_.startsWith("-"))
        if (vals.isEmpty) Left("-p/--path needs at least one directory")
        else loop(rem, cfg.copy(paths = cfg.paths ++ vals))
      case ("-c" | "--config") :: v :: tail => loop(tail, cfg.copy(config = Some(v)))
      case ("-cp" | "--key_for_path") :: v :: tail => loop(tail, cfg.copy(pathKey = Some(v)))
      case ("-fs" | "--file_suffix") :: v :: tail =>
        if (v != "hql" && v != "txt") Left(s"-fs must be hql or txt, got $v")
        else loop(tail, cfg.copy(suffix = v))
      case ("-fp" | "--file_prefix") :: v :: tail => loop(tail, cfg.copy(prefix = v))
      case "--validate" :: tail => loop(tail, cfg.copy(validate = true))
      case "--force" :: tail => loop(tail, cfg.copy(force = true))
      case "--sync" :: tail => loop(tail, cfg.copy(sync = true))
      case ("-src" | "--source_table") :: v :: tail => loop(tail, cfg.copy(src = Some(v)))
      case ("-tgt" | "--target_table") :: v :: tail => loop(tail, cfg.copy(tgt = Some(v)))
      case ("-pcheck" | "--partition_check") :: v :: tail =>
        if (v != "0" && v != "1") Left(s"-pcheck must be 0 or 1, got $v")
        else loop(tail, cfg.copy(partCheck = v == "1"))
      case "--account-id" :: v :: tail => loop(tail, cfg.copy(accountId = v))
      case "--emit-iceberg-ddl" :: tail => loop(tail, cfg.copy(emitIcebergDdl = true))
      case other :: _ => Left(s"Unknown argument: $other")
    }
    loop(args.toList, CliConfig()).flatMap { cfg =>
      if (cfg.sync) {
        if (cfg.src.isEmpty || cfg.tgt.isEmpty) Left("--sync requires -src and -tgt")
        else Right(cfg)
      } else if (cfg.paths.isEmpty && cfg.config.isEmpty)
        Left("one of -p/--path or -c/--config is required")
      else if (cfg.config.nonEmpty && cfg.paths.isEmpty && cfg.pathKey.isEmpty)
        Left("-cp/--key_for_path is required with -c/--config")
      else Right(cfg)
    }
  }

  /** Runs the parsed command against the given catalog; returns the
    * process exit code and prints the report (alterator mode) or the
    * sync summary to stdout.
    */
  def run(cfg: CliConfig, catalog: CatalogAdapter): Int =
    if (cfg.sync) {
      Try(Sync.syncTables(catalog, cfg.src.get, cfg.tgt.get,
        validate = cfg.validate, partCheck = cfg.partCheck, force = cfg.force)) match {
        case Success(res) =>
          println(s"Sync completed successfully: target=${res.target} " +
            s"added=${res.added.size} removed=${res.removed.size} applied=${res.applied}")
          0
        case Failure(e) =>
          System.err.println(s"Error occurred while running sync: ${e.getMessage}")
          1
      }
    } else {
      val fromConfig = cfg.config.map(c =>
        Worklist.readYamlConfig(c, cfg.pathKey.getOrElse("ddl_path")))
      val paths = cfg.paths ++ fromConfig.flatMap(_.ddlPath)
      val tables = fromConfig.map(_.tables).filter(_.nonEmpty)
      Worklist.checkPaths(paths)
      val files = Worklist.filterFiles(paths, cfg.prefix, cfg.suffix, tables)
      val sources = files.map(f => Alterator.DdlSource(f, Worklist.readFile(f)))
      val alterator = new Alterator(catalog, validate = cfg.validate,
        force = cfg.force, emitIcebergDdl = cfg.emitIcebergDdl)
      // no --account-id ⇒ the reference's provider chain (S9): env →
      // STS → IMDS; all rungs absent ⇒ "" (templating left untouched)
      val accountId =
        if (cfg.accountId.nonEmpty) cfg.accountId
        else AwsIdentity.Default.accountId.getOrElse("")
      val report = alterator.alterSchema(sources, accountId)
      println(report.render)
      0
    }

  def main(args: Array[String]): Unit =
    parse(args) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(2)
      case Right(cfg) =>
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
          .config("spark.sql.shuffle.partitions", "4")
          .enableHiveSupport()
          .getOrCreate()
        try sys.exit(run(cfg, new SparkSessionCatalog(spark)))
        finally spark.stop()
    }
}
