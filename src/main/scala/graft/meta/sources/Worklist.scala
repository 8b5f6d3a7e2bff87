package graft.meta.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** DDL worklist sources (S1-S5).
  *
  * The reference scans local dirs / S3 prefixes with prefix+suffix
  * filters and an optional table whitelist where filenames follow
  * `{prefix}{table}.{suffix}` (src/utils/file_utils.py:48-128). Local
  * filesystem here; a Hadoop `FileSystem` drop-in covers s3a:// in
  * production with the same listing semantics.
  */
object Worklist {

  final case class RunConfig(ddlPath: Option[String], tables: Seq[String])

  def checkPaths(paths: Seq[String]): Unit =
    paths.foreach { p =>
      if (!Files.exists(Paths.get(p)))
        throw new IllegalArgumentException(s"Path does not exist: $p")
    }

  /** S1 — directory scan + prefix/suffix filter + optional whitelist. */
  def filterFiles(
      paths: Seq[String],
      prefix: String = "",
      suffix: String = "hql",
      tableNames: Option[Seq[String]] = None): Seq[String] = {
    val wanted: Option[Set[String]] =
      tableNames.map(_.map(t => s"$prefix$t.$suffix").toSet)
    paths.flatMap { dir =>
      val p = Paths.get(dir)
      val entries: Seq[Path] =
        if (Files.isDirectory(p)) Files.list(p).iterator().asScala.toSeq
        else Seq(p)
      entries
        .filter(f => Files.isRegularFile(f))
        .filter { f =>
          val name = f.getFileName.toString
          name.startsWith(prefix) && name.endsWith(suffix) &&
            wanted.forall(_.contains(name))
        }
        .map(_.toString)
    }.sorted
  }

  /** S4 — raw file read (normalization happens in DdlParsers.normalize). */
  def readFile(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  /** S5 — YAML run config `{<path_key>: dir, tables: [...]}`
    * (reference README.md:465-475).
    */
  def readYamlConfig(path: String, pathKey: String): RunConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(readFile(path))
    val ddlPath = Option(root.get(pathKey)).map(_.asText())
    val tables = Option(root.get("tables"))
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
    RunConfig(ddlPath, tables)
  }
}
