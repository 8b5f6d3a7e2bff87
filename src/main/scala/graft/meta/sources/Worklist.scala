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
        if (Files.isDirectory(p)) {
          val stream = Files.list(p)
          try stream.iterator().asScala.toSeq
          finally stream.close()
        } else Seq(p)
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

  /** S2 — the same listing semantics over a Hadoop `FileSystem`, which
    * covers s3a://, hdfs:// and file:// URIs alike (the reference lists
    * S3 prefixes, s3_utils.py:45-92). Non-recursive, like S3 prefix
    * listing with '/' delimiter.
    */
  def filterFilesHadoop(
      conf: org.apache.hadoop.conf.Configuration,
      paths: Seq[String],
      prefix: String = "",
      suffix: String = "hql",
      tableNames: Option[Seq[String]] = None): Seq[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val wanted: Option[Set[String]] =
      tableNames.map(_.map(t => s"$prefix$t.$suffix").toSet)
    paths.flatMap { dir =>
      val p = new HPath(dir)
      val fs: FileSystem = p.getFileSystem(conf)
      val statuses =
        if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
        else Seq(fs.getFileStatus(p))
      statuses
        .filter(_.isFile)
        .filter { st =>
          val name = st.getPath.getName
          name.startsWith(prefix) && name.endsWith(suffix) &&
            wanted.forall(_.contains(name))
        }
        .map(_.getPath.toString)
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
