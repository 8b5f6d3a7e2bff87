package graft.meta

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.sources.Worklist

/** S1-S5 worklist sources, including the Hadoop `FileSystem` listing
  * (S2): `filterFilesHadoop` over a `file://` URI must agree with the
  * local `filterFiles` — the same code path then serves s3a:// and
  * hdfs:// in production (Hadoop FS is URI-dispatched).
  */
class WorklistSpec extends AnyFunSuite {

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("graft-worklist-")
    Seq("pre_orders.hql", "pre_customer.hql", "pre_notes.txt",
      "other_orders.hql", "loose.hql")
      .foreach(n => Files.write(dir.resolve(n), "CREATE TABLE x (a int)".getBytes))
    Files.createDirectory(dir.resolve("subdir")) // non-recursive: ignored
    dir.toString
  }

  test("filterFiles applies prefix, suffix, and whitelist") {
    val dir = fixtureDir()
    def names(files: Seq[String]) = files.map(f => Paths.get(f).getFileName.toString)

    assert(names(Worklist.filterFiles(Seq(dir), prefix = "pre_")) ==
      Seq("pre_customer.hql", "pre_orders.hql"))
    assert(names(Worklist.filterFiles(Seq(dir))) ==
      Seq("loose.hql", "other_orders.hql", "pre_customer.hql", "pre_orders.hql"))
    assert(names(Worklist.filterFiles(Seq(dir), prefix = "pre_",
      tableNames = Some(Seq("orders")))) == Seq("pre_orders.hql"))
  }

  test("filterFilesHadoop over file:// agrees with the local listing") {
    val dir = fixtureDir()
    val conf = new org.apache.hadoop.conf.Configuration()
    def tail(files: Seq[String]) = files.map(f => f.substring(f.lastIndexOf('/') + 1))

    assert(tail(Worklist.filterFilesHadoop(conf, Seq(s"file://$dir"), prefix = "pre_")) ==
      tail(Worklist.filterFiles(Seq(dir), prefix = "pre_")))
    assert(tail(Worklist.filterFilesHadoop(conf, Seq(s"file://$dir"),
        tableNames = Some(Seq("orders", "customer")))) ==
      tail(Worklist.filterFiles(Seq(dir),
        tableNames = Some(Seq("orders", "customer")))))
    // a single file path (not a directory) is accepted, like S3 keys
    val one = s"file://$dir/pre_orders.hql"
    assert(tail(Worklist.filterFilesHadoop(conf, Seq(one), prefix = "pre_")) ==
      Seq("pre_orders.hql"))
  }

  test("checkPaths rejects missing paths") {
    val dir = fixtureDir()
    Worklist.checkPaths(Seq(dir)) // exists: no throw
    val err = intercept[IllegalArgumentException] {
      Worklist.checkPaths(Seq(dir, s"$dir/definitely-missing"))
    }
    assert(err.getMessage.contains("definitely-missing"))
  }

  test("readYamlConfig reads the path key and table list") {
    val dir = Files.createTempDirectory("graft-yaml-")
    val cfg = dir.resolve("run.yaml")
    Files.write(cfg,
      """ddl_path: /data/ddls
        |tables:
        |  - orders
        |  - customer
        |""".stripMargin.getBytes)
    val rc = Worklist.readYamlConfig(cfg.toString, "ddl_path")
    assert(rc.ddlPath.contains("/data/ddls"))
    assert(rc.tables == Seq("orders", "customer"))
    // missing keys degrade to None / empty
    val cfg2 = dir.resolve("min.yaml")
    Files.write(cfg2, "unrelated: 1\n".getBytes)
    val rc2 = Worklist.readYamlConfig(cfg2.toString, "ddl_path")
    assert(rc2.ddlPath.isEmpty && rc2.tables.isEmpty)
  }
}
