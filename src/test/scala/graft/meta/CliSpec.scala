package graft.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.app.AlteratorCli
import graft.meta.catalog.InMemoryCatalog
import graft.meta.model._
import graft.meta.rules.Rules

/** CLI surface (easy_alterator.py:20-154 flags) driven end-to-end
  * against the in-memory catalog: alterator mode over a DDL directory,
  * and sync mode.
  */
class CliSpec extends AnyFunSuite {

  private def table(db: String, name: String, cols: Seq[PartitionKey]) =
    CatalogTableInfo(
      db = db, table = name, columns = cols,
      partitionKeys = Seq(PartitionKey("day_rk", "date")),
      tableType = "EXTERNAL_TABLE",
      serializationLibrary = Some(Rules.ParquetSerde),
      inputFormat = Some(Rules.ParquetInputFormat),
      outputFormat = Some(Rules.ParquetOutputFormat))

  test("parse mirrors the reference's argument contract") {
    val ok = AlteratorCli.parse(Array(
      "-p", "/a", "/b", "-fs", "txt", "-fp", "pre_", "--validate", "--force")).toOption.get
    assert(ok.paths == Seq("/a", "/b") && ok.suffix == "txt" &&
      ok.prefix == "pre_" && ok.validate && ok.force && !ok.sync)

    val sync = AlteratorCli.parse(Array(
      "--sync", "-src", "db.s", "-tgt", "db.t", "-pcheck", "0")).toOption.get
    assert(sync.sync && sync.src.contains("db.s") && sync.tgt.contains("db.t")
      && !sync.partCheck)

    assert(AlteratorCli.parse(Array("--validate")).isLeft) // no path/config
    assert(AlteratorCli.parse(Array("--sync", "-src", "db.s")).isLeft) // no tgt
    assert(AlteratorCli.parse(Array("-pcheck", "7")).isLeft)
    assert(AlteratorCli.parse(Array("--wat")).isLeft)
  }

  test("alterator mode: scans the DDL dir, applies, prints the report") {
    val dir = Files.createTempDirectory("graft-cli-")
    Files.writeString(dir.resolve("t1.hql"),
      """CREATE EXTERNAL TABLE `sdb.t1`(
        |  `id` bigint,
        |  `extra` string
        |)
        |PARTITIONED BY (`day_rk` date)
        |STORED AS PARQUET
        |LOCATION 's3://b/sdb/t1'""".stripMargin)
    Files.writeString(dir.resolve("ignored.txt"), "not a DDL")

    val catalog = new InMemoryCatalog
    catalog.put(table("sdb", "t1", Seq(PartitionKey("id", "bigint"))))

    val cfg = AlteratorCli.parse(Array("-p", dir.toString)).toOption.get
    val out = new java.io.ByteArrayOutputStream()
    val rc = Console.withOut(out)(AlteratorCli.run(cfg, catalog))
    assert(rc == 0)
    assert(out.toString.contains(""""num_updates": 1"""), out.toString)
    assert(catalog.getTable("sdb", "t1").get.columns
      .contains(PartitionKey("extra", "string")))
  }

  test("sync mode: target column set converges to source") {
    val catalog = new InMemoryCatalog
    catalog.put(table("sdb", "src_t",
      Seq(PartitionKey("id", "bigint"), PartitionKey("v", "string"))))
    catalog.put(table("sdb", "tgt_t",
      Seq(PartitionKey("id", "bigint"), PartitionKey("old_v", "int"))))

    val cfg = AlteratorCli.parse(Array(
      "--sync", "-src", "sdb.src_t", "-tgt", "sdb.tgt_t")).toOption.get
    val rc = Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream()))(AlteratorCli.run(cfg, catalog))
    assert(rc == 0)
    val cols = catalog.getTable("sdb", "tgt_t").get.columns
    assert(cols.contains(PartitionKey("v", "string")))
    assert(!cols.exists(_.name == "old_v"))
  }
}
