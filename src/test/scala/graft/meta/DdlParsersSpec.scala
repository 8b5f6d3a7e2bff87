package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.parse.DdlParsers
import graft.meta.rules.Rules
import graft.meta.rules.Rules.DdlFacts

/** Fixtures from FIXTURES.md §1/§2 (shapes the reference parses —
  * README.md:377-447).
  */
object Fixtures {
  val hiveDdl: String = DdlParsers.normalize(
    """CREATE EXTERNAL TABLE IF NOT EXISTS `sdb.raw_sales`(
      |    `txn_id` bigint,
      |    `amount` decimal(18,2),
      |    `note` string,
      |    `ile1` string,
      |    `sovereign_guarantee_flag` string
      |)
      |PARTITIONED BY (
      |    `day_rk` date,
      |    `run_rk` int
      |)
      |STORED AS PARQUET
      |LOCATION 's3://bucket-{aws_account_id}-data/sdb/raw_sales';""".stripMargin,
    accountId = "123456789012")

  val icebergDdl: String = DdlParsers.normalize(
    """CREATE TABLE IF NOT EXISTS `idb.ic_sales` (
      |    `col1` string,
      |    -- `col2` double,
      |    `col3` decimal(18, 7),
      |    `col5` bigint, -- renamed_from: col4
      |    `day_rk` date,
      |    `run_rk` int,
      |    `new_col` timestamp,
      |    `seq_col` string, -- after: col3
      |    `col6_hist` double,
      |    `col6` bigint, -- backfilled_from: col6_hist
      |    `lead_col` string, -- first
      |)
      |USING iceberg
      |PARTITIONED BY (
      |    `day_rk`,
      |    -- `run_rk`,
      |    `batch_rk`
      |)
      |LOCATION 's3://bucket-{aws_account_id}-data/idb/ic_sales'
      |TBLPROPERTIES(
      |    'write.merge.mode'='merge-on-read',
      |    'write.delete.mode'='merge-on-read',
      |    'write.update.mode'='merge-on-read'
      |);""".stripMargin)
}

class DdlParsersSpec extends AnyFunSuite {
  import Fixtures._

  test("P1 table name extraction") {
    assert(DdlParsers.extractTableName(hiveDdl).contains(("sdb", "raw_sales")))
    assert(DdlParsers.extractTableName(icebergDdl).contains(("idb", "ic_sales")))
    assert(DdlParsers.extractTableName("create table sdb.no_ticks (a int)").isEmpty)
  }

  test("P9 account-id templating + normalization") {
    assert(hiveDdl.contains("s3://bucket-123456789012-data/sdb/raw_sales"))
    assert(hiveDdl == hiveDdl.toLowerCase)
  }

  test("P2 create guard") {
    assert(DdlParsers.isCreateStatement(hiveDdl))
    assert(!DdlParsers.isCreateStatement("alter table `a.b` add columns (x int)"))
  }

  test("P3 hive columns incl. partition cols and decimal params") {
    val cols = DdlParsers.hiveColumns(hiveDdl)
    assert(cols.map(_.name) == Seq("txn_id", "amount", "note", "ile1",
      "sovereign_guarantee_flag", "day_rk", "run_rk"))
    assert(cols.find(_.name == "amount").get.dataType == "decimal(18,2)")
  }

  test("P3 hive backfilled_from annotation") {
    val cols = DdlParsers.hiveColumns(
      "create external table `d.t`(\n`a` bigint, -- backfilled_from: a_hist\n`b` int\n) stored as parquet")
    assert(cols.find(_.name == "a").get.backfilledFrom.contains("a_hist"))
    assert(cols.find(_.name == "b").get.backfilledFrom.isEmpty)
  }

  test("complex types parse instead of vanishing (fixes A.7)") {
    val cols = DdlParsers.hiveColumns(
      "create external table `d.t`(\n`a` array<int>,\n`b` struct<x:int,y:string>,\n`c` map<string,array<double>>\n) stored as parquet")
    assert(cols.map(c => c.name -> c.dataType) == Seq(
      "a" -> "array<int>", "b" -> "struct<x:int,y:string>",
      "c" -> "map<string,array<double>>"))
  }

  test("P4 iceberg columns: drops, renames, after, backfill, first") {
    val cols = DdlParsers.icebergColumns(icebergDdl, migration = false)
    val byName = cols.map(c => c.name -> c).toMap
    assert(byName("col2").commented)
    assert(!byName("col1").commented)
    assert(byName("col5").renamedFrom.contains("col4"))
    assert(byName("seq_col").after.contains("col3"))
    assert(byName("col6").backfilledFrom.contains("col6_hist"))
    assert(byName("lead_col").first) // fixes dead `first` (A.4)
    // N3 applied: bigint->long, timestamp->timestamptz, decimal canon
    assert(byName("col5").dataType == "long")
    assert(byName("new_col").dataType == "timestamptz")
    assert(byName("col3").dataType == "decimal(18, 7)")
  }

  test("P4 migration=true keeps raw types") {
    val cols = DdlParsers.icebergColumns(icebergDdl, migration = true)
    val byName = cols.map(c => c.name -> c).toMap
    assert(byName("col5").dataType == "bigint")
    assert(byName("new_col").dataType == "timestamp")
  }

  test("P5 hive partition clause, typed + ordered") {
    val parts = DdlParsers.hivePartitions(hiveDdl)
    assert(parts.map(p => p.name -> p.dataType) == Seq("day_rk" -> "date", "run_rk" -> "int"))
  }

  test("P6 iceberg partition clause: untyped, comment-aware, ids from 1000") {
    val parts = DdlParsers.icebergPartitions(icebergDdl)
    assert(parts.map(p => (p.fieldId, p.name, p.commented)) == Seq(
      (1000, "day_rk", false), (1001, "run_rk", true), (1002, "batch_rk", false)))
  }

  test("P7 tblproperties") {
    val props = DdlParsers.tblProperties(icebergDdl)
    assert(props == Map(
      "write.merge.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read"))
    assert(DdlParsers.tblProperties(hiveDdl).isEmpty)
  }

  test("P8/R1 format rules over DDL strings") {
    assert(Rules.externalTableCheck(DdlFacts(hiveDdl)))
    assert(!Rules.externalTableCheck(DdlFacts(icebergDdl)))
    assert(Rules.parquetCheck(DdlFacts(hiveDdl)))
    assert(!Rules.parquetCheck(DdlFacts(icebergDdl)))
    assert(Rules.icebergCheck(DdlFacts(icebergDdl)))
    assert(!Rules.icebergCheck(DdlFacts(hiveDdl)))
  }

  test("P8 serde-triple parquet detection") {
    val serdeDdl = DdlParsers.normalize(
      """CREATE EXTERNAL TABLE `d.t`(`a` int)
        |ROW FORMAT SERDE 'org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe'
        |STORED AS INPUTFORMAT 'org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat'
        |OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat'""".stripMargin)
    assert(Rules.parquetCheck(DdlFacts(serdeDdl)))
    val textDdl = DdlParsers.normalize(
      "CREATE EXTERNAL TABLE `d.t`(`a` int) STORED AS TEXTFILE")
    assert(!Rules.parquetCheck(DdlFacts(textDdl)))
  }
}
