package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Invariants of the driver contract (SparkEntry + Verify + Bench):
  * regressions here break the external harness before any query runs.
  */
class ContractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("spec names are unique, lowercase, and family-prefixed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    names.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"bad name: $n")
      assert(n.matches("(q\\d+|md|dd|ev|tx|ss|mm|pipe)_.*"), s"unknown family: $n")
    }
  }

  test("every oracle belongs to a registered query and orders deterministically") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle without query: $name")
      // single-row global aggregates are deterministic without one
      val singleRow = Set("q2_forecast_revenue", "ev_funnel", "tx_dedup_rate",
        "dd_neardup_rate", "dd_lsh_recall")
      assert(sql.toUpperCase.contains("ORDER BY") || singleRow(name),
        s"oracle for $name lacks a deterministic ORDER BY")
    }
  }

  test("every oracle-less query documents its rows-only contract") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle.foreach { name =>
      val c = SparkEntry.rowsOnlyContract.get(name)
      assert(c.exists(_.length > 40),
        s"$name has no oracle and no rows-only contract documenting why")
    }
    // and no contract without a registered query
    assert((SparkEntry.rowsOnlyContract.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("the sf0.01 ORACLE fixture sits in the pinned index-geometry regime") {
    // Since round 7 the similarity/dedup oracle SQL is GENERATED from
    // the corpus size (QuerySpec.oracleGen — proven EXACT above this
    // regime at sf0.1, docs/oracle_scale_check_sf0.1.txt), so parity
    // no longer depends on this pin. The gate stays as an ALARM: if
    // the driver regenerates sf0.01 with a bigger embeddings table,
    // the static SparkEntry.oracleSql strings (pinned at OracleRegimeN
    // for the contract surface) stop describing what Verify dumps, and
    // the regime commentary across docs/tests goes stale — fail loudly
    // here so that drift is noticed, not discovered by a reader.
    val n = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    assert(Similarity.scaledGeometry(n) == Similarity.DefaultGeometry,
      s"n=$n left the oracle geometry regime: ${Similarity.scaledGeometry(n)}")
    assert(Similarity.scaledMultiprobeGeometry(n) == Similarity.DefaultGeometry)
    assert(Similarity.scaledK(n) == 8, s"scaledK(${n}) != oracle k")
    // and the scale path really departs from the fixture regime
    assert(Similarity.scaledGeometry(200000) !=
      Similarity.DefaultGeometry)
    assert(Similarity.scaledK(200000) > Similarity.LiteralAssignMaxK)
  }

  test("the flagship entry returns rows at sf0.001 (driver smoke mirror)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query builder leaks a session-conf mutation (nanosAsLong scoping)") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    // getOption reports the registered DEFAULT ("false") when unset —
    // the contract is "value unchanged after building", not "absent"
    val baseline = spark.conf.get(key)
    assert(baseline == "false")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, "/root/testdata/sf0.001").schema
      assert(spark.conf.get(key) == baseline,
        s"$name leaked $key=${spark.conf.get(key)}")
    }
    // and execution AFTER the restore still reads the nanos fixture
    // (the resolved schema is pinned in the plan, not re-inferred)
    val n = SparkEntry.queries("ev_hourly_rollup")(spark, "/root/testdata/sf0.001").count()
    assert(n > 0)
    assert(spark.conf.get(key) == baseline)
  }

  test("the events loader handles BOTH fixture ts encodings (micros TIMESTAMP, BIGINT nanos)") {
    // The driver regenerated events.parquet between rounds 3 and 4,
    // silently switching ts from parquet NANOS to micros TIMESTAMP_NTZ
    // and breaking every ev_* query. This pins the loader's contract:
    // identical logical events in either physical encoding must produce
    // identical results — so the NEXT silent regeneration fails here,
    // in our own gate, not in the driver's.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val secs = Seq(
      (1L, 1000800L, 1L, "view", 1.25, "{}"),
      (2L, 1000900L, 1L, "click", 0.50, "{}"),
      (3L, 1004400L, 2L, "view", 2.00, "{}"))
    def dirWith(ts: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-ts-enc-").toString
      secs.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
        .select(col("event_id"), ts(col("sec")).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    val micros = dirWith(c => to_timestamp(c).cast("timestamp_ntz"))
    val nanos = dirWith(c => (c * 1000000000L).cast("long"))
    def run(d: String) = SparkEntry.queries("ev_hourly_rollup")(spark, d)
      .collect().map(_.toSeq).toSeq
    val m = run(micros)
    assert(m.nonEmpty)
    assert(m == run(nanos),
      "micros-TIMESTAMP and nanos-BIGINT encodings of the same events diverged")
  }

  test("every registered query returns a non-empty, readable schema at sf0.001") {
    // schema resolution only (no execution): catches broken column refs
    // across the whole surface in seconds
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema = fn(spark, "/root/testdata/sf0.001").schema
      assert(schema.nonEmpty, s"$name has an empty schema")
      assert(schema.fieldNames.distinct.length == schema.fieldNames.length,
        s"$name has duplicate output columns: ${schema.fieldNames.mkString(",")}")
    }
  }
}
