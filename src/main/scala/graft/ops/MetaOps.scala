package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QuerySpec.sql

/** The metadata plane's relational core (SURVEY.md §2.3, J1-J17)
  * exposed as DataFrame operators over column-descriptor relations, so
  * the same joins that drive `graft.meta.diff` are exercisable as Spark
  * queries against the DuckDB oracle — and usable fleet-wide (thousands
  * of tables diffed in one shuffle) where the reference loops.
  *
  * Descriptor fixtures derive from the lineitem schema (FIXTURES.md §7):
  * v_old = catalog view, v_new = DDL view adding l_comment/l_receiptdate,
  * widening l_linenumber, narrowing l_quantity, reshaping two decimals,
  * dropping l_tax.
  */
object MetaOps {

  private val oldCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
    "l_linenumber" -> "int", "l_quantity" -> "double",
    "l_extendedprice" -> "double", "l_discount" -> "double",
    "l_tax" -> "double", "l_returnflag" -> "string", "l_linestatus" -> "string",
    "l_shipdate" -> "timestamp",
    "l_amount" -> "decimal(18,2)", "l_fee" -> "decimal(10, 2)")

  private val newCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
    "l_linenumber" -> "bigint", "l_quantity" -> "int",
    "l_extendedprice" -> "double", "l_discount" -> "double",
    "l_returnflag" -> "string", "l_linestatus" -> "string",
    "l_shipdate" -> "timestamp",
    "l_amount" -> "decimal(22, 2)", "l_fee" -> "decimal(10,3)",
    "l_comment" -> "string", "l_receiptdate" -> "date")

  private def valuesSql(rows: Seq[(String, String)], cols: String): String =
    rows.map { case (a, b) => s"('$a', '$b')" }
      .mkString(s"(VALUES ", ", ", s") AS t($cols)")

  private val oldSql = valuesSql(oldCols, "col_name, dtype")
  private val newSql = valuesSql(newCols, "col_name, dtype")

  private def oldDf(s: SparkSession): DataFrame = {
    import s.implicits._
    oldCols.toDF("col_name", "dtype")
  }
  private def newDf(s: SparkSession): DataFrame = {
    import s.implicits._
    newCols.toDF("col_name", "dtype")
  }

  /** Decimal canonicalization as a Column (N2/N4). */
  private def canon(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "decimal\\((\\d+),\\s*(\\d+)\\)", "decimal($1, $2)")

  // Flattened athena compatibility matrix (rule_book.py:307-317).
  private val athenaPairs: Seq[(String, String)] = Seq(
    "STRING" -> "BYTE", "STRING" -> "TINYINT", "STRING" -> "SMALLINT",
    "STRING" -> "INT", "STRING" -> "BIGINT", "STRING" -> "VARCHAR",
    "BYTE" -> "TINYINT", "BYTE" -> "SMALLINT", "BYTE" -> "INT", "BYTE" -> "BIGINT",
    "TINYINT" -> "SMALLINT", "TINYINT" -> "INT", "TINYINT" -> "BIGINT",
    "SMALLINT" -> "INT", "SMALLINT" -> "BIGINT",
    "INT" -> "BIGINT",
    "FLOAT" -> "DOUBLE",
    "DECIMAL" -> "DECIMAL",
    "VARCHAR" -> "VARCHAR")
  private val matrixSql = valuesSql(athenaPairs, "old_t, new_t")

  val specs: Seq[QuerySpec] = Seq(

    // ---- J2 added-columns projection (left anti on name) ----
    sql("md_added_columns",
      s"""WITH v_new AS (SELECT * FROM $newSql),
         |     v_old AS (SELECT * FROM $oldSql)
         |SELECT n.col_name, n.dtype FROM v_new n
         |WHERE NOT EXISTS (SELECT 1 FROM v_old o WHERE o.col_name = n.col_name)
         |ORDER BY n.col_name""") { (s, _) =>
      newDf(s).join(oldDf(s), Seq("col_name"), "left_anti")
        .select(col("col_name"), col("dtype")).orderBy(col("col_name"))
    },

    // ---- J3 deleted-columns projection ----
    sql("md_deleted_columns",
      s"""WITH v_new AS (SELECT * FROM $newSql),
         |     v_old AS (SELECT * FROM $oldSql)
         |SELECT o.col_name, o.dtype FROM v_old o
         |WHERE NOT EXISTS (SELECT 1 FROM v_new n WHERE n.col_name = o.col_name)
         |ORDER BY o.col_name""") { (s, _) =>
      oldDf(s).join(newDf(s), Seq("col_name"), "left_anti")
        .select(col("col_name"), col("dtype")).orderBy(col("col_name"))
    },

    // ---- J1+J4 type-change filter with decimal canonicalization ----
    sql("md_type_changes",
      s"""WITH v_new AS (SELECT * FROM $newSql),
         |     v_old AS (SELECT * FROM $oldSql)
         |SELECT o.col_name,
         |       o.dtype AS old_type,
         |       n.dtype AS new_type
         |FROM v_old o JOIN v_new n ON o.col_name = n.col_name
         |WHERE regexp_replace(o.dtype, 'decimal\\((\\d+),\\s*(\\d+)\\)', 'decimal(\\1, \\2)')
         |   <> regexp_replace(n.dtype, 'decimal\\((\\d+),\\s*(\\d+)\\)', 'decimal(\\1, \\2)')
         |ORDER BY o.col_name""") { (s, _) =>
      val o = oldDf(s).withColumnRenamed("dtype", "old_type")
      val n = newDf(s).withColumnRenamed("dtype", "new_type")
      o.join(n, Seq("col_name"))
        .filter(canon(col("old_type")) =!= canon(col("new_type")))
        .select(col("col_name"), col("old_type"), col("new_type"))
        .orderBy(col("col_name"))
    },

    // ---- J5 compatibility classification: matrix hit OR decimal rule ----
    sql("md_compat_classification",
      s"""WITH v_new AS (SELECT * FROM $newSql),
         |     v_old AS (SELECT * FROM $oldSql),
         |     matrix AS (SELECT * FROM $matrixSql),
         |     changes AS (
         |       SELECT o.col_name, o.dtype AS old_type, n.dtype AS new_type
         |       FROM v_old o JOIN v_new n ON o.col_name = n.col_name
         |       WHERE regexp_replace(o.dtype, 'decimal\\((\\d+),\\s*(\\d+)\\)', 'decimal(\\1, \\2)')
         |          <> regexp_replace(n.dtype, 'decimal\\((\\d+),\\s*(\\d+)\\)', 'decimal(\\1, \\2)'))
         |SELECT c.col_name, c.old_type, c.new_type,
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM matrix m
         |              WHERE m.old_t = UPPER(c.old_type) AND m.new_t = UPPER(c.new_type))
         |       OR (c.old_type LIKE 'decimal%' AND c.new_type LIKE 'decimal%'
         |           AND regexp_extract(c.old_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 2)
         |             = regexp_extract(c.new_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 2)
         |           AND CAST(regexp_extract(c.new_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 1) AS INT)
         |             > CAST(regexp_extract(c.old_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 1) AS INT))
         |       THEN 1 ELSE 0 END AS INT) AS compatible
         |FROM changes c
         |ORDER BY c.col_name""") { (s, _) =>
      import s.implicits._
      val o = oldDf(s).withColumnRenamed("dtype", "old_type")
      val n = newDf(s).withColumnRenamed("dtype", "new_type")
      val changes = o.join(n, Seq("col_name"))
        .filter(canon(col("old_type")) =!= canon(col("new_type")))
      val matrix = athenaPairs.toDF("old_t", "new_t")
      val decRe = "decimal\\((\\d+),\\s*(\\d+)\\)"
      val decimalOk = col("old_type").like("decimal%") &&
        col("new_type").like("decimal%") &&
        regexp_extract(col("old_type"), decRe, 2) === regexp_extract(col("new_type"), decRe, 2) &&
        regexp_extract(col("new_type"), decRe, 1).cast("int") >
          regexp_extract(col("old_type"), decRe, 1).cast("int")
      changes
        .join(broadcast(matrix),
          upper(col("old_type")) === col("old_t") && upper(col("new_type")) === col("new_t"),
          "left_outer")
        .select(col("col_name"), col("old_type"), col("new_type"),
          when(col("old_t").isNotNull || decimalOk, 1).otherwise(0)
            .cast("int").as("compatible"))
        .orderBy(col("col_name"))
    },

    // ---- J9 rename-detection θ-join: catalog.name == ddl.renamed_from ----
    sql("md_renamed_columns",
      """WITH cat AS (SELECT * FROM (VALUES ('col1'), ('col2'), ('col4'), ('col7')) AS t(col_name)),
        |     ddl AS (SELECT * FROM (VALUES ('col1', NULL), ('col5', 'col4'), ('col8', NULL))
        |             AS t(col_name, renamed_from))
        |SELECT cat.col_name AS old_name, ddl.col_name AS new_name
        |FROM cat JOIN ddl ON cat.col_name = ddl.renamed_from
        |ORDER BY old_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq("col1", "col2", "col4", "col7").toDF("col_name")
      val ddl = Seq(("col1", None: Option[String]), ("col5", Some("col4")),
        ("col8", None)).toDF("ddl_name", "renamed_from")
      cat.join(ddl, cat("col_name") === ddl("renamed_from"))
        .select(cat("col_name").as("old_name"), ddl("ddl_name").as("new_name"))
        .orderBy(col("old_name"))
    },

    // ---- J8 implicit-delete anti-join vs (ddl.names ∪ ddl.renamed_from) ----
    sql("md_implicit_deletes",
      """WITH cat AS (SELECT * FROM (VALUES ('col1'), ('col2'), ('col4'), ('col7')) AS t(col_name)),
        |     ddl AS (SELECT * FROM (VALUES ('col1', NULL), ('col5', 'col4'), ('col8', NULL))
        |             AS t(col_name, renamed_from))
        |SELECT cat.col_name FROM cat
        |WHERE NOT EXISTS (SELECT 1 FROM ddl WHERE ddl.col_name = cat.col_name)
        |  AND NOT EXISTS (SELECT 1 FROM ddl WHERE ddl.renamed_from = cat.col_name)
        |ORDER BY cat.col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq("col1", "col2", "col4", "col7").toDF("col_name")
      val ddl = Seq(("col1", None: Option[String]), ("col5", Some("col4")),
        ("col8", None)).toDF("ddl_name", "renamed_from")
      cat
        .join(ddl.select(col("ddl_name").as("col_name")), Seq("col_name"), "left_anti")
        .join(ddl.select(col("renamed_from").as("col_name")).na.drop(),
          Seq("col_name"), "left_anti")
        .orderBy(col("col_name"))
    },

    // ---- J12 position validation via lead() window: effective moves only ----
    sql("md_position_moves",
      """WITH cat AS (SELECT * FROM (VALUES (1, 'col1'), (2, 'col2'), (3, 'col3'),
        |                                   (4, 'col4'), (5, 'col5')) AS t(ord, col_name)),
        |     successors AS (
        |       SELECT col_name, LEAD(col_name) OVER (ORDER BY ord) AS next_col FROM cat),
        |     directives AS (SELECT * FROM (VALUES ('col5', 'col1'), ('col3', 'col2'))
        |                    AS t(col_name, after_col))
        |SELECT d.col_name, d.after_col
        |FROM directives d JOIN successors s ON d.after_col = s.col_name
        |WHERE s.next_col IS DISTINCT FROM d.col_name
        |ORDER BY d.col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq((1, "col1"), (2, "col2"), (3, "col3"), (4, "col4"), (5, "col5"))
        .toDF("ord", "col_name")
      // LEAD over dense catalog ordinals ≡ equi-join on ord+1 — same
      // relation, no unpartitioned window (catalog positions are dense
      // 1..n by construction; the fleet-scale variant additionally
      // partitions by table id, see md_fleet_position_moves)
      val successors = cat.join(
        cat.select((col("ord") - 1).as("ord"), col("col_name").as("next_col")),
        Seq("ord"), "left_outer")
        .select(col("col_name"), col("next_col"))
      val directives = Seq(("col5", "col1"), ("col3", "col2")).toDF("mv_name", "after_col")
      directives.join(successors, directives("after_col") === successors("col_name"))
        .filter(!col("next_col").eqNullSafe(col("mv_name")))
        .select(col("mv_name").as("col_name"), col("after_col"))
        .orderBy(col("col_name"))
    },

    // ---- J15 ordered partition invariant as a positional join ----
    sql("md_partition_mismatch",
      """WITH p_new AS (SELECT * FROM (VALUES (1, 'run_rk', 'int'), (2, 'day_rk', 'date'))
        |               AS t(ord, col_name, dtype)),
        |     p_old AS (SELECT * FROM (VALUES (1, 'day_rk', 'date'), (2, 'run_rk', 'int'))
        |               AS t(ord, col_name, dtype))
        |SELECT n.ord, n.col_name AS new_name, o.col_name AS old_name
        |FROM p_new n JOIN p_old o ON n.ord = o.ord
        |WHERE n.col_name <> o.col_name OR n.dtype <> o.dtype
        |ORDER BY n.ord""") { (s, _) =>
      import s.implicits._
      val pNew = Seq((1, "run_rk", "int"), (2, "day_rk", "date"))
        .toDF("ord", "new_name", "new_dtype")
      val pOld = Seq((1, "day_rk", "date"), (2, "run_rk", "int"))
        .toDF("ord", "old_name", "old_dtype")
      pNew.join(pOld, Seq("ord"))
        .filter(col("new_name") =!= col("old_name") || col("new_dtype") =!= col("old_dtype"))
        .select(col("ord"), col("new_name"), col("old_name"))
        .orderBy(col("ord"))
    },

    // ---- J16 tblprops set-diff with default-prop exclusion ----
    sql("md_props_diff",
      """WITH cat AS (SELECT * FROM (VALUES
        |       ('write.parquet.compression-codec', 'zstd'),
        |       ('write.merge.mode', 'copy-on-write'),
        |       ('stale.prop', 'x')) AS t(k, v)),
        |     ddl AS (SELECT * FROM (VALUES
        |       ('write.merge.mode', 'merge-on-read'),
        |       ('write.delete.mode', 'merge-on-read')) AS t(k, v)),
        |     defaults AS (SELECT * FROM (VALUES
        |       ('write.parquet.compression-codec'), ('schema.name-mapping.default')) AS t(k))
        |SELECT COALESCE(c.k, d.k) AS k,
        |       CASE WHEN c.k IS NULL THEN 'new'
        |            WHEN d.k IS NULL THEN 'removed'
        |            ELSE 'updated' END AS status,
        |       c.v AS old_value, d.v AS new_value
        |FROM cat c FULL OUTER JOIN ddl d ON c.k = d.k
        |WHERE (c.k IS NULL)
        |   OR (d.k IS NULL AND NOT EXISTS (SELECT 1 FROM defaults WHERE defaults.k = c.k))
        |   OR (c.k IS NOT NULL AND d.k IS NOT NULL AND c.v <> d.v)
        |ORDER BY k""") { (s, _) =>
      import s.implicits._
      val cat = Seq(
        ("write.parquet.compression-codec", "zstd"),
        ("write.merge.mode", "copy-on-write"),
        ("stale.prop", "x")).toDF("ck", "cv")
      val ddl = Seq(
        ("write.merge.mode", "merge-on-read"),
        ("write.delete.mode", "merge-on-read")).toDF("dk", "dv")
      val defaults = Seq("write.parquet.compression-codec", "schema.name-mapping.default")
        .toDF("defk")
      cat.join(ddl, cat("ck") === ddl("dk"), "full_outer")
        .join(broadcast(defaults), cat("ck") === defaults("defk"), "left_outer")
        .filter(col("ck").isNull ||
          (col("dk").isNull && col("defk").isNull) ||
          (col("ck").isNotNull && col("dk").isNotNull && col("cv") =!= col("dv")))
        .select(
          coalesce(col("ck"), col("dk")).as("k"),
          when(col("ck").isNull, "new")
            .when(col("dk").isNull, "removed")
            .otherwise("updated").as("status"),
          col("cv").as("old_value"), col("dv").as("new_value"))
        .orderBy(col("k"))
    },

    // ---- Fleet-wide diff: 200 tables in ONE shuffle (the scale path
    // replacing the reference's per-table loop; J17 shape on top) ----
    sql("md_fleet_diff",
      """WITH tables AS (SELECT CAST(range AS INT) AS tid FROM range(200)),
        |     template AS (SELECT * FROM (VALUES
        |       (0, 'c0', 'bigint'), (1, 'c1', 'int'), (2, 'c2', 'string'),
        |       (3, 'c3', 'double'), (4, 'c4', 'date'), (5, 'c5', 'string'))
        |       AS t(idx, col_name, dtype)),
        |     old_side AS (SELECT tid, col_name, dtype FROM tables, template),
        |     new_side AS (
        |       SELECT tid, col_name,
        |              CASE WHEN col_name = 'c1' AND tid % 3 = 0 THEN 'bigint' ELSE dtype END AS dtype
        |       FROM tables, template
        |       WHERE NOT (col_name = 'c3' AND tid % 5 = 0)
        |       UNION ALL
        |       SELECT tid, 'c6' AS col_name, 'string' AS dtype FROM tables WHERE tid % 7 = 0),
        |     diff AS (
        |       SELECT COALESCE(o.tid, n.tid) AS tid,
        |              COALESCE(o.col_name, n.col_name) AS col_name,
        |              CASE WHEN o.col_name IS NULL THEN 'added'
        |                   WHEN n.col_name IS NULL THEN 'dropped'
        |                   WHEN o.dtype <> n.dtype THEN 'type_changed' END AS change
        |       FROM old_side o
        |       FULL OUTER JOIN new_side n ON o.tid = n.tid AND o.col_name = n.col_name)
        |SELECT tid, col_name, change FROM diff WHERE change IS NOT NULL
        |ORDER BY tid, col_name""") { (s, _) =>
      fleetDiffFrame(s, 200)
    },

    // ---- J12 at fleet scale: the position-validation window
    // PARTITIONED BY table id — 200 tables, one shuffle, no
    // single-partition WindowExec (the scale shape md_position_moves'
    // 5-row template must grow into) ----
    sql("md_fleet_position_moves",
      """WITH tables AS (SELECT CAST(range AS INT) AS tid FROM range(200)),
        |     template AS (SELECT * FROM (VALUES
        |       (0, 'c0'), (1, 'c1'), (2, 'c2'), (3, 'c3'), (4, 'c4'), (5, 'c5'))
        |       AS t(ord, col_name)),
        |     cat AS (SELECT tid, ord, col_name FROM tables, template),
        |     successors AS (
        |       SELECT tid, col_name,
        |              LEAD(col_name) OVER (PARTITION BY tid ORDER BY ord) AS next_col
        |       FROM cat),
        |     directives AS (
        |       SELECT tid, 'c5' AS col_name, 'c1' AS after_col FROM tables WHERE tid % 2 = 0
        |       UNION ALL
        |       SELECT tid, 'c3' AS col_name, 'c2' AS after_col FROM tables WHERE tid % 3 = 0)
        |SELECT d.tid, d.col_name, d.after_col
        |FROM directives d
        |JOIN successors s ON d.tid = s.tid AND d.after_col = s.col_name
        |WHERE s.next_col IS DISTINCT FROM d.col_name
        |ORDER BY d.tid, d.col_name""") { (s, _) =>
      fleetPositionMovesFrame(s, 200)
    },

    // ---- J11 after-position candidate filter: common columns with
    // UNCHANGED type, an `after:` directive, not commented
    // (IcebergDiff.scala:132-134) ----
    sql("md_after_candidates",
      """WITH cat AS (SELECT * FROM (VALUES
        |       ('col1', 'int'), ('col2', 'string'), ('col3', 'double'),
        |       ('col4', 'int')) AS t(col_name, dtype)),
        |     ddl AS (SELECT * FROM (VALUES
        |       ('col1', 'int',    'col3', 0),
        |       ('col2', 'bigint', 'col1', 0),
        |       ('col3', 'double', 'col1', 1),
        |       ('col4', 'int',    NULL,   0),
        |       ('col9', 'int',    'col1', 0))
        |       AS t(col_name, dtype, after_col, commented))
        |SELECT d.col_name, d.after_col
        |FROM cat c JOIN ddl d ON c.col_name = d.col_name
        |WHERE c.dtype = d.dtype AND d.after_col IS NOT NULL AND d.commented = 0
        |ORDER BY d.col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq(("col1", "int"), ("col2", "string"), ("col3", "double"),
        ("col4", "int")).toDF("col_name", "cat_dtype")
      val ddl = Seq(
        ("col1", "int", Some("col3"), 0),
        ("col2", "bigint", Some("col1"), 0),
        ("col3", "double", Some("col1"), 1),
        ("col4", "int", None: Option[String], 0),
        ("col9", "int", Some("col1"), 0))
        .toDF("col_name", "ddl_dtype", "after_col", "commented")
      cat.join(ddl, Seq("col_name"))
        .filter(col("cat_dtype") === col("ddl_dtype") &&
          col("after_col").isNotNull && col("commented") === 0)
        .select(col("col_name"), col("after_col"))
        .orderBy(col("col_name"))
    },

    // ---- J6+J7 commented-delete filter over the common relation:
    // only columns that exist in the catalog AND are commented in the
    // DDL become explicit drops (IcebergDiff.scala:103-107) ----
    sql("md_commented_drops",
      """WITH cat AS (SELECT * FROM (VALUES ('col1'), ('col2'), ('col3')) AS t(col_name)),
        |     ddl AS (SELECT * FROM (VALUES ('col1', 0), ('col2', 1), ('col9', 1))
        |             AS t(col_name, commented))
        |SELECT cat.col_name
        |FROM cat JOIN ddl ON cat.col_name = ddl.col_name
        |WHERE ddl.commented = 1
        |ORDER BY cat.col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq("col1", "col2", "col3").toDF("col_name")
      val ddl = Seq(("col1", 0), ("col2", 1), ("col9", 1)).toDF("col_name", "commented")
      cat.join(ddl.filter(col("commented") === 1), Seq("col_name"), "left_semi")
        .orderBy(col("col_name"))
    },

    // ---- J10 type updates + R7 backfill invariant over the common
    // relation: every incompatible change must carry backfilled_from
    // (IcebergDiff.scala:122-129); output flags both classifications ----
    sql("md_type_updates_backfill",
      s"""WITH cat AS (SELECT * FROM (VALUES
         |       ('c_int', 'int'), ('c_str', 'string'), ('c_keep', 'double'),
         |       ('c_dec', 'decimal(10, 2)')) AS t(col_name, dtype)),
         |     ddl AS (SELECT * FROM (VALUES
         |       ('c_int', 'bigint', NULL), ('c_str', 'int', 'c_str_bf'),
         |       ('c_keep', 'double', NULL), ('c_dec', 'decimal(18, 2)', NULL))
         |       AS t(col_name, dtype, backfilled_from)),
         |     matrix AS (SELECT * FROM $matrixSql),
         |     changes AS (
         |       SELECT c.col_name, c.dtype AS old_type, d.dtype AS new_type,
         |              d.backfilled_from
         |       FROM cat c JOIN ddl d ON c.col_name = d.col_name
         |       WHERE c.dtype <> d.dtype)
         |SELECT col_name, old_type, new_type, backfilled_from,
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM matrix m
         |              WHERE m.old_t = UPPER(old_type) AND m.new_t = UPPER(new_type))
         |       OR (old_type LIKE 'decimal%' AND new_type LIKE 'decimal%'
         |           AND regexp_extract(old_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 2)
         |             = regexp_extract(new_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 2)
         |           AND CAST(regexp_extract(new_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 1) AS INT)
         |             > CAST(regexp_extract(old_type, 'decimal\\((\\d+),\\s*(\\d+)\\)', 1) AS INT))
         |       THEN 1 ELSE 0 END AS INT) AS compatible
         |FROM changes ORDER BY col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq(("c_int", "int"), ("c_str", "string"), ("c_keep", "double"),
        ("c_dec", "decimal(10, 2)")).toDF("col_name", "old_type")
      val ddl = Seq(("c_int", "bigint", None: Option[String]),
        ("c_str", "int", Some("c_str_bf")), ("c_keep", "double", None),
        ("c_dec", "decimal(18, 2)", None))
        .toDF("col_name", "new_type", "backfilled_from")
      val changes = cat.join(ddl, Seq("col_name"))
        .filter(col("old_type") =!= col("new_type"))
      val matrix = athenaPairs.toDF("old_t", "new_t")
      val decRe = "decimal\\((\\d+),\\s*(\\d+)\\)"
      val decimalOk = col("old_type").like("decimal%") &&
        col("new_type").like("decimal%") &&
        regexp_extract(col("old_type"), decRe, 2) === regexp_extract(col("new_type"), decRe, 2) &&
        regexp_extract(col("new_type"), decRe, 1).cast("int") >
          regexp_extract(col("old_type"), decRe, 1).cast("int")
      changes
        .join(broadcast(matrix),
          upper(col("old_type")) === col("old_t") && upper(col("new_type")) === col("new_t"),
          "left_outer")
        .select(col("col_name"), col("old_type"), col("new_type"),
          col("backfilled_from"),
          when(col("old_t").isNotNull || decimalOk, 1).otherwise(0)
            .cast("int").as("compatible"))
        .orderBy(col("col_name"))
    },

    // ---- J13 new-column anti-join with the THREE exclusion sets:
    // renames, commented columns, backfill sources
    // (IcebergDiff.scala:165-171) ----
    sql("md_new_columns",
      """WITH cat AS (SELECT * FROM (VALUES ('col1'), ('col2')) AS t(col_name)),
        |     ddl AS (SELECT * FROM (VALUES
        |       ('col1',  'int',    NULL,   0, NULL),
        |       ('col5',  'string', 'col2', 0, NULL),
        |       ('col6',  'int',    NULL,   1, NULL),
        |       ('col7',  'bigint', NULL,   0, 'col8'),
        |       ('col8',  'string', NULL,   0, NULL),
        |       ('col9',  'date',   NULL,   0, NULL))
        |       AS t(col_name, dtype, renamed_from, commented, backfilled_from))
        |SELECT d.col_name, d.dtype FROM ddl d
        |WHERE NOT EXISTS (SELECT 1 FROM cat WHERE cat.col_name = d.col_name)
        |  AND d.renamed_from IS NULL
        |  AND d.commented = 0
        |  AND NOT EXISTS (SELECT 1 FROM ddl b WHERE b.backfilled_from = d.col_name)
        |ORDER BY d.col_name""") { (s, _) =>
      import s.implicits._
      val cat = Seq("col1", "col2").toDF("col_name")
      val ddl = Seq(
        ("col1", "int", None: Option[String], 0, None: Option[String]),
        ("col5", "string", Some("col2"), 0, None),
        ("col6", "int", None, 1, None),
        ("col7", "bigint", None, 0, Some("col8")),
        ("col8", "string", None, 0, None),
        ("col9", "date", None, 0, None))
        .toDF("col_name", "dtype", "renamed_from", "commented", "backfilled_from")
      ddl
        .filter(col("renamed_from").isNull && col("commented") === 0)
        .join(cat, Seq("col_name"), "left_anti")
        .join(ddl.select(col("backfilled_from").as("col_name")).na.drop(),
          Seq("col_name"), "left_anti")
        .select(col("col_name"), col("dtype"))
        .orderBy(col("col_name"))
    },

    // ---- J14 partition-spec full-outer join on FIELD-ID (not name):
    // same id + new name = replaced; id only in DDL = new; id only in
    // catalog = dropped (IcebergDiff.scala:177-198) ----
    sql("md_partition_spec_diff",
      """WITH cat AS (SELECT * FROM (VALUES (1000, 'day_rk'), (1001, 'region_rk'),
        |                                   (1002, 'old_bucket')) AS t(field_id, name)),
        |     ddl AS (SELECT * FROM (VALUES (1000, 'day_rk'), (1001, 'geo_rk'),
        |                                   (1003, 'hour_rk')) AS t(field_id, name))
        |SELECT COALESCE(c.field_id, d.field_id) AS field_id,
        |       CASE WHEN c.field_id IS NULL THEN 'new'
        |            WHEN d.field_id IS NULL THEN 'dropped'
        |            ELSE 'replaced' END AS status,
        |       c.name AS old_name, d.name AS new_name
        |FROM cat c FULL OUTER JOIN ddl d ON c.field_id = d.field_id
        |WHERE c.field_id IS NULL OR d.field_id IS NULL OR c.name <> d.name
        |ORDER BY field_id""") { (s, _) =>
      import s.implicits._
      val cat = Seq((1000, "day_rk"), (1001, "region_rk"), (1002, "old_bucket"))
        .toDF("c_id", "c_name")
      val ddl = Seq((1000, "day_rk"), (1001, "geo_rk"), (1003, "hour_rk"))
        .toDF("d_id", "d_name")
      cat.join(ddl, cat("c_id") === ddl("d_id"), "full_outer")
        .filter(col("c_id").isNull || col("d_id").isNull || col("c_name") =!= col("d_name"))
        .select(coalesce(col("c_id"), col("d_id")).as("field_id"),
          when(col("c_id").isNull, "new")
            .when(col("d_id").isNull, "dropped")
            .otherwise("replaced").as("status"),
          col("c_name").as("old_name"), col("d_name").as("new_name"))
        .orderBy(col("field_id"))
    },

    // ---- J18 migration sequence gate: positional (name, type)
    // comparison, case-insensitive names; any surviving row ⇒
    // sequenceMismatch (IcebergDiff.scala:226-230 — fixed vs the
    // reference, which compares disjoint-keyed dicts) ----
    sql("md_sequence_gate",
      """WITH cat AS (SELECT * FROM (VALUES (1, 'Col1', 'int'), (2, 'col2', 'string'),
        |                                   (3, 'col3', 'double')) AS t(ord, col_name, dtype)),
        |     ddl AS (SELECT * FROM (VALUES (1, 'col1', 'int'), (2, 'col3', 'string'),
        |                                   (3, 'col3', 'float'), (4, 'col4', 'int'))
        |             AS t(ord, col_name, dtype))
        |SELECT COALESCE(c.ord, d.ord) AS ord,
        |       c.col_name AS cat_name, c.dtype AS cat_type,
        |       d.col_name AS ddl_name, d.dtype AS ddl_type
        |FROM cat c FULL OUTER JOIN ddl d ON c.ord = d.ord
        |WHERE c.ord IS NULL OR d.ord IS NULL
        |   OR LOWER(c.col_name) <> LOWER(d.col_name) OR c.dtype <> d.dtype
        |ORDER BY ord""") { (s, _) =>
      import s.implicits._
      val cat = Seq((1, "Col1", "int"), (2, "col2", "string"), (3, "col3", "double"))
        .toDF("c_ord", "cat_name", "cat_type")
      val ddl = Seq((1, "col1", "int"), (2, "col3", "string"), (3, "col3", "float"),
        (4, "col4", "int")).toDF("d_ord", "ddl_name", "ddl_type")
      cat.join(ddl, cat("c_ord") === ddl("d_ord"), "full_outer")
        .filter(col("c_ord").isNull || col("d_ord").isNull ||
          lower(col("cat_name")) =!= lower(col("ddl_name")) ||
          col("cat_type") =!= col("ddl_type"))
        .select(coalesce(col("c_ord"), col("d_ord")).as("ord"),
          col("cat_name"), col("cat_type"), col("ddl_name"), col("ddl_type"))
        .orderBy(col("ord"))
    })

  /** Fleet-wide schema diff over `nTables` synthetic descriptors — the
    * one-shuffle replacement for the reference's per-table driver loop
    * (alterator.py walks tables one by one; at fleet scale the diff is
    * ONE full-outer join keyed on (table, column)). The registered
    * md_fleet_diff pins nTables=200 for the oracle; FleetScaleSpec
    * stresses the same builder at 10,000 tables (the reference's own
    * 458-table production run at ~20×) and asserts the plan shape
    * stays flat: no per-table jobs, no driver materialization, the
    * descriptor template broadcast once. */
  private[ops] def fleetDiffFrame(s: SparkSession, nTables: Int): DataFrame = {
    import s.implicits._
    val tables = s.range(nTables).select(col("id").cast("int").as("tid"))
    val template = Seq((0, "c0", "bigint"), (1, "c1", "int"), (2, "c2", "string"),
      (3, "c3", "double"), (4, "c4", "date"), (5, "c5", "string"))
      .toDF("idx", "col_name", "dtype")
    val oldSide = tables.crossJoin(broadcast(template))
      .select(col("tid"), col("col_name"), col("dtype"))
    val newSide = tables.crossJoin(broadcast(template))
      .filter(!(col("col_name") === "c3" && col("tid") % 5 === 0))
      .select(col("tid"), col("col_name"),
        when(col("col_name") === "c1" && col("tid") % 3 === 0, "bigint")
          .otherwise(col("dtype")).as("dtype"))
      .union(tables.filter(col("tid") % 7 === 0)
        .select(col("tid"), lit("c6").as("col_name"), lit("string").as("dtype")))
    val o = oldSide.select(col("tid").as("o_tid"), col("col_name").as("o_name"),
      col("dtype").as("o_dtype"))
    val n = newSide.select(col("tid").as("n_tid"), col("col_name").as("n_name"),
      col("dtype").as("n_dtype"))
    o.join(n, o("o_tid") === n("n_tid") && o("o_name") === n("n_name"), "full_outer")
      .select(
        coalesce(col("o_tid"), col("n_tid")).as("tid"),
        coalesce(col("o_name"), col("n_name")).as("col_name"),
        when(col("o_name").isNull, "added")
          .when(col("n_name").isNull, "dropped")
          .when(col("o_dtype") =!= col("n_dtype"), "type_changed").as("change"))
      .filter(col("change").isNotNull)
      .orderBy(col("tid"), col("col_name"))
  }

  /** J12's position-validation window at fleet width: PARTITIONED BY
    * table id, so `nTables` tables validate in one exchange with no
    * single-partition WindowExec. Registered at 200 (oracle);
    * stress-run at 10,000 by FleetScaleSpec. */
  private[ops] def fleetPositionMovesFrame(s: SparkSession, nTables: Int): DataFrame = {
    import s.implicits._
    val tables = s.range(nTables).select(col("id").cast("int").as("tid"))
    val template = Seq((0, "c0"), (1, "c1"), (2, "c2"), (3, "c3"), (4, "c4"), (5, "c5"))
      .toDF("ord", "col_name")
    val cat = tables.crossJoin(broadcast(template))
    val successors = cat.select(col("tid"), col("col_name"),
      lead(col("col_name"), 1)
        .over(Window.partitionBy(col("tid")).orderBy(col("ord"))).as("next_col"))
    val directives = tables.filter(col("tid") % 2 === 0)
      .select(col("tid"), lit("c5").as("mv_name"), lit("c1").as("after_col"))
      .union(tables.filter(col("tid") % 3 === 0)
        .select(col("tid"), lit("c3").as("mv_name"), lit("c2").as("after_col")))
    directives
      .join(successors,
        directives("tid") === successors("tid") &&
          directives("after_col") === successors("col_name"))
      .filter(!col("next_col").eqNullSafe(col("mv_name")))
      .select(directives("tid"), col("mv_name").as("col_name"), col("after_col"))
      .orderBy(col("tid"), col("col_name"))
  }
}
