#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: column names (sorted), row count, and
cell values (rows sorted canonically). Exits nonzero on any mismatch.

This file is a DEV TOOL only — the Scala library has no Python deps.
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "nan")
        return (2, repr(v))
    if isinstance(v, (int,)):
        return (2, repr(float(v))) if False else (3, str(v))
    if isinstance(v, (list, tuple)):
        return (4, tuple(canon(x) for x in v))
    return (5, str(v))


def norm_cell(v):
    # EXACT compare, mirroring the driver's hash: Decimals stay Decimals
    # (value + scale both matter), floats stay floats. Do NOT relax this
    # back to float() — that is how round-1 shipped 6 hash-fail queries
    # while the local gate said "pass (approx)".
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def table_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda row: tuple(canon(c) for c in row)), \
        [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures, passed, exact = [], 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            got_cols = got_tbl.column_names
            got_rows = [tuple(got_tbl.column(c)[i].as_py() for c in got_cols)
                        for i in range(got_tbl.num_rows)]
            cur = con.execute(sql)
            exp_cols = [d[0] for d in cur.description]
            exp_rows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"EXEC ERROR: {e}"))
            continue
        g_rows, g_cols = table_rows(got_cols, got_rows)
        e_rows, e_cols = table_rows(exp_cols, exp_rows)
        if g_cols != e_cols:
            failures.append((name, f"COLS spark={g_cols} oracle={e_cols}"))
            continue
        if len(g_rows) != len(e_rows):
            failures.append(
                (name, f"ROWCOUNT spark={len(g_rows)} oracle={len(e_rows)}"))
            continue
        # EXACT equality only — the driver hashes values, no tolerance.
        bad = None
        for i, (g, e) in enumerate(zip(g_rows, e_rows)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            failures.append((name, f"VALUE row{bad[0]}\n  spark={bad[1]}\n  oracle={bad[2]}"))
        else:
            passed += 1
            exact += 1
            print(f"PASS  {name}  ({len(g_rows)} rows, EXACT)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{passed} passed ({exact} exact), {len(failures)} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
