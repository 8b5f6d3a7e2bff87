#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares the way the DRIVER does:

  - Spark side loaded with pyarrow -> pandas  (DECIMAL -> decimal.Decimal)
  - oracle side loaded with duckdb .df()      (DECIMAL -> float64)
  - columns sorted by name, rows sorted, then TYPE-STRICT cell compare.

Round 2 lesson: the old version normalized Decimals to str(v) on BOTH
sides before comparing, so Decimal('506627.00') (Spark parquet via
pyarrow) compared equal to 506627.0 (DuckDB via .df()) -> local gate
said EXACT while the driver's hasher (which sees the two different
pandas dtypes) said mismatch, 9 times. The fix below keeps each side's
pandas representation and compares (type-class, canonical-string) pairs,
so a Decimal-vs-float divergence fails HERE first. Queries therefore
must emit integer (BIGINT) or string outputs for anything SUM-derived.

Also flags ARRAY-typed output columns in every Verify output (the
driver's pandas sort crashes on ndarray cells -> harness error, see
CORRECTNESS_r02 q21).

This file is a DEV TOOL only — the Scala library has no Python deps.
"""
import json
import math
import sys
import decimal

import duckdb
import numpy as np
import pyarrow.dataset as ds
from concurrent.futures import ProcessPoolExecutor


def _oracle_worker(args):
    """Runs ONE oracle in a fresh child interpreter (see run_oracle)."""
    import os
    sf_dir, sql = args
    c = duckdb.connect()
    # cap per-child threads when several children run concurrently
    # (CHECK_WORKERS > 1) so N children don't each claim every core
    t = os.environ.get("CHECK_DUCK_THREADS")
    if t:
        c.execute(f"SET threads TO {int(t)}")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c.execute(sql).df()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cellkey(v):
    """Type-strict canonical form, mirroring what a value-hash over the
    pandas frame would see. Decimal and float deliberately do NOT unify."""
    if v is None:
        return ("null", "")
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("null", "") if math.isnan(f) else ("float", repr(f))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, (int, np.integer)):
        return ("int", str(int(v)))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(cellkey(x) for x in v))
    return (type(v).__name__, str(v))


def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(cellkey(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows), cols


def has_arrays(df):
    # whole column, not a head() sample: a nullable array column whose
    # first rows are all NULL must still trip the gate (result sets
    # here are small, so the full scan is cheap)
    return [c for c in df.columns
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    # each oracle runs in a FRESH CHILD PROCESS (max_tasks_per_child=1):
    # a long-lived connection accumulates buffer-pool/temp state across
    # 170+ heavy oracles and dies with allocator OOMs on the tail of a
    # full above-regime (10x fixture) run, and even connection-per-query
    # IN-process segfaulted after ~144 native create/destroy cycles —
    # both failures tool-side, every query passing in isolation. A
    # spawned child per oracle is ~0.3 s overhead and leaves nothing
    # behind; exceptions propagate through the future.
    #
    # CHECK_WORKERS=N (default 1: the driver's sequential behavior)
    # runs N oracle children CONCURRENTLY — the full 10x-fixture suite
    # is hours sequential, dominated by a handful of heavy dedup/text
    # oracles. Pair with CHECK_DUCK_THREADS to cap each child's cores.
    # Isolation is unchanged: still one fresh process per oracle.
    import os as _os
    workers = int(_os.environ.get("CHECK_WORKERS", "1"))
    ex = ProcessPoolExecutor(max_workers=workers, max_tasks_per_child=1)

    def run_oracle(sql):
        return ex.submit(_oracle_worker, (sf_dir, sql)).result()

    failures, passed = [], 0
    import os
    out_dirs = set(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # iterate the UNION of oracle entries, registered rows-only queries
    # (from the contract sidecar), and dumped outputs: ANY registered
    # query whose Verify output is missing must FAIL, not silently skip
    try:
        rows_only = set(json.load(open(f"{out_dir}/rows_only_contract.json")))
    except Exception:
        rows_only = set()
    names = [n for n in sorted(out_dirs | set(oracle) | rows_only)
             if not only or n in only]
    # with concurrent workers, enqueue every oracle up front so the
    # pool stays busy while the main process loads/compares in order
    futures = {}
    if workers > 1:
        futures = {n: ex.submit(_oracle_worker, (sf_dir, oracle[n]))
                   for n in names if n in oracle and n in out_dirs}
    for name in names:
        if name not in out_dirs:
            failures.append((name, "MISSING OUTPUT: oracle entry has no "
                                   "Verify parquet dump (did Verify crash?)"))
            continue
        try:
            got = ds.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as e:
            failures.append((name, f"SPARK READ ERROR: {e}"))
            continue
        arr_cols = has_arrays(got)
        if arr_cols:
            failures.append(
                (name, f"ARRAY-typed output column(s) {arr_cols}: the "
                       f"driver's pandas sort crashes on ndarray cells"))
            continue
        if name not in oracle:
            print(f"SKIP  {name}  (rows-only: {len(got)} rows, no oracle)")
            continue
        try:
            exp = (futures[name].result() if name in futures
                   else run_oracle(oracle[name]))
        except Exception as e:
            failures.append((name, f"ORACLE EXEC ERROR: {e}"))
            continue
        g_rows, g_cols = frame_rows(got)
        e_rows, e_cols = frame_rows(exp)
        if g_cols != e_cols:
            failures.append((name, f"COLS spark={g_cols} oracle={e_cols}"))
            continue
        if len(g_rows) != len(e_rows):
            failures.append(
                (name, f"ROWCOUNT spark={len(g_rows)} oracle={len(e_rows)}"))
            continue
        bad = None
        for i, (g, e) in enumerate(zip(g_rows, e_rows)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            failures.append(
                (name, f"VALUE row{bad[0]}\n  spark={bad[1]}\n  oracle={bad[2]}"))
        else:
            passed += 1
            print(f"PASS  {name}  ({len(g_rows)} rows, type-strict EXACT)", flush=True)
        del got, exp, g_rows, e_rows  # free before the next heavy pair
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{passed} passed, {len(failures)} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
