#!/usr/bin/env python3
"""Scale a driver fixture dir up by an integer factor (DEV TOOL only).

Usage: python3 tools/make_sf.py <srcSfDir> <outDir> <factor>

The driver only ships sf{0.001,0.01,0.1}; the round-5 verdict's top
item is MEASURED scale evidence above sf0.1. This derives sfN from
sf0.1 by key-remapped replication, preserving schema, referential
integrity and per-copy value distributions:

- Star-schema tables (lineitem/orders/customer/part/supplier): copy i
  adds i*stride to every key column, stride = that entity's key-domain
  size — so FK edges stay within a copy and joins scale linearly, the
  way TPC-H SF scaling grows the key domains. nation/region stay fixed
  (25/5 rows), as in TPC-H.
- events: event_id and user_id stride per copy; the time range is
  UNCHANGED, so the event stream gets factor× denser — same windows,
  bigger panes, which is the realistic way traffic grows.
- documents: doc_id strides; copy i>0 additionally replaces every 5th
  word with a copy token. That keeps each copy's INTERNAL near-dup
  structure identical to the original (within-copy LSH pair count
  scales linearly with copies) while pushing cross-copy shingle
  Jaccard far below near-dup thresholds — without this, every doc
  would gain factor-1 exact twins and the dedup workload would morph
  from "find rare near-dups" into "every doc is a dup".
- embeddings: vec_id strides; copy i>0 vectors are blended with
  seeded unit noise (cos≈0.5 to the source vector) so the ANN corpus
  grows without manufacturing factor-sized identical-vector clusters
  (which would degenerate every LSH bucket and SemDeDup cell).

Copy 0 is byte-identical to the source, so bounded query sets that
key on low ids (k-means init vec_id<k, brute-force samples doc_id<100,
the ss_* query set) remain well-defined.

Deterministic: seeded by (table, copy). Writes ~10 row groups per
table so Spark gets parallel splits.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDES = {
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ["nation", "region"]


def scaled_key_table(src: pa.Table, name: str, strides: dict, copy: int) -> pa.Table:
    t = src
    for col, stride in strides.items():
        idx = t.schema.get_field_index(col)
        typ = t.schema.field(idx).type
        shifted = pc.add(t.column(col), pa.scalar(copy * stride, type=typ))
        t = t.set_column(idx, t.schema.field(idx), shifted)
    return t


def perturb_documents(t: pa.Table, copy: int) -> pa.Table:
    tok = f"cpy{copy}tok"
    texts = t.column("text").to_pylist()
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        w = s.split(" ")
        for j in range(copy % 5, len(w), 5):
            w[j] = tok
        out.append(" ".join(w))
    arr = pa.array(out, type=pa.string())
    t = t.set_column(t.schema.get_field_index("text"), t.schema.field("text"), arr)
    n_chars = pa.array([None if s is None else len(s) for s in out], type=pa.int64())
    return t.set_column(t.schema.get_field_index("n_chars"),
                        t.schema.field("n_chars"), n_chars)


def perturb_embeddings(t: pa.Table, copy: int) -> pa.Table:
    col = t.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    rng = np.random.default_rng(42_000 + copy)
    noise = rng.standard_normal(flat.shape).astype(np.float32)
    scale = np.sqrt(np.mean(flat * flat)) or 1.0
    blended = (0.5 * flat + 0.866 * scale * noise).astype(np.float32)
    rebuilt = pa.ListArray.from_arrays(col.offsets, pa.array(blended, type=pa.float32()))
    return t.set_column(t.schema.get_field_index("embedding"),
                        t.schema.field("embedding"), rebuilt)


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    for name in FIXED:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{out}/{name}.parquet")
        print(f"{name}: copied")
    for name, strides in STRIDES.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        copies = []
        for i in range(factor):
            t = scaled_key_table(base, name, strides, i)
            if i > 0 and name == "documents":
                t = perturb_documents(t, i)
            if i > 0 and name == "embeddings":
                t = perturb_embeddings(t, i)
            copies.append(t)
        full = pa.concat_tables(copies)
        rg = max(1, full.num_rows // 10)
        pq.write_table(full, f"{out}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {base.num_rows} -> {full.num_rows} rows")


if __name__ == "__main__":
    main()
