#!/usr/bin/env python3
"""Derive a Zipfian-vocabulary retrieval fixture (DEV TOOL only).

Usage: python3 tools/make_zipf.py <srcSfDir> <outDir> <nDocs> [seed]

Why: the shipped documents fixture has a 31-word vocabulary, so every
posting list is ~the whole corpus — the retrieval family's WORST
regime (tx_bm25_search's "selected terms are rare => sum df(selected)
<< corpus" contract is never exercised, and the scored fan-out is
inherently |queries| x corpus). Real text is Zipfian: a handful of
stopwords dominate tokens while most of the vocabulary is rare. This
tool rebuilds `documents` with a 30k-word vocabulary sampled from a
Zipf(s=1.05) rank distribution (all other tables copied verbatim), so:

- query tf-idf term selection has genuinely rare terms to pick;
- posting lists of selected terms are tiny vs the corpus, making the
  sub-corpus shuffle contract measurable;
- stopword skew (the one ~N-row reducer per stopword in the df pass)
  is present, as in real corpora.

Deterministic: one seeded generator; doc lengths 30 + (id*37 % 71)
words (30-100, the source fixture's range); lang/source cycle through
the source table's empirical values so group-by ops stay non-trivial.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 30_000
ZIPF_S = 1.05


def main() -> None:
    src, out, n_docs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 1234
    os.makedirs(out, exist_ok=True)
    for name in ("nation", "region", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")

    srcdoc = pq.read_table(f"{src}/documents.parquet")
    langs = sorted(set(srcdoc.column("lang").to_pylist()))
    sources = sorted(set(srcdoc.column("source").to_pylist()))

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks ** ZIPF_S
    p /= p.sum()
    vocab = np.array([f"zw{r}" for r in range(VOCAB)])

    ids = np.arange(n_docs, dtype=np.int64)
    lengths = 30 + (ids * 37) % 71
    total = int(lengths.sum())
    words = vocab[rng.choice(VOCAB, size=total, p=p)]
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n_docs)]

    t = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([langs[int(i) % len(langs)] for i in ids]),
        "source": pa.array([sources[int(i) % len(sources)] for i in ids]),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    rg = max(1, n_docs // 10)
    pq.write_table(t, f"{out}/documents.parquet", row_group_size=rg)

    # the contract this fixture exists to exercise, as numbers:
    uniq, counts = np.unique(words, return_counts=True)
    counts.sort()
    print(f"documents: {n_docs} docs, {total} tokens, "
          f"{len(uniq)} distinct words")
    print(f"top-5 word freqs: {counts[-5:][::-1].tolist()} "
          f"(stopword class); median freq: {int(np.median(counts))} "
          f"(rare class)")


if __name__ == "__main__":
    main()
