#!/usr/bin/env python3
"""Derive a multibyte-heavy documents fixture from an existing SF dir.

Usage: python3 tools/make_utf8_fixture.py <srcSfDir> <outDir>

Writes <outDir>/documents.parquet with deterministic non-ASCII rewrites
of every text (accented Latin, CJK, emoji, combining characters, and a
few degenerate short/empty docs), recomputing n_chars as CODE POINTS
(python len == Spark length() == DuckDB length()), and symlinks every
other table so the full Verify + check.py gate runs unchanged:

    sbt> runMain graft.Verify <outDir> /tmp/vout_utf8
    $ python3 tools/check.py <outDir> /tmp/vout_utf8

Any tx_*/dd_*/mm_* hash mismatch on this fixture is a code-point-vs-
byte divergence between the Spark implementation and the DuckDB oracle
(the mm_audio_peaks bug class from round 3). DEV TOOL only.
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# Deterministic multibyte decorations cycled by doc_id: two-byte
# (é ß ü), three-byte (中 文 ∑), four-byte/emoji (🚀 𝒳), and a
# combining sequence (e + U+0301) that is 2 code points but renders
# as one glyph — the case where "characters" != "code points".
DECor = [
    "héllo wörld", "中文 数据", "🚀 rocket", "naïve café",
    "straße größe", "𝒳 math", "données françaises", "étoile",
    "Ελληνικά κείμενο", "русский текст",
]

# word-level substitutions exercising code-point semantics inside
# otherwise-ASCII prose
SUBS = [(" the ", " thé "), (" and ", " änd "), (" data ", " dätä 中 ")]


def rewrite(doc_id: int, text: str) -> str:
    if text is None:
        return None
    # degenerate docs: empty, 1 multibyte char, 2 code points (the
    # trigram empty-range guard), all-multibyte
    m = doc_id % 50
    if m == 47:
        return ""
    if m == 48:
        return "中"
    if m == 49:
        return "é́"  # 2 code points incl. a combining mark
    t = text
    for a, b in SUBS:
        t = t.replace(a, b)
    return t + " " + DECor[doc_id % len(DECor)]


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(os.path.join(src, "documents.parquet"))
    rows = tbl.to_pylist()
    for r in rows:
        r["text"] = rewrite(r["doc_id"], r["text"])
        r["n_chars"] = len(r["text"]) if r["text"] is not None else None
    out_tbl = pa.Table.from_pylist(rows, schema=tbl.schema)
    pq.write_table(out_tbl, os.path.join(out, "documents.parquet"))
    for f in os.listdir(src):
        if f == "documents.parquet":
            continue
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f), dst)
    print(f"wrote {out}/documents.parquet ({len(rows)} docs) + symlinks")


if __name__ == "__main__":
    main()
