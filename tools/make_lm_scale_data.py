#!/usr/bin/env python3
"""Zipf-preserving LM scale corpus (round 16): a documents-only scale-up
under which the modified-Kneser-Ney family's count-of-counts stay
NONZERO at every recursion level, so t97's 100x row can be recorded
instead of (correctly) tripping the n2/n3 guard the way the Caesar-
rotation corpus does at N > 26 (make_scale_data.py replicas collide the
4-gram space there - the round-15 audit's documented null row).

Recipe (the round-15 verdict's prescription):
  * BULK - sample documents WITH REPLACEMENT at doc granularity, N x the
    base count: head-of-Zipf mass and 4-gram token volume scale x N with
    doc-internal structure bit-identical (the corpus-pass cost t97's
    scale claim is about).
  * TAIL SALT - per replica block, 20 tiny docs over replica-unique
    fresh tokens plant EXACT multiplicities at every KN level:
      - for k in 1..4: one length-4 doc repeated k times -> a raw
        4-gram type with count exactly k (fgc n1..n4 > 0);
      - for k in 2..3: k docs "w1_j b c d" (j = 1..k) -> the trigram
        (b, c, d) has exactly k distinct w1 extensions (cc234 n2, n3);
      - for k in 2..3: k docs "a w2_j c d" -> the bigram (c, d) has
        exactly k distinct w2 continuation types (cc34 n2, n3).
    A length-4 doc holds exactly one 4-gram and dedicated tokens cannot
    interfere (the TextAnalysisSpec corpus-planting rule), and the salt
    vocabulary grows linearly with N - the Zipf tail a real corpus
    grows, which is precisely what the Caesar corpus lacked.

Local audit tool only (like make_scale_data.py) - engine code never
reads this.

Usage: make_lm_scale_data.py [N] [srcDir] [outDir]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = (sys.argv[3] if len(sys.argv) > 3
       else f"/root/repo/target/scale_audit/lm{N}x")


def salt_docs(r):
    """The 20 per-replica tail docs (text, lang, source)."""
    docs = []
    # raw 4-gram counts 1..4
    for k in range(1, 5):
        doc = " ".join(f"q{r}r{k}t{j}" for j in range(4))
        docs += [doc] * k
    # cc234: exactly k distinct w1 for one fresh (b, c, d)
    for k in (2, 3):
        ctx = [f"q{r}c{k}{c}" for c in "bcd"]
        docs += [" ".join([f"q{r}c{k}w{j}"] + ctx) for j in range(k)]
    # cc34: exactly k distinct w2 for one fresh (c, d)
    for k in (2, 3):
        head, tail = f"q{r}d{k}a", [f"q{r}d{k}c", f"q{r}d{k}d"]
        docs += [" ".join([head, f"q{r}d{k}w{j}"] + tail) for j in range(k)]
    return [(d, "en", "salt") for d in docs]


def main():
    src = pq.read_table(f"{SRC}/documents.parquet")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    base = len(texts)
    rng = np.random.default_rng(1616)
    out_text, out_lang, out_src = [], [], []
    for r in range(N):
        for i in rng.integers(0, base, size=base):
            out_text.append(texts[i])
            out_lang.append(langs[i])
            out_src.append(sources[i])
        for t, lg, s in salt_docs(r):
            out_text.append(t)
            out_lang.append(lg)
            out_src.append(s)
    n = len(out_text)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(out_text, type=pa.string()),
        "lang": pa.array(out_lang, type=pa.string()),
        "source": pa.array(out_src, type=pa.string()),
        "n_chars": pa.array([len(t) for t in out_text], type=pa.int64()),
    })
    import os
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(tbl, f"{OUT}/documents.parquet", row_group_size=16384,
                   compression="zstd")
    print(f"wrote {n} docs ({base} base x {N} + {N * 20} salt) -> {OUT}")


if __name__ == "__main__":
    main()
