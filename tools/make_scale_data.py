#!/usr/bin/env python3
"""Scaling-audit corpus: replicate the driver's sf0.1 tables N× (default
10 → "sf1") into target/scale_audit/sfN so Bench can measure a scaling
CURVE instead of asserting one. Local audit tool only (like
check_oracle.py) — engine code never reads this.

The replication is designed so every workload family scales HONESTLY —
naive row duplication would give each document 9 exact twins and blow the
dedup families up quadratically (per-group pairs, not corpus size):

  * Keyed tables: replica r offsets every primary/foreign key by r*S
    (S = 1e10, far above any sf0.1 key) — joins stay key-correct, key
    cardinality scales ×N, join fan-out per key is UNCHANGED.
  * documents.text: per-replica Caesar rotation of a-z. Token/shingle
    structure inside one replica is preserved bit-for-bit (the intra-
    replica near-dup graph is the same), while replicas occupy disjoint
    shingle/minhash spaces — so candidate pairs, LSH bucket sizes, and
    cluster counts all scale ×N, never ×N².
  * embeddings.embedding: per-replica ±1 sign pattern per dimension
    (seeded). Within a replica all dot products / norms are EXACTLY
    preserved (s_i² = 1), across replicas cosines decorrelate — ANN and
    semdedup workloads scale ×N with the same intra-replica geometry.
  * region/nation: true fixed dimensions, copied once, keys untouched
    (supplier/customer keep their nationkey so dimension joins stay
    broadcast-sized, exactly like a real 100 TB layout).
  * events: event_id/user_id offset — ×N users at the same per-user
    event density and the same time range (window density scales, which
    is what "more traffic" means).

Usage: make_scale_data.py [N] [srcDir] [outDir]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else f"/root/repo/target/scale_audit/sf{N}x"
S = 10_000_000_000  # key stride per replica

ALPHA = "abcdefghijklmnopqrstuvwxyz"

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY_ONCE = ["region", "nation"]


def caesar(col: pa.ChunkedArray, r: int) -> pa.Array:
    if r == 0:
        return col.combine_chunks()
    rot = ALPHA[r % 26:] + ALPHA[:r % 26]
    tbl = str.maketrans(ALPHA, rot)
    return pa.array([None if v is None else v.translate(tbl)
                     for v in col.to_pylist()], type=col.type)


def sign_flip(col: pa.ChunkedArray, r: int, rng_seed: int) -> pa.Array:
    vals = col.to_pylist()
    dim = next(len(v) for v in vals if v is not None)
    if r == 0:
        signs = np.ones(dim, dtype=np.float32)
    else:
        signs = np.where(
            np.random.default_rng(rng_seed + r).random(dim) < 0.5,
            np.float32(-1), np.float32(1))
    return pa.array([None if v is None else
                     (np.asarray(v, dtype=np.float32) * signs).tolist()
                     for v in vals], type=col.type)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_ONCE:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{OUT}/{t}.parquet")
        print(f"{t}: copied once")
    for t, keys in KEY_COLS.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(N):
            cols = {}
            for name in src.column_names:
                c = src.column(name)
                if name in keys:
                    cols[name] = pa.compute.add(c, r * S).cast(c.type)
                elif t == "documents" and name == "text":
                    cols[name] = caesar(c, r)
                elif t == "embeddings" and name == "embedding":
                    cols[name] = sign_flip(c, r, rng_seed=42)
                else:
                    cols[name] = c
            reps.append(pa.table(cols))
        out = pa.concat_tables(reps)
        # bounded row groups: a single mega-row-group serializes Spark's
        # scan (one task decodes everything) and silently turns every
        # map-dominated audit row into a single-thread measurement
        pq.write_table(out, f"{OUT}/{t}.parquet", row_group_size=16384)
        print(f"{t}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
