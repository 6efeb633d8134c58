#!/usr/bin/env python3
"""Local differential check: Spark (Verify output) vs DuckDB oracle.

Mimics the driver's harness: registers each corpus table as a DuckDB
view over the sf parquet, runs every oracle_sql.json entry, and compares
against the Spark parquet result — columns sorted by name, rows sorted,
values stringified. Usage: check_oracle.py <sfDir> <verifyOutDir>

TYPE FIDELITY (round-11 hardening): the Spark side is read NATIVELY with
pyarrow and the oracle side is fetched as an Arrow table — decimals stay
decimal128 end-to-end and are stringified as exact digits. The previous
version round-tripped BOTH sides through DuckDB + pandas float64, which
masked any value above float64's 2^53 exact range (both sides identically
lossy -> false "OK" while the driver's native read of the Spark parquet
diverged; see p11_hll_distinct, round 10).
"""
import datetime
import glob
import json
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Exact, side-independent string for one cell value."""
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        s = format(v, "f")                     # never scientific notation
        if "." in s:
            s = s.rstrip("0").rstrip(".")      # scale-independent digits
        return "0" if s == "-0" else s
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)                         # shortest round-trip form
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:               # normalize tz-aware to UTC-naive
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def norm_table(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    recs = tbl.select(cols).to_pylist()
    rows = [[canon(r[c]) for c in cols] for r in recs]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            scols, srows = norm_table(
                pa.concat_tables([pq.read_table(f) for f in files],
                                 promote_options="default"))
            ocols, orows = norm_table(con.sql(oracle[name]).fetch_arrow_table())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            failures += 1
        elif srows != orows:
            diff = next((i, a, b) for i, (a, b) in
                        enumerate(zip(srows + [['<eof>']], orows + [['<eof>']]))
                        if a != b)
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; "
                  f"first diff at {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    extra = [q for q in glob.glob(f"{out_dir}/*/") if
             q.rstrip('/').rsplit('/', 1)[-1] not in oracle]
    for q in extra:
        print(f"INFO rows-only (no oracle): {q.rstrip('/').rsplit('/',1)[-1]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
