#!/usr/bin/env python3
"""Local differential check: Spark (Verify output) vs DuckDB oracle.

Mimics the driver's t2 harness: registers each corpus table as a DuckDB
view over the sf parquet, runs every oracle_sql.json entry, and compares
against the Spark parquet result — columns sorted by name, rows sorted,
values stringified. Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(con, rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.astype(str).values.tolist()
    rows.sort()
    return list(df.columns), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            scols, srows = norm(con, con.sql(
                f"SELECT * FROM read_parquet({files!r})"))
            ocols, orows = norm(con, con.sql(oracle[name]))
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
