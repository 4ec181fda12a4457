#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/local_verify.py /tmp/verify_r4 /root/testdata/sf0.01 [query ...]

Reads each <outdir>/<query>/ parquet (Spark result) and runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
same sf tables, then compares row count, column names, and values
(columns sorted by name, rows sorted, 6-dp float canonicalization —
approximating the driver's hash compare).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            # 6 DECIMAL places like the driver's compare (6 significant
            # digits would collapse genuine >1e-6 divergences on values
            # >= 1000 into the same string)
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), list(df.columns)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            ora = con.execute(sql).df()
            srows, scols = canon(spark)
            orows, ocols = canon(ora)
            if scols != ocols:
                print(f"FAIL {name}: columns {scols} vs {ocols}")
                bad += 1
            elif len(srows) != len(orows):
                print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
                bad += 1
            elif srows != orows:
                diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
                print(f"FAIL {name}: values differ at sorted row {diff}:\n"
                      f"  spark:  {srows[diff]}\n  oracle: {orows[diff]}")
                bad += 1
            else:
                print(f"ok   {name} ({len(srows)} rows)")
        except Exception as e:
            print(f"ERR  {name}: {e}")
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
