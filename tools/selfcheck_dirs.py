#!/usr/bin/env python3
"""selfcheck variant for scale-generated fixtures where each table is a
DIRECTORY of part files (ScaleGen output) rather than a single parquet
file. Same compare as tools/selfcheck.py (columns sorted by name, rows
sorted by all columns, value-exact).

Usage: python3 tools/selfcheck_dirs.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
            theirs = con.sql(sql).df()
            a, b = norm(mine), norm(theirs)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                failures += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                failures += 1
                continue
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} differing rows")
                failures += 1
                continue
            print(f"ok   {name} ({len(a)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
    total = len(oracles)
    print(f"\n{total - failures}/{total} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
