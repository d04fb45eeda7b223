#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables, compare value-exactly
(columns sorted by name, rows sorted by all columns).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Decimal objects -> str for stable compare; floats stay float;
    # datetimes normalized to one unit (pandas reads parquet us/ns unevenly)
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
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    # Verify dumps per-query exceptions here (a thrown query leaves no
    # parquet dir, so without this the absence would read as "not run"
    # rather than "broken" — the round-9 lesson).
    try:
        with open(f"{out_dir}/errors.json") as f:
            errors = json.load(f)
    except FileNotFoundError:
        errors = {}
    for name, msg in sorted(errors.items()):
        print(f"ERR  {name}: {msg}")
        # only errors on oracle-backed queries feed the oracle tally; any
        # other error still fails the run via the exit code below
        if name in oracles:
            failures += 1
    for name, sql in sorted(oracles.items()):
        if name in errors:
            continue  # already counted above; no parquet dump exists
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
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(a)} differing rows; first:")
                print(pd.concat([a[bad].head(3), b[bad].head(3)]))
                failures += 1
                continue
            print(f"ok   {name} ({len(a)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    # Non-oracle queries that threw don't feed the tally above, so the
    # summary line alone could read as all-green while the run exits 1.
    non_oracle_errs = sorted(set(errors) - set(oracles))
    if non_oracle_errs:
        print(f"NOTE: {len(non_oracle_errs)} non-oracle queries errored: "
              + ", ".join(non_oracle_errs))
    return 1 if failures or errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
