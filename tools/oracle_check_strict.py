#!/usr/bin/env python3
"""STRICT emulation of the driver's t2 hash gate.

Usage: python3 tools/oracle_check_strict.py <sfDir> <verifyOutDir> [query...]

Unlike oracle_check.py (which rounds floats to 9 digits and coerces
Decimal→float), this normalizes every value with plain str(): a Spark
parquet DECIMAL read back as decimal.Decimal('123.40') will NOT equal a
DuckDB float64 123.4 — which is exactly the mismatch the driver's
hash_match reported in round 1 on every decimal-output query. Queries
must therefore emit doubles (or strings/ints/bools/timestamps), never
top-level decimals.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # sequence cells (numpy arrays from array-typed columns) first: the
    # scalar NaN check `v != v` raises ValueError on an ndarray
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return str(list(v))
    if v is None or v != v:  # None / NaN
        return ""
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            raw = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            rawx = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got, exp = canon(raw), canon(rawx)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
        elif not got.equals(exp):
            neq = (got != exp).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[neq].head(3), exp[neq].head(3)],
                            keys=["spark", "duckdb"]))
            print("  spark dtypes:", dict(raw.dtypes.astype(str)))
            print("  duck  dtypes:", dict(rawx.dtypes.astype(str)))
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
