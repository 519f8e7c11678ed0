#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows sorted, exact values).
Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    # sort rows by all columns for order-independent compare
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        # a Verify-side failure leaves a tombstone instead of a parquet dir
        # (round-7 lesson: failures must surface as err rows, not vanish)
        import os
        tomb = f"{out_dir}/{name}.error"
        if os.path.exists(tomb):
            results[name] = "ERR(spark) " + open(tomb).read().strip()[:120]
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"))
            want = canon(con.sql(sql))
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
        else:
            try:
                import pandas.testing as pdt
                pdt.assert_frame_equal(got, want, check_dtype=False,
                                       check_exact=True)
                results[name] = f"OK ({len(got)} rows)"
            except AssertionError as e:
                results[name] = "VALUES " + str(e).split("\n")[0][:120]
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{name:<{width}}  {v}")
    print(f"== {n_ok}/{len(results)} oracle-checked queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
