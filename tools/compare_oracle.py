#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows as multisets, exact values).

TYPE-FAITHFUL (round-9 hardening): the round-8 version canonicalized both
sides through pandas with check_dtype=False, which silently degrades DuckDB
HUGEINT / DECIMAL(38,0) through float64 — hiding exactly the difference the
driver's type-faithful hash sees (9 records shipped "green" locally and
failed the driver). This version:
  1. FAILS any oracle whose result carries a wide type the driver's record
     cannot represent faithfully (HUGEINT, DECIMAL(38,x)) — cast it in the
     SQL (sums -> BIGINT) or re-encode as VARCHAR (moments > 2^53).
  2. Requires dtype compatibility between the Spark parquet record and the
     oracle result (integer widths may differ; int-vs-float/decimal or
     numeric-vs-text may not).
  3. Compares values entirely inside DuckDB via EXCEPT ALL over VARCHAR-cast
     projections — no pandas / float64 round-trip anywhere.
Usage: compare_oracle.py <sfDir> <verifyOutDir> [name,name,...]
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# the driver's record cannot hold these faithfully: shipping one means the
# local gate and the driver gate diverge — always an error here
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL(38")

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_class(t):
    t = t.upper()
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return t  # decimals must match exactly (precision/scale render)
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def cols_of(con, query):
    rel = con.sql(query)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        # an aborted statement poisons the implicit transaction for every
        # later query — clear it before each compare
        try:
            con.execute("ROLLBACK")
        except Exception:
            pass
        # a Verify-side failure leaves a tombstone instead of a parquet dir
        # (round-7 lesson: failures must surface as err rows, not vanish)
        tomb = f"{out_dir}/{name}.error"
        if os.path.exists(tomb):
            results[name] = "ERR(spark) " + open(tomb).read().strip()[:120]
            continue
        got_q = f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
        try:
            got_cols = cols_of(con, got_q)
            want_cols = cols_of(con, sql)
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue

        bad = [f"{c}:{t}" for c, t in want_cols
               if any(t.upper().startswith(f) for f in FORBIDDEN)]
        if bad:
            results[name] = f"WIDETYPE oracle emits {bad} — cast in the SQL"
            continue

        got_sorted = sorted(got_cols)
        want_sorted = sorted(want_cols)
        if [c for c, _ in got_sorted] != [c for c, _ in want_sorted]:
            results[name] = (f"SCHEMA got={[c for c, _ in got_sorted]} "
                             f"want={[c for c, _ in want_sorted]}")
            continue
        mism = [f"{gc}: spark={gt} oracle={wt}"
                for (gc, gt), (_, wt) in zip(got_sorted, want_sorted)
                if type_class(gt) != type_class(wt)]
        if mism:
            results[name] = "DTYPE " + "; ".join(mism)[:160]
            continue

        # exact multiset compare inside DuckDB: VARCHAR-cast projections,
        # EXCEPT ALL both ways — integers/decimals/strings render exactly,
        # and doubles render identically because BOTH sides are DuckDB
        # values by the time they are cast
        proj = ", ".join(
            f'CAST("{c}" AS VARCHAR) AS "{c}"' for c, _ in got_sorted)
        try:
            n_got, n_want, n_diff = con.sql(
                f"""WITH g AS (SELECT {proj} FROM ({got_q})),
                         w AS (SELECT {proj} FROM ({sql}))
                    SELECT (SELECT count(*) FROM g),
                           (SELECT count(*) FROM w),
                           (SELECT count(*) FROM
                             ((SELECT * FROM g EXCEPT ALL SELECT * FROM w)
                              UNION ALL
                              (SELECT * FROM w EXCEPT ALL SELECT * FROM g)))
                """).fetchone()
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        if n_got != n_want:
            results[name] = f"ROWS got={n_got} want={n_want}"
        elif n_diff:
            results[name] = f"VALUES {n_diff} multiset-diff rows of {n_got}"
        else:
            results[name] = f"OK ({n_got} rows)"
    if not results:
        print("no queries matched filter")
        return 1
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{name:<{width}}  {v}")
    print(f"== {n_ok}/{len(results)} oracle-checked queries match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
