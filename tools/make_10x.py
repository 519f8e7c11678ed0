#!/usr/bin/env python3
"""Build the docs/SCALE.md 10x-replicated corpus (dev-side, DuckDB):
replicate documents/embeddings/events/customer 10x with remapped ids
(each replica group of documents is a true duplicate cluster — the
adversarially duplication-heavy corpus), copy the remaining tables
unchanged, preserving parquet physical types as DuckDB round-trips them.

Optionally also writes a skewed twin (--skew): same tables, but one hot
user_id owns 10% of all events (event_id % 10 == 0) — the salted-join /
skew-immunity measurement input.

Optionally also writes a same-keys twin (--samekeys): events replicated
N× with fresh event_ids but user_id/ts UNCHANGED — per-window raw volume
grows N× while the per-(window, user) count table keeps its cardinality.
This is the isolation axis for the round-12 two-stage streaming top-N row
in docs/SCALE.md (collector input tracks cardinality, not volume).

Optionally also writes a hot-window twin (--hotwindow): events replicated
N× with fresh event_ids, user_id unchanged, and ts compressed into ONE
hour (epoch 2024-01-01 + event_id%3600 s) — the adversarial shape for
per-window streaming operators: a single 1 h window holds the entire
corpus. The round-12 two-stage streaming top-N row in docs/SCALE.md
measures both top-N machines against it.

Optionally also writes a high-cardinality hot-window twin (--highcard):
like --hotwindow but with user_id = event_id, so every event is a
distinct item — the per-window STATE BLOB adversary: a single-machine
windowed collector re-serializes a counter map with |events| entries
every micro-batch, while the two-stage form keeps (window, item) state
at row grain in the built-in aggregation.

Usage: make_10x.py <sfDir> <outDir> [--skew <skewOutDir>]
       [--samekeys <sameKeysOutDir>] [--hotwindow <hotWindowOutDir>]
       [--highcard <highCardOutDir>] [--replicas N]
"""
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(argv):
    sf, out = argv[0], argv[1]
    skew_out = None
    samekeys_out = None
    reps = 10
    if "--skew" in argv:
        skew_out = argv[argv.index("--skew") + 1]
    if "--samekeys" in argv:
        samekeys_out = argv[argv.index("--samekeys") + 1]
    hotwindow_out = None
    if "--hotwindow" in argv:
        hotwindow_out = argv[argv.index("--hotwindow") + 1]
    if "--replicas" in argv:
        reps = int(argv[argv.index("--replicas") + 1])
    import os
    os.makedirs(out, exist_ok=True)
    if skew_out:
        os.makedirs(skew_out, exist_ok=True)
    if samekeys_out:
        os.makedirs(samekeys_out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    con.execute("CREATE VIEW r AS SELECT unnest(range(%d)) AS rep" % reps)

    offs = {}
    for t, k in [("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id"), ("customer", "c_custkey")]:
        offs[t] = con.execute(f"SELECT max({k}) + 1 FROM {t}").fetchone()[0]
    u_off = offs["customer"]  # user ids remap in lockstep with customer keys

    plans = {
        "documents":
            f"SELECT doc_id + rep * {offs['documents']} AS doc_id, text, lang,"
            " source, n_chars FROM documents CROSS JOIN r",
        "embeddings":
            f"SELECT vec_id + rep * {offs['embeddings']} AS vec_id, embedding,"
            " label FROM embeddings CROSS JOIN r",
        "customer":
            f"SELECT c_custkey + rep * {u_off} AS c_custkey, c_name,"
            " c_nationkey, c_acctbal, c_mktsegment"
            " FROM customer CROSS JOIN r",
        "events":
            f"SELECT event_id + rep * {offs['events']} AS event_id, ts,"
            f" user_id + rep * {u_off} AS user_id, event_type, value, props"
            " FROM events CROSS JOIN r",
    }
    for t in TABLES:
        sel = plans.get(t, f"SELECT * FROM {t}")
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(f"10x corpus at {out}")

    if skew_out:
        hot = con.execute("SELECT min(c_custkey) FROM customer").fetchone()[0]
        for t in TABLES:
            if t == "events":
                sel = (f"SELECT event_id, ts, CASE WHEN event_id % 10 = 0"
                       f" THEN {hot} ELSE user_id END AS user_id,"
                       f" event_type, value, props FROM '{out}/events.parquet'")
            else:
                sel = f"SELECT * FROM '{out}/{t}.parquet'"
            con.execute(f"COPY ({sel}) TO '{skew_out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"skewed twin at {skew_out} (hot user {hot} owns 10%)")

    if samekeys_out:
        for t in TABLES:
            if t == "events":
                sel = (f"SELECT event_id + rep * {offs['events']} AS event_id,"
                       " ts, user_id, event_type, value, props"
                       " FROM events CROSS JOIN r")
            else:
                sel = f"SELECT * FROM {t}"
            con.execute(f"COPY ({sel}) TO '{samekeys_out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"same-keys twin at {samekeys_out} ({reps}x events, unchanged user ids)")

    if hotwindow_out:
        import os
        os.makedirs(hotwindow_out, exist_ok=True)
        for t in TABLES:
            if t == "events":
                sel = (f"SELECT event_id + rep * {offs['events']} AS event_id,"
                       " TIMESTAMP '2024-01-01 00:00:00'"
                       " + to_seconds(event_id % 3600) AS ts,"
                       " user_id, event_type, value, props"
                       " FROM events CROSS JOIN r")
            else:
                sel = f"SELECT * FROM {t}"
            con.execute(f"COPY ({sel}) TO '{hotwindow_out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"hot-window twin at {hotwindow_out} ({reps}x events inside one hour)")

    if "--highcard" in argv:
        highcard_out = argv[argv.index("--highcard") + 1]
        import os
        os.makedirs(highcard_out, exist_ok=True)
        for t in TABLES:
            if t == "events":
                sel = (f"SELECT event_id + rep * {offs['events']} AS event_id,"
                       " TIMESTAMP '2024-01-01 00:00:00'"
                       " + to_seconds(event_id % 3600) AS ts,"
                       f" event_id + rep * {offs['events']} AS user_id,"
                       " event_type, value, props"
                       " FROM events CROSS JOIN r")
            else:
                sel = f"SELECT * FROM {t}"
            con.execute(f"COPY ({sel}) TO '{highcard_out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"high-cardinality hot-window twin at {highcard_out}"
              f" ({reps}x events, one hour, user_id = event_id)")


if __name__ == "__main__":
    main(sys.argv[1:])
