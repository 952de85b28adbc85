#!/usr/bin/env python3
"""Materialize a 10x-scaled copy of an sf directory for scale smokes.

Usage: python3 tools/make_sf1.py [SRC_SF_DIR] [DST_DIR] [COPIES]

Replicates each fact table COPIES times with consistently shifted keys so
referential joins (lineitem->orders->customer, lineitem->part/supplier,
events.user_id) stay intact across copies. `documents.text` gets a short
per-copy suffix so the DISTINCT-text count (what the LSH/dedup chains are
priced on) scales with the copy count instead of collapsing to the
original rep set; near-dup cluster structure within each copy is
preserved. nation/region are fixed-size dims and are copied verbatim.
Driver-side tooling only -- the library never reads this script's output
except when pointed at it via SPARK_GRAFT_SF_DIR.
"""
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT range AS i FROM range({copies})")

# table -> (shifted-key -> offset, extra column rewrites)
OFF = dict(doc=10_000, vec=10_000, ord=1_000_000, cust=100_000,
           part=100_000, supp=10_000, ev=1_000_000, user=10_000)
plans = {
    "documents": (
        {"doc_id": OFF["doc"]},
        {"text": "CASE WHEN i = 0 THEN text ELSE text || ' v' || i END",
         "n_chars": "length(CASE WHEN i = 0 THEN text ELSE text || ' v' || i END)"}),
    "embeddings": ({"vec_id": OFF["vec"]}, {}),
    "orders": ({"o_orderkey": OFF["ord"], "o_custkey": OFF["cust"]}, {}),
    "lineitem": ({"l_orderkey": OFF["ord"], "l_partkey": OFF["part"],
                  "l_suppkey": OFF["supp"]}, {}),
    "customer": ({"c_custkey": OFF["cust"]}, {}),
    "part": ({"p_partkey": OFF["part"]}, {}),
    "supplier": ({"s_suppkey": OFF["supp"]}, {}),
    "events": ({"event_id": OFF["ev"], "user_id": OFF["user"]}, {}),
    "nation": None,   # fixed dims: verbatim single copy
    "region": None,
}

for t, plan in plans.items():
    src_pq, dst_pq = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if plan is None:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src_pq}')) TO '{dst_pq}' (FORMAT PARQUET)")
    else:
        shifts, rewrites = plan
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src_pq}')").fetchall()]
        sel = ", ".join(
            rewrites[c] + f" AS {c}" if c in rewrites
            else f"{c} + i * {shifts[c]} AS {c}" if c in shifts
            else c
            for c in cols)
        con.execute(f"COPY (SELECT {sel} FROM read_parquet('{src_pq}') CROSS JOIN reps) TO '{dst_pq}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst_pq}')").fetchone()[0]
    # Guard: shifted PRIMARY keys must stay unique after replication.
    # Two-level replication (sf1 -> sf10) silently violated this — the
    # second level's i*offset blocks land inside the first level's key
    # range (e.g. custkey 285k distinct out of 1.5M rows), turning every
    # join into a ~5x many-to-many explosion. Replicate from the ORIGINAL
    # sf dir with a larger COPIES instead; this assert makes the broken
    # output impossible to produce silently.
    PK = {"documents": "doc_id", "embeddings": "vec_id", "orders": "o_orderkey",
          "customer": "c_custkey", "part": "p_partkey", "supplier": "s_suppkey",
          "events": "event_id"}
    if plan is not None and t in PK:
        dk = con.execute(f"SELECT count(DISTINCT {PK[t]}) FROM read_parquet('{dst_pq}')").fetchone()[0]
        assert dk == n, f"{t}.{PK[t]}: {dk} distinct of {n} rows — copy offsets collide; rerun from the original sf dir"
    print(f"{t}: {n} rows -> {dst_pq}")
