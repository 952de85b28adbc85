#!/usr/bin/env python3
"""Derive a HOT-KEYED variant of an sf directory for skew smokes.

Usage: python3 tools/make_hot.py [SRC_SF_DIR] [DST_DIR] [PCT]

Reassigns PCT% of events (by event_id mod) to a single user_id (0) —
the "one viral user owns a tenth of the stream" shape that breaks
per-user window/session operators whose partitioning isn't skew-safe.
Every other table is byte-copied verbatim (real copies, not symlinks —
the reader must not depend on the source dir surviving). Driver-side
tooling only.
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_hot"
pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if os.path.exists(d):
        os.remove(d)
    shutil.copyfile(s, d)
con.execute(f"""
    COPY (SELECT event_id,
                 ts,
                 CASE WHEN event_id % 100 < {pct} THEN 0 ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet'))
    TO '{dst}/events.parquet' (FORMAT PARQUET)""")
n, hot = con.execute(
    f"SELECT count(*), sum(CASE WHEN user_id = 0 THEN 1 ELSE 0 END) "
    f"FROM read_parquet('{dst}/events.parquet')").fetchone()
print(f"events: {n} rows, {hot} on the hot user ({100.0 * hot / n:.1f}%)")
