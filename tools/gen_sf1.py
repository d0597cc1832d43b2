"""Generate an sf1 slice (10x the bench scale) under /tmp for the
one-decade-up scale sweep (VERDICT r5 #8). The driver's own generator
scales by ADDING USERS over the same 30-day window (sf0.001 -> sf0.1 is
15 -> 1500 users); this reproduces that shape from the sf0.1 slice: 10
id-shifted copies, so channel/doc/vector cardinality grows 10x while
per-key row counts stay constant — the realistic archive scale-up.

Density control (what a naive 10x copy would break):
  * documents: every word gets a per-copy suffix, so intra-copy near-dup
    structure is preserved exactly while cross-copy similarity drops to
    zero — pair counts scale 10x, not 100x;
  * embeddings: a per-copy epsilon shifts each vector off its clones so
    ANN rankings stay non-degenerate.

Only the tables the four headline families read are generated
(events, documents, embeddings). Usage:

    python tools/gen_sf1.py [out_dir]     # default /tmp/pvspark-sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
#: id offsets per copy — beyond every real id in the sf0.1 slice
UOFF = 1_000_000
EOFF = 10_000_000
DOFF = 1_000_000
VOFF = 1_000_000


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pvspark-sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    k = f"range({COPIES})"

    con.execute(f"""
        COPY (
          SELECT e.event_id + c.range * {EOFF} AS event_id,
                 e.user_id + c.range * {UOFF} AS user_id,
                 e.ts, e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e CROSS JOIN {k} c
        ) TO '{out}/events.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
        COPY (
          SELECT d.doc_id + c.range * {DOFF} AS doc_id,
                 d.* EXCLUDE (doc_id, text),
                 CASE WHEN c.range = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)',
                           '\\1x' || CAST(c.range AS VARCHAR), 'g')
                 END AS text
          FROM '{SRC}/documents.parquet' d CROSS JOIN {k} c
        ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
        COPY (
          SELECT v.vec_id + c.range * {VOFF} AS vec_id,
                 v.* EXCLUDE (vec_id, embedding),
                 list_transform(v.embedding,
                   x -> CAST(x + c.range * 0.0001 AS FLOAT)) AS embedding
          FROM '{SRC}/embeddings.parquet' v CROSS JOIN {k} c
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)
    """)
    for t in ("events", "documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    # the relational tables are not part of the decade-up claim, but
    # check_oracles registers a view per table — link them through so
    # the sf1 dir is a complete sf directory
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"sf1 slice at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
