#!/usr/bin/env python
"""Synthesize a larger scale factor from /root/testdata/sf0.1 (bench only).

The driver testdata tops out at sf0.1; the scale behaviors worth probing
(the closure's broadcast→shuffle switch at 4M edges, AQE skew handling,
memory pressure of the checkpointed split) only appear ~10× higher. This
derives /tmp/sf1 deterministically from sf0.1 — NO external data — by
unioning N key-shifted copies:

- join keys shift per copy (o_custkey/c_custkey together, so the
  orders⋈customer base join of the fixture graph stays consistent and
  every copy contributes distinct datasets);
- document text is salted with a per-copy SUFFIX ON EVERY WORD, so each
  copy's word-n-gram vocabulary is disjoint from every other copy's while
  the WITHIN-copy overlap structure is exactly the original corpus's: the
  near-dup pair count scales linearly in N instead of exploding into
  cross-copy cliques. (A first attempt inserted a per-copy token BETWEEN
  words; that made every pair of docs sharing a common word share the
  shingle "tok word tok" — boilerplate-style shingle inflation that blew
  LSH candidates to 13.3M. Kept here as a warning; the hot-bucket cap in
  lsh_candidate_pairs now also guards the engine against real corpora
  shaped like that.);
- dimension tables (nation, region, part, supplier) stay as-is.

Usage: python scripts/make_sfN.py [N] [OUT_DIR]   (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def copies(sql_tpl: str, table: str) -> None:
        parts = " UNION ALL ".join(sql_tpl.format(i=i) for i in range(n))
        con.sql(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        print(table, con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0])

    ck = con.sql(f"SELECT max(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0]
    ok = con.sql(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    dk = con.sql(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    vk = con.sql(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    ek = con.sql(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
    uk = con.sql(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]

    copies(
        f"SELECT o_orderkey + {{i}}*{ok} AS o_orderkey, "
        f"o_custkey + {{i}}*{ck} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'",
        "orders",
    )
    copies(
        f"SELECT c_custkey + {{i}}*{ck} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'",
        "customer",
    )
    copies(
        f"SELECT l_orderkey + {{i}}*{ok} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SRC}/lineitem.parquet'",
        "lineitem",
    )
    copies(
        f"SELECT doc_id + {{i}}*{dk} AS doc_id, "
        f"regexp_replace(text, '(\\S+)', '\\1x{{i}}', 'g') AS text, "
        f"lang, source, n_chars FROM '{SRC}/documents.parquet'",
        "documents",
    )
    copies(
        f"SELECT vec_id + {{i}}*{vk} AS vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet'",
        "embeddings",
    )
    copies(
        f"SELECT event_id + {{i}}*{ek} AS event_id, ts, "
        f"user_id + {{i}}*{uk} AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'",
        "events",
    )
    for dim in ("nation", "region", "part", "supplier"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{out}/{dim}.parquet' (FORMAT parquet)"
        )
        print(dim, "copied")


if __name__ == "__main__":
    main()
