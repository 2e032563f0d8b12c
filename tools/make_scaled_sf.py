"""Build a PERFORMANCE-ONLY scaled corpus from an existing SF dir.

Usage: python tools/make_scaled_sf.py <src_sf_dir> <out_dir> <K>

Replicates every fact table K times with deterministic, copy-disjoint key
shifts so the workload grows LINEARLY (the point is wall-clock evidence
for the heavy tail at a data size where sf0.1's fixed stage latency no
longer dominates — VERDICT r9 item 2):

- TPC-H keys shift by copy * stride per key space, so join fan-outs and
  selectivities are preserved copy-by-copy (nation/region stay as-is).
- documents: every TOKEN gets a copy suffix for copies >= 1, so shingle /
  n-gram / vocabulary structure is preserved within a copy but DISJOINT
  across copies — dedup/LSH/LM workloads scale linearly instead of
  manufacturing K^2 cross-copy near-duplicate pairs that no real corpus
  growth would produce.  doc_id shifts keep ids unique.
- embeddings: labels shift per copy (block structure x K, no cross-copy
  candidate pairs), vec_ids shift.
- events: user_id/event_id shift per copy; timestamps keep their range
  (K x density — how a busier pipeline actually looks).

DuckDB does the rewrite (pure SQL over parquet, no Spark session).  Each
table lands as a DIRECTORY of one parquet file PER COPY PER CHUNK
(chunked on a stable key mod CHUNKS): the driver's single-file-per-table
layout makes every scan one task at any size (a 90 MB file is still one
split under the 128 MB default), which would cap scan parallelism at 1
and make core-count scaling unmeasurable — the whole point of this
corpus.  Deterministic for a given (src, K).
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 100_000_000  # far above any key in any test SF
CHUNKS = 4  # files per copy -> K*CHUNKS-way scan parallelism

CHUNK_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
    "documents": "doc_id",
}


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def gen(table: str, select_tpl: str) -> None:
        d = f"{out}/{table}.parquet"
        os.makedirs(d, exist_ok=True)
        key = CHUNK_KEY[table]
        for c in range(k):
            sel = select_tpl.format(S=c * STRIDE, K=c, src=f"{src}/{table}.parquet")
            for j in range(CHUNKS):
                con.execute(
                    f"COPY (SELECT * FROM ({sel}) WHERE {key} % {CHUNKS} = {j}) "
                    f"TO '{d}/c{c}_p{j}.parquet' (FORMAT PARQUET, CODEC 'SNAPPY')"
                )
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"{table}: {n} rows in {k * CHUNKS} files")

    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    gen("customer", "SELECT c_custkey + {S} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM '{src}'")
    gen("supplier", "SELECT s_suppkey + {S} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM '{src}'")
    gen("part", "SELECT p_partkey + {S} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM '{src}'")
    gen("orders", "SELECT o_orderkey + {S} AS o_orderkey, o_custkey + {S} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM '{src}'")
    gen("lineitem", "SELECT l_orderkey + {S} AS l_orderkey, l_partkey + {S} AS l_partkey, l_suppkey + {S} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM '{src}'")
    gen("events", "SELECT event_id + {S} AS event_id, ts, user_id + {S} AS user_id, event_type, value, props FROM '{src}'")
    gen("embeddings", "SELECT vec_id + {S} AS vec_id, embedding, label + {K} * 1000000 AS label FROM '{src}'")
    # copy 0 keeps the original text byte-for-byte; copies >= 1 suffix every
    # token (split/join on single spaces — the tokenizer the text operators
    # use), keeping within-copy token statistics intact and cross-copy
    # vocabularies disjoint
    gen(
        "documents",
        "SELECT doc_id + {S} AS doc_id, "
        "CASE WHEN {K} = 0 THEN text ELSE "
        "array_to_string(list_transform(string_split(text, ' '), t -> t || 'x{K}'), ' ') END AS text, "
        "lang, source, n_chars FROM '{src}'",
    )


if __name__ == "__main__":
    main()
