"""Build a deterministic 10x-sf0.1 dataset for the second scale decade.

SCALE.md's measured ratios stop at sf0.01 -> sf0.1 (one decade);
this tool manufactures the NEXT decade — an "sf1"-shaped directory at
/tmp/dss-scale/sf1 — by replicating the sf0.1 FACT tables 10x with
deterministic key shifts, so workload-growth and plan-growth can be
separated empirically beyond 10x.  No randomness: replica r shifts
every primary key by r * STRIDE and rewrites text tokens with an
`_r{r}` suffix, so

- intra-replica structure (dup density, join fanout, skew) is
  EXACTLY the sf0.1 corpus, replicated;
- cross-replica token sets are DISJOINT (a grown corpus adds new
  content, it does not photocopy the old one) — pair-emitting dedup
  work grows linearly with replicas, which is precisely the property
  a scale-decade measurement needs to isolate plan growth;
- dimension tables (region/nation/customer/supplier/part) stay
  fixed, as dimensions do at 100 TB.

Usage: python tools/scaleup.py [out_root]   (default /tmp/dss-scale)
Writes <out_root>/sf1/{table}.parquet; ~10 s with DuckDB.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
DOC_STRIDE = 10_000_000  # clear of _ctrl_corpus's +1,000,000 dup ids
ORDER_STRIDE = 10_000_000
VEC_STRIDE = 100_000
EVENT_STRIDE = 10_000_000


def build(out_root: str = "/tmp/dss-scale") -> str:
    out = os.path.join(out_root, "sf1")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep")

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )

    # facts: replicate with key shifts
    copy(
        f"""SELECT l_orderkey + rep * {ORDER_STRIDE} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet' CROSS JOIN r""",
        "lineitem",
    )
    copy(
        f"""SELECT o_orderkey + rep * {ORDER_STRIDE} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{SRC}/orders.parquet' CROSS JOIN r""",
        "orders",
    )
    copy(
        f"""SELECT event_id + rep * {EVENT_STRIDE} AS event_id,
               ts, user_id, event_type, value, props
        FROM '{SRC}/events.parquet' CROSS JOIN r""",
        "events",
    )
    # documents: shift ids AND make token sets replica-disjoint
    copy(
        f"""SELECT doc_id + rep * {DOC_STRIDE} AS doc_id,
               array_to_string(list_transform(str_split(text, ' '),
                   x -> x || '_r' || CAST(rep AS VARCHAR)), ' ') AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet' CROSS JOIN r""",
        "documents",
    )
    # embeddings: shift ids and ROTATE dimensions by rep (a circular
    # shift is an isometry — every intra-replica distance/cosine is
    # EXACTLY the sf0.1 geometry — while cross-replica cosines of the
    # "same" vector decorrelate, so near-dup pair counts grow
    # linearly with replicas instead of photocopy-quadratically; the
    # identical-copy variant measured output x198 for data x10)
    copy(
        f"""SELECT vec_id + rep * {VEC_STRIDE} AS vec_id,
               list_transform(range(1, 65),
                   i -> embedding[1 + ((i - 1 + rep * 7) % 64)])
                 AS embedding,
               label
        FROM '{SRC}/embeddings.parquet' CROSS JOIN r""",
        "embeddings",
    )
    # dimensions: fixed
    for dim in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM '{SRC}/{dim}.parquet'", dim)
    return out


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dss-scale"
    print(build(root))
