"""Build deterministic 10x datasets for the second and third scale
decades.

SCALE.md's driver-shipped ratios stop at sf0.01 -> sf0.1 (one
decade); this tool manufactures the NEXT decades — an "sf1"-shaped
directory (10x sf0.1) and, chained from it, an "sf10" (100x sf0.1)
— by replicating the FACT tables 10x with deterministic key shifts,
so workload-growth and plan-growth can be separated empirically
beyond 10x.  No randomness: replica r shifts every primary key by
r * stride and rewrites text tokens with an `_r{r}` suffix, so

- intra-replica structure (dup density, join fanout, skew) is
  EXACTLY the source corpus, replicated;
- cross-replica token sets are DISJOINT (a grown corpus adds new
  content, it does not photocopy the old one) — pair-emitting dedup
  work grows linearly with replicas, which is precisely the property
  a scale-decade measurement needs to isolate plan growth;
- embeddings get a per-replica isometry (dimension rotation composed
  with stage-keyed sign flips: intra-replica geometry exact,
  cross-replica cosines decorrelated);
- dimension tables (region/nation/customer/supplier/part) stay
  fixed, as dimensions do at 100 TB.

Chaining is closed under these transforms: sf10's tokens carry
`_rA_rB` suffixes (still replica-disjoint), its embedding isometries
compose (rotation x stage-keyed sign flips — still isometries, and
distinct across every chained replica path, which rotation alone is
NOT: 7*(r1+r2) mod 64 collides by pigeonhole past 64 replicas), and
its key strides scale by the replica count so shifted ranges never
collide.

Usage:
  python tools/scaleup.py                  # sf0.1 -> /tmp/dss-scale/sf1
  python tools/scaleup.py /tmp/dss-scale sf10   # chain sf1 -> sf10
  python tools/scaleup.py /tmp/dss-scale sf100o # orders-only 4th decade
  python tools/scaleup.py /tmp/dss-scale sf100d # docs-only 4th decade
  python tools/scaleup.py /tmp/dss-scale sf1000d # docs-only 5th decade
Writes <out_root>/<name>/{table}.parquet; ~10 s (sf1) / ~2 min (sf10) /
~6 min (sf1000d, streamed per replica into a parquet directory — the
single-statement form OOMs at 52.5 M docs).
"""

from __future__ import annotations

import os
import shutil
import sys

import hashlib

import duckdb

REPLICAS = 10


def _sign_pattern(build_name: str, rep: int) -> str:
    """DuckDB list literal of 64 deterministic ±1.0 sign flips.

    Bits come from md5 over ``"<build_name>:r<rep>"`` (128 bits ≥ 64
    dims), so the pattern depends on the replica AND the build stage —
    chained transforms from different (stage, rep) paths differ except
    with probability ~2^-64.  rep 0 is pinned to the identity so each
    decade contains its source corpus verbatim.
    """
    if rep == 0:
        signs = [1.0] * 64
    else:
        bits = int.from_bytes(
            hashlib.md5(f"{build_name}:r{rep}".encode()).digest(), "big"
        )
        signs = [1.0 if (bits >> i) & 1 else -1.0 for i in range(64)]
    return "[" + ", ".join(str(s) for s in signs) + "]"
# Base strides clear _ctrl_corpus's +1,000,000 derived-dup ids; each
# chained decade multiplies them by REPLICAS so replica key ranges
# stay disjoint.
DOC_STRIDE = 10_000_000
ORDER_STRIDE = 10_000_000
VEC_STRIDE = 100_000
EVENT_STRIDE = 10_000_000


def build(
    out_root: str = "/tmp/dss-scale",
    name: str = "sf1",
    src: str = "/root/testdata/sf0.1",
    stride_scale: int = 1,
) -> str:
    out = os.path.join(out_root, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep")
    doc_stride = DOC_STRIDE * stride_scale
    order_stride = ORDER_STRIDE * stride_scale
    vec_stride = VEC_STRIDE * stride_scale
    event_stride = EVENT_STRIDE * stride_scale

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    # facts: replicate with key shifts
    copy(
        f"""SELECT l_orderkey + rep * {order_stride} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet' CROSS JOIN r""",
        "lineitem",
    )
    copy(
        f"""SELECT o_orderkey + rep * {order_stride} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet' CROSS JOIN r""",
        "orders",
    )
    copy(
        f"""SELECT event_id + rep * {event_stride} AS event_id,
               ts, user_id, event_type, value, props
        FROM '{src}/events.parquet' CROSS JOIN r""",
        "events",
    )
    # documents: shift ids AND make token sets replica-disjoint
    copy(
        f"""SELECT doc_id + rep * {doc_stride} AS doc_id,
               array_to_string(list_transform(str_split(text, ' '),
                   x -> x || '_r' || CAST(rep AS VARCHAR)), ' ') AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet' CROSS JOIN r""",
        "documents",
    )
    # embeddings: shift ids and apply a per-replica ISOMETRY — a
    # circular dimension rotation COMPOSED with md5-derived per-
    # dimension sign flips keyed by (build name, rep).  Either alone
    # is an isometry (intra-replica distance/cosine geometry stays
    # EXACTLY the source), but rotation alone does not survive
    # chaining: composing shift-by-7r across two decades yields
    # 7*(r1+r2) mod 64, and by pigeonhole >64 chained replicas share
    # rotations, making whole replica pairs bit-identical (measured:
    # the identical-copy variant inflated near-dup output x198 for
    # data x10).  The sign pattern is keyed by the BUILD NAME too, so
    # stage-1's replica a and stage-2's replica a are different
    # transforms and (a,0)/(0,a) chains cannot cancel; rep 0 of every
    # stage keeps the identity so each decade still contains its
    # source corpus verbatim, as a grown corpus would.
    con.execute(
        "CREATE VIEW signs AS "
        + " UNION ALL ".join(
            f"SELECT {rep} AS rep, "
            f"{_sign_pattern(name, rep)}::DOUBLE[] AS sgn"
            for rep in range(REPLICAS)
        )
    )
    copy(
        f"""SELECT vec_id + rep * {vec_stride} AS vec_id,
               list_transform(range(1, 65),
                   i -> (sgn[i]
                         * embedding[1 + ((i - 1 + rep * 7) % 64)])::FLOAT)
                 AS embedding,
               label
        FROM '{src}/embeddings.parquet'
        CROSS JOIN r
        JOIN signs USING (rep)""",
        "embeddings",
    )
    # dimensions: fixed
    for dim in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM '{src}/{dim}.parquet'", dim)
    return out


def build_embeddings_only(
    out_root: str,
    name: str,
    src: str,
    stride_scale: int,
) -> str:
    """Chain ONLY the embeddings table another decade (same isometry
    transform as :func:`build`), symlinking every other table from the
    source dir.  Exists for the FOURTH scale decade: 2 M vectors is a
    30 MB build, while a full sf100 would be a 6-billion-row lineitem
    — the embedding-family queries are the only ones whose fourth
    decade is worth the disk."""
    out = os.path.join(out_root, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep")
    con.execute(
        "CREATE VIEW signs AS "
        + " UNION ALL ".join(
            f"SELECT {rep} AS rep, "
            f"{_sign_pattern(name, rep)}::DOUBLE[] AS sgn"
            for rep in range(REPLICAS)
        )
    )
    vec_stride = VEC_STRIDE * stride_scale
    con.execute(
        f"""COPY (
        SELECT vec_id + rep * {vec_stride} AS vec_id,
               list_transform(range(1, 65),
                   i -> (sgn[i]
                         * embedding[1 + ((i - 1 + rep * 7) % 64)])::FLOAT)
                 AS embedding,
               label
        FROM '{src}/embeddings.parquet'
        CROSS JOIN r
        JOIN signs USING (rep)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def build_orders_only(
    out_root: str,
    name: str,
    src: str,
    stride_scale: int,
) -> str:
    """Chain ONLY the orders table another decade (same key-shift
    replication as :func:`build`), symlinking every other table from
    the source dir.  Exists for the FACT-TABLE window family's fourth
    decade: ``window_ntile_bucketed_orders`` was built precisely so
    the exact-global-rank claim could be decade-measured on a fact
    table (customer is a pinned dimension), but the manufactured
    sf100d/sf1000d corpora are documents-only, so its decade series
    stopped at sf10 (r12 verdict item #4).  150 M orders is a ~2 GB
    build; a full sf100 would be a 6-billion-row lineitem.  Streamed
    one replica per COPY into a parquet directory like the documents
    parts mode (the single-statement cross join would materialize all
    150 M rows first)."""
    out = os.path.join(out_root, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    order_stride = ORDER_STRIDE * stride_scale
    src_ord = f"{src}/orders.parquet"
    src_glob = (
        src_ord + "/*.parquet" if os.path.isdir(src_ord) else src_ord
    )
    pdir = f"{out}/orders.parquet"
    os.makedirs(pdir, exist_ok=True)
    for rep in range(REPLICAS):
        con.execute(
            f"""COPY (
            SELECT o_orderkey + {rep} * {order_stride} AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM {src_glob!r}
            ) TO '{pdir}/part-{rep:03d}.parquet' (FORMAT PARQUET)"""
        )
    for t in (
        "region nation customer supplier part lineitem "
        "events documents embeddings"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def build_documents_only(
    out_root: str,
    name: str,
    src: str,
    stride_scale: int,
    parts: bool = False,
) -> str:
    """Chain ONLY the documents table another decade (same id-shift +
    replica-disjoint token-suffix transform as :func:`build`),
    symlinking every other table from the source dir.  Exists for the
    text/MinHash family's FOURTH scale decade: 5 M documents is a
    ~3 GB build, while a full sf100 would be a 6-billion-row
    lineitem — the documents-family queries (curation, incremental
    dedup, controlled-rate MinHash) are the only ones whose fourth
    decade is worth the disk here, mirroring build_embeddings_only."""
    out = os.path.join(out_root, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    doc_stride = DOC_STRIDE * stride_scale
    src_doc = f"{src}/documents.parquet"
    src_glob = (
        src_doc + "/*.parquet" if os.path.isdir(src_doc) else src_doc
    )
    if parts:
        # Stream one replica per COPY into a parquet DIRECTORY (Spark
        # reads it natively): the single-statement cross-join form
        # materializes the whole output first and OOMs past ~50 M
        # docs (measured: 100.6 GiB at the fifth decade).  Source
        # globbed too, so a parts-built dir chains another decade.
        pdir = f"{out}/documents.parquet"
        os.makedirs(pdir, exist_ok=True)
        for rep in range(REPLICAS):
            con.execute(
                f"""COPY (
                SELECT doc_id + {rep} * {doc_stride} AS doc_id,
                       array_to_string(list_transform(str_split(text, ' '),
                           x -> x || '_r{rep}'), ' ') AS text,
                       lang, source, n_chars
                FROM {src_glob!r}
                ) TO '{pdir}/part-{rep:03d}.parquet' (FORMAT PARQUET)"""
            )
    else:
        con.execute(
            f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep"
        )
        con.execute(
            f"""COPY (
            SELECT doc_id + rep * {doc_stride} AS doc_id,
                   array_to_string(list_transform(str_split(text, ' '),
                       x -> x || '_r' || CAST(rep AS VARCHAR)), ' ') AS text,
                   lang, source, n_chars
            FROM '{src}/documents.parquet' CROSS JOIN r
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
        )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    return out


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dss-scale"
    which = sys.argv[2] if len(sys.argv) > 2 else "sf1"
    if which == "sf1":
        print(build(root, "sf1"))
    elif which == "sf10":
        sf1 = os.path.join(root, "sf1")
        if not os.path.isdir(sf1):
            build(root, "sf1")
        print(build(root, "sf10", src=sf1, stride_scale=REPLICAS))
    elif which == "sf100e":
        sf10 = os.path.join(root, "sf10")
        if not os.path.isdir(sf10):
            raise SystemExit("build sf10 first")
        print(
            build_embeddings_only(
                root, "sf100e", src=sf10, stride_scale=REPLICAS**2
            )
        )
    elif which == "sf100o":
        sf10 = os.path.join(root, "sf10")
        if not os.path.isdir(sf10):
            raise SystemExit("build sf10 first")
        print(
            build_orders_only(
                root, "sf100o", src=sf10, stride_scale=REPLICAS**2
            )
        )
    elif which == "sf100d":
        sf10 = os.path.join(root, "sf10")
        if not os.path.isdir(sf10):
            raise SystemExit("build sf10 first")
        print(
            build_documents_only(
                root, "sf100d", src=sf10, stride_scale=REPLICAS**2
            )
        )
    elif which == "sf1000d":
        # FIFTH documents decade (52.5 M docs, ~8 GB): chained from
        # sf100d — the transform family is closed, so suffixes become
        # _rA_rB_rC and strides scale by REPLICAS**3.  Only the
        # shuffle-free/banded documents queries are worth measuring
        # here; pair-emitting forms take hours.
        sf100d = os.path.join(root, "sf100d")
        if not os.path.isdir(sf100d):
            raise SystemExit("build sf100d first")
        print(
            build_documents_only(
                root,
                "sf1000d",
                src=sf100d,
                stride_scale=REPLICAS**3,
                parts=True,
            )
        )
    else:
        raise SystemExit(
            f"unknown target {which!r}; use sf1, sf10, sf100e, sf100o, "
            "sf100d, or sf1000d"
        )
