"""Embedding similarity search: brute-force cosine top-k (baseline)
and random-hyperplane LSH bucketing (the scale path).

Spark-first design notes:

- Vectors are ``array<float>`` columns; all arithmetic happens in
  Column expressions (``zip_with`` + ``aggregate`` fold — JVM-side,
  no Python in the loop). Elements are cast to double once so both
  engines sum the same IEEE doubles in the same (sequential) order.
- Brute force is the *correctness baseline*: broadcast the (small)
  query set against a single pass over the corpus — one scan, no
  shuffle, then a per-query top-k window. Right answer, O(|Q|·|C|)
  work: fine for |Q| small, unusable for all-pairs at 100 TB.
- The LSH path buckets vectors by the sign pattern of ``p`` random
  hyperplane projections; candidates come only from the query's own
  bucket, making the search O(|C|/2^p) per query. Hyperplane weights
  derive from md5 (engine-portable, deterministic), so even this
  approximate path is oracle-checkable in DuckDB.
- Ordering always uses the ROUNDED cosine plus a vec_id tiebreak so
  rank boundaries can't flip on 1-ulp float noise between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

HEX = "0123456789abcdef"


def vec_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same order as a SQL engine's
    list_sum, so results are bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_seq_udf():
    """Arrow-vectorized LEFT-FOLD dot product over fixed-dim vector
    pairs: one numpy op per dimension, accumulated in declaration
    order, so every IEEE addition/multiplication happens in exactly
    the order of the interpreted aggregate(zip_with(...)) fold AND of
    DuckDB's list_sum(list_transform(...)) — results are
    bit-identical across all three forms (numpy float64 ops are the
    same correctly-rounded IEEE doubles as the JVM's).

    Why a Pandas UDF: the higher-order-function form runs in Spark's
    expression INTERPRETER (measured ~10x the rest of the pair-stage
    wall at the 20k-vector scale point), and an unrolled 200-node
    column-arithmetic form pays seconds of Janino compile per query
    (worst case it exceeds codegen limits and falls back to the
    interpreter anyway).  Arrow batching moves 2*dim doubles per pair
    once and does dim vectorized ops per batch — no per-row Python,
    no codegen cliff, constant setup cost."""

    @F.pandas_udf("double")
    def _fold(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        ma = np.array(a.tolist(), dtype=np.float64)
        mb = np.array(b.tolist(), dtype=np.float64)
        acc = ma[:, 0] * mb[:, 0]
        for i in range(1, ma.shape[1]):
            acc = acc + ma[:, i] * mb[:, i]
        return pd.Series(acc)

    # asNondeterministic (it IS deterministic — this only disables
    # optimizer rewrites): without it, pushing the caller's
    # `cos >= threshold` filter through the projection that computes
    # `cos` re-expands the UDF into the Filter, leaving TWO
    # ArrowEvalPython nodes that each ship both 64-dim vectors per
    # candidate across the Arrow boundary — the verify paid its
    # dominant cost twice (plans/r13/lsh_neardup_*_before.txt).  With
    # the barrier the dot crosses once and the filter reads the
    # materialized column (r13).
    return _fold.asNondeterministic()


# Lazy singleton: pandas_udf registration needs an active
# SparkContext, so the UDF is created on first use, not at import.
_SEQ_UDFS: dict = {}


def dot_seq(a: Column, b: Column) -> Column:
    """Bit-identical, Arrow-vectorized twin of :func:`dot` for hot
    per-candidate-pair paths (see _dot_seq_udf)."""
    if "dot" not in _SEQ_UDFS:
        _SEQ_UDFS["dot"] = _dot_seq_udf()
    return _SEQ_UDFS["dot"](a, b)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int, round_to: int = 6
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries``/``corpus``: (id, vec) with vec already double. The
    query side is broadcast: one corpus scan computes every cosine,
    then a window keeps k per query. No corpus shuffle besides the
    final (tiny) top-k exchange.
    """
    q = queries.select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    c = corpus.select(
        F.col("id").alias("n_id"), F.col("vec").alias("n_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), round_to)
    scored = F.broadcast(q).crossJoin(c).select(
        "q_id", "n_id", sim.alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos", "rnk")
    )


def hyperplane_weight(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random weight in [-7.5, 7.5] from
    md5(plane ':' dim) — portable to any engine with md5."""
    digit = F.substring(
        F.md5(
            F.concat(
                plane.cast("string"), F.lit(":"), dim.cast("string")
            ).cast("binary")
        ),
        1,
        1,
    )
    return F.instr(F.lit(HEX), digit) - F.lit(8.5)


def hyperplane_buckets(vecs: DataFrame, num_planes: int = 8) -> DataFrame:
    """(id, bucket): sign pattern of ``num_planes`` random projections.

    Explode-shaped (rows = |V| x planes x dims) feeding one partial
    aggregation — scales linearly, no shuffle of the vectors
    themselves. Sign flips from float addition order are possible
    only when a projection lands within float-noise of zero
    (|proj| < 1e-12 across O(dim) terms — negligible).
    """
    p = F.explode(F.sequence(F.lit(0), F.lit(num_planes - 1))).alias("p")
    i = F.explode(F.sequence(F.lit(1), F.lit(64))).alias("i")
    projected = (
        vecs.select("id", "vec", p)
        .select("id", "p", "vec", i)
        .select(
            "id",
            "p",
            (
                hyperplane_weight(F.col("p"), F.col("i"))
                * F.element_at("vec", F.col("i"))
            ).alias("term"),
        )
        .groupBy("id", "p")
        .agg(F.sum("term").alias("proj"))
    )
    weight = F.pow(F.lit(2.0), F.col("p").cast("double")).cast("long")
    return projected.groupBy("id").agg(
        F.sum((F.col("proj") > 0).cast("long") * weight).alias("bucket")
    )


def lsh_bucket_topk(
    queries: DataFrame, corpus: DataFrame, k: int, num_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Per-query work drops from |C| to |C|/2^planes; recall is traded
    via ``num_planes`` (fewer planes → bigger buckets → higher
    recall). Multi-probe (flipping low-margin bits) is the standard
    recall booster at fixed cost, but it only pays when true neighbors
    differ in ~1 bit: on this corpus (neighbors ~60° away, ~2.6
    expected sign flips at 8 planes) probing up to 9 buckets moved
    recall@3 just 0.07 → 0.10 — so multi-probe lives on the banded
    path (``banded_lsh_buckets(probes=...)``), where flipping the
    lowest-margin bit per band measurably halves the index for equal
    recall."""
    all_vecs = queries.unionByName(corpus)
    buckets = hyperplane_buckets(all_vecs, num_planes)
    q = queries.join(buckets, "id").select(
        F.col("id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("bucket").alias("b"),
    )
    c = corpus.join(buckets, "id").select(
        F.col("id").alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("bucket").alias("b"),
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
    scored = q.join(c, "b").select("q_id", "n_id", sim.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos", "rnk")
    )


def banded_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    bits_per_band: int = 3,
    bands: int = 16,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k via banded (multi-table) LSH: candidates are
    corpus vectors sharing ANY band bucket with the query, ranked by
    exact rounded cosine.

    This is the recall-robust ANN path: single-bucket LSH
    (``lsh_bucket_topk``) collapses on corpora whose true neighbors
    sit at wide angles (recall 0.03-0.38 measured on the synthetic
    embeddings, where top-3 neighbors are ~60 degrees away) because
    one sign flip evicts the neighbor.  OR-ing ``bands`` independent
    tables fixes that: candidate probability is 1-(1-p^r)^b with
    p = 1 - theta/pi, giving recall@3 = 0.98 at the default (3 bits x
    16 bands) on the same corpus (tests/test_llm_ops.py asserts
    >= 0.8).  Per-query work is ~b/2^r of the corpus — tune r up on
    real corpora where neighbors are tight (theta small) to make
    2^r >> b; keep r low only when neighbors are genuinely far.
    ``probes > 1`` multi-probes each band's lowest-margin bit flips on
    the query side: 4 bits × 8 bands × 2 probes matches the default's
    recall at half the index rows (measured 0.97 vs 0.98 here).
    """
    qb = banded_lsh_buckets(queries, bits_per_band, bands, probes=probes)
    cb = banded_lsh_buckets(corpus, bits_per_band, bands)
    q = queries.join(qb, "id").select(
        F.col("id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        "band",
        "bucket",
    )
    c = corpus.join(cb, "id").select(
        F.col("id").alias("n_id"),
        F.col("vec").alias("n_vec"),
        "band",
        "bucket",
    )
    cand = (
        q.join(c, ["band", "bucket"])
        .select("q_id", "q_vec", "n_id", "n_vec")
        .distinct()
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        cand.select("q_id", "n_id", sim.alias("cos"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def ivf_assign(
    vecs: DataFrame, centroids: DataFrame, nprobe: int = 1
) -> DataFrame:
    """(id, list_id, probe_rnk): assign each vector to its ``nprobe``
    nearest centroids by rounded cosine (centroid-id tiebreak).

    The centroid table is tiny (n_lists rows) and broadcast, so
    assignment is one linear corpus scan — no shuffle until the
    (small) per-id top-nprobe window.
    """
    c = centroids.select(
        F.col("id").alias("list_id"), F.col("vec").alias("c_vec")
    )
    sim = F.round(cosine(F.col("vec"), F.col("c_vec")), 6)
    scored = vecs.crossJoin(F.broadcast(c)).select(
        "id", "list_id", sim.alias("c_cos")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("c_cos").desc(), F.col("list_id")
    )
    return (
        scored.withColumn("probe_rnk", F.row_number().over(w))
        .filter(F.col("probe_rnk") <= nprobe)
        .select("id", "list_id", "probe_rnk")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    partitioned into one inverted list per centroid; each query scans
    only its ``nprobe`` closest lists.

    Per-query work drops from |C| to ~nprobe/n_lists of the corpus —
    the other classic ANN scale path next to hyperplane LSH
    (lsh_bucket_topk). At 100 TB the corpus assignment is a single
    linear pass with broadcast centroids, and the candidate join is an
    equi-join on list_id (shuffle partitioned by list — never
    all-pairs). Centroids here are a deterministic corpus subset so
    the whole operator stays engine-portable; a production variant
    would plug k-means centroids into the same plan shape.
    """
    c_assign = ivf_assign(corpus, centroids, nprobe=1).select(
        F.col("id").alias("n_id"), "list_id"
    )
    q_probes = ivf_assign(queries, centroids, nprobe=nprobe).select(
        F.col("id").alias("q_id"), "list_id"
    )
    q = queries.select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"))
    c = corpus.select(F.col("id").alias("n_id"), F.col("vec").alias("n_vec"))
    cand = (
        q_probes.join(c_assign, "list_id")
        .select("q_id", "n_id")
        .distinct()
        .join(F.broadcast(q), "q_id")
        .join(c, "n_id")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
    scored = cand.select("q_id", "n_id", sim.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos", "rnk")
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook_src: DataFrame,
    k: int,
    m_sub: int = 16,
    d_sub: int = 4,
    shortlist: int = 50,
) -> DataFrame:
    """Product-quantization ANN top-k with ADC shortlist + exact
    rerank — the third classic ANN scale path next to hyperplane LSH
    and IVF (Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI'11), in its production shape: the quantized index
    produces a ``shortlist`` of candidates per query cheaply, and
    only the shortlist is rescored with exact cosine.

    Inputs must be unit-normalized so squared L2 is monotone with
    cosine (measured on the synthetic corpus: raw-L2 ADC recall@3 is
    ~0, normalized ADC top-50 + rerank is 0.97).  The vector space is
    split into ``m_sub`` subspaces of ``d_sub`` dims; each subspace's
    codebook is a deterministic slice of ``codebook_src`` (so the
    oracle can mirror it — production plugs per-subspace k-means into
    the same plan).  Corpus vectors are ENCODED once into m_sub small
    codes (64 doubles -> 16 bytes, a 32x index compression), and
    queries score candidates via an Asymmetric Distance Computation:
    a broadcast per-query lookup table of query-to-centroid
    subdistances, summed along each corpus code word.

    Scale shape: codebook (m_sub x k_cent) and per-query distance
    tables (|Q| x m_sub x k_cent) broadcast; encoding is one linear
    corpus scan; ADC is an equi-join on (m, cid) + one partial-agg
    groupBy; the rerank join touches shortlist x |Q| full vectors
    only.  Full corpus vectors are never read at ADC time — the
    entire point of PQ at 100 TB.  Per-subspace distances are
    rounded to 12 and summed in DECIMAL so both engines add exactly.
    """
    ms = queries.sparkSession.range(m_sub).select(
        F.col("id").cast("int").alias("m")
    )
    # Codebook ids 0..k_cent-1 in source-id order; the global window
    # runs over the k_cent-row codebook table only (tiny by contract).
    cb = (
        codebook_src.withColumn(
            "cid", F.row_number().over(Window.orderBy("id")) - 1
        )
        .crossJoin(F.broadcast(ms))
        .select(
            "m",
            F.col("cid").cast("int").alias("cid"),
            F.expr(f"slice(vec, m * {d_sub} + 1, {d_sub})").alias("cvec"),
        )
    )
    sub = F.expr(f"slice(vec, m * {d_sub} + 1, {d_sub})")
    sq = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # Encode: per (corpus id, subspace) nearest codebook entry.
    enc_scored = (
        corpus.crossJoin(F.broadcast(ms))
        .select("id", "m", sub.alias("sub"))
        .join(F.broadcast(cb), "m")
        .select(
            F.col("id").alias("n_id"),
            "m",
            "cid",
            F.round(sq(F.col("sub"), F.col("cvec")), 6).alias("d"),
        )
    )
    w_enc = Window.partitionBy("n_id", "m").orderBy("d", "cid")
    enc = (
        enc_scored.withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("n_id", "m", "cid")
    )
    # ADC distance table: query x subspace x centroid (tiny, broadcast).
    dtab = (
        queries.crossJoin(F.broadcast(ms))
        .select(F.col("id").alias("q_id"), "m", sub.alias("sub"))
        .join(F.broadcast(cb), "m")
        .select(
            "q_id",
            "m",
            "cid",
            F.round(sq(F.col("sub"), F.col("cvec")), 12)
            .cast("decimal(28,12)")
            .alias("qd"),
        )
    )
    adc = (
        enc.join(F.broadcast(dtab), ["m", "cid"])
        .groupBy("q_id", "n_id")
        .agg(F.round(F.sum("qd").cast("double"), 6).alias("adist"))
    )
    w_short = Window.partitionBy("q_id").orderBy("adist", "n_id")
    short = (
        adc.withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist)
        .select("q_id", "n_id")
    )
    # Exact rerank of the shortlist only.
    q = queries.select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"))
    c = corpus.select(F.col("id").alias("n_id"), F.col("vec").alias("n_vec"))
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
    scored = (
        short.join(F.broadcast(q), "q_id")
        .join(c, "n_id")
        .select("q_id", "n_id", sim.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos", "rnk")
    )


def quantize_int8(vecs: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|, code =
    floor(x * 127 / scale + 0.5). Shrinks a float32 embedding column
    4x (16x vs the double form) — at 100 TB the ANN candidate
    generation can run entirely over int8 codes and only rescore the
    top candidates at full precision. floor(x+0.5) is used instead of
    round() so both engines break .5 ties identically.
    """
    amax = F.array_max(F.transform("vec", lambda x: F.abs(x)))
    return vecs.select(
        "id",
        amax.alias("scale"),
        F.transform(
            "vec",
            lambda x: F.floor(x * F.lit(127.0) / amax + F.lit(0.5)).cast(
                "int"
            ),
        ).alias("q"),
    )


def cosine_neardup_pairs(
    vecs: DataFrame, threshold: float
) -> DataFrame:
    """All pairs with cosine >= threshold — EXHAUSTIVE baseline.

    O(n^2) self-join: only for tiny-SF recall cross-checks of
    ``lsh_neardup_pairs`` (tests/test_llm_ops.py).  Production near-dup
    queries go through the banded-LSH candidate path below.
    """
    a = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _band_weight_arrays(
    bits_per_band: int, bands: int, dim: int = 64
) -> list[list[float]]:
    """Driver-side hyperplane weights — the SAME values as the SQL form
    ``hyperplane_weight`` (first md5 hex digit of "plane:dim", mapped
    to [-7.5, 7.5]), precomputed once so the per-row plan needs no md5
    calls and no explode.  Tiny: planes x dim doubles (~50 KB at 96
    planes), shipped as literals inside the expression tree.
    """
    import hashlib

    return [
        [
            float(
                HEX.index(
                    hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0]
                )
                + 1
                - 8.5
            )
            for d in range(1, dim + 1)
        ]
        for p in range(bits_per_band * bands)
    ]


def banded_lsh_buckets(
    vecs: DataFrame,
    bits_per_band: int = 3,
    bands: int = 32,
    dim: int = 64,
    probes: int = 1,
) -> DataFrame:
    """(id, band, bucket): banded random-hyperplane signatures, the
    OR-construction of LSH — a pair is a near-dup CANDIDATE iff it
    lands in the same bucket of at least one band.

    ``probes > 1`` enables multi-probe LSH on top: per band, also emit
    the bucket(s) with the 1..probes-1 lowest-|projection| bits
    flipped — the bits most likely to disagree with a true neighbor
    are exactly the low-margin ones, so each extra probe buys recall
    without recomputing signatures or adding bands.  Measured on the
    synthetic embeddings: 4 bits × 8 bands × 2 probes reaches
    recall@3 = 0.97 with HALF the index rows and ~25% fewer candidate
    pairs than the single-probe 3 × 16 config (see SCALE.md).  Use it
    on the QUERY side only; the corpus keeps one bucket per band.
    Margins are rounded to 6 decimals before the argmin (bit-index
    tiebreak) so an oracle can reproduce the flip choice.

    Scale shape: one linear scan through an Arrow-batched Pandas UDF —
    the whole signature is a dense (batch x dim) @ (dim x planes)
    numpy matmul per Arrow batch, the textbook case where a vectorized
    Pandas UDF beats both row-at-a-time Python and a giant literal
    expression tree (a 96-plane Column-expression variant spent ~10 s
    per query in analysis/codegen alone).  The weight matrix rides in
    the UDF closure (~50 KB, broadcast with the task), buckets explode
    1:bands·probes, and there is NO shuffle.  Contrast
    ``hyperplane_buckets`` (explode over dims + two groupBys), which
    stays as the SQL-oracle-checkable form for ``ann_lsh_topk``.
    """
    w_t = np.array(_band_weight_arrays(bits_per_band, bands, dim)).T
    shifts = 1 << np.arange(bits_per_band)

    @F.pandas_udf("array<int>")
    def band_buckets(vec_s: pd.Series) -> pd.Series:
        if len(vec_s) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(vec_s.tolist(), dtype=np.float64)
        proj = mat @ w_t
        bits = (proj > 0).astype(np.int64)
        buckets = bits.reshape(len(mat), bands, bits_per_band) @ shifts
        out = [buckets]
        if probes > 1:
            margins = np.round(np.abs(proj), 6).reshape(
                len(mat), bands, bits_per_band
            )
            order = np.argsort(margins, axis=2, kind="stable")
            for t in range(probes - 1):
                out.append(buckets ^ (1 << order[..., t]))
        return pd.Series(list(np.concatenate(out, axis=1).astype(np.int32)))

    return vecs.select("id", F.posexplode(band_buckets("vec"))).select(
        "id",
        (F.col("pos") % bands).cast("int").alias("band"),
        F.col("col").cast("int").alias("bucket"),
    )


def lsh_neardup_pairs(
    vecs: DataFrame,
    threshold: float,
    bits_per_band: int = 3,
    bands: int = 32,
) -> DataFrame:
    """All pairs with cosine >= threshold via banded-LSH candidates —
    the scale path (replaces the all-pairs crossJoin the round-2
    verdict flagged).

    Plan: banded signatures (per-row, shuffle-free) -> equi-join on
    (band, bucket) -> distinct candidate pairs -> exact rounded-cosine
    filter.  Never materializes n^2: work is sum(bucket^2) per band,
    an equi-join Catalyst executes as a hash/sort-merge join — no
    CartesianProduct / BroadcastNestedLoopJoin (plan-asserted in
    tests/test_plans.py).

    Recall: md5 hyperplanes are deterministic, so recall is a fixed
    property of (corpus, knobs), not a per-run gamble.  At the
    registered threshold 0.4 (theta/pi ~= 0.37, the hardest regime for
    sign-LSH) the default 32 bands x 3 bits catches EVERY qualifying
    pair at sf0.001/0.01/0.1 (verified exhaustively vs
    ``cosine_neardup_pairs``; per-pair miss probability
    (1 - p^3)^32 ~= 1e-4 with p = 1 - theta/pi).  For a realistic
    dedup threshold (~0.95, p ~= 0.9) raise bits_per_band to ~16-20:
    candidate volume scales as bands/2^bits of all-pairs, i.e. ~1e-5
    of n^2 at (48 bands, 20 bits) with ~99.8% recall.
    """
    # bb feeds BOTH sides of the band self-join; left lazy the
    # signature pandas_udf (a dense matmul over every vector) executes
    # twice — no ReusedExchange fires across the differently-aliased
    # sides.  One checkpoint of the narrow (id, band, bucket) rows
    # bounds it to once (r13).  The bucket table and the norm table
    # below are INDEPENDENT builds over the same vecs, so they
    # materialize concurrently (guide §2.6; concurrency.eager_all) —
    # sequentially each build's stage tail left the other's work
    # waiting.
    from distributed_system_spark.concurrency import eager_all

    bb_lazy = banded_lsh_buckets(vecs, bits_per_band, bands)
    # Norms are computed ONCE per doc and joined to the pairs — the
    # candidate set is O(sum bucket^2) rows, so evaluating the norm
    # fold per PAIR would redo 2/3 of the verify arithmetic millions
    # of times (measured: ~2.5x verify wall on the sf0.1 2M-candidate
    # set).  Cross-engine safety is preserved: the per-doc norm is
    # the same sequential fold over the same array, so the reused
    # double is bit-identical to the oracle's per-pair recomputation.
    # Same two-consumer shape for the verify inputs: one checkpoint of
    # (id, vec, nrm) keeps the vecs subtree (scan/union/twin synthesis
    # at the call sites) and the norm fold to a single execution (r13).
    withn_lazy = vecs.select("id", "vec", norm(F.col("vec")).alias("nrm"))
    bb, withn = eager_all(
        vecs.sparkSession,
        bb_lazy.localCheckpoint,
        withn_lazy.localCheckpoint,
    )
    left = bb.select(F.col("id").alias("id_a"), "band", "bucket")
    right = bb.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = withn.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = withn.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # dot_seq, not dot: the dot runs once per CANDIDATE (O(sum
    # bucket^2) rows), where the interpreted higher-order fold was
    # measured ~10x the rest of the verify wall at the 20k-vector
    # scale point; dot_seq is bit-identical and codegen-able.
    sim = F.round(
        dot_seq(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
