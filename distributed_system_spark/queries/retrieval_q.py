"""Retrieval / LM-scoring queries over `documents` (LLM-pipeline
surface): BM25 ranked retrieval and add-one-smoothed bigram
language-model scoring (the CCNet/KenLM-style perplexity gate, here
with an exact in-corpus n-gram LM instead of an external model).

Both are pure Column-expression pipelines.  Transcendentals (ln) are
computed identically in Spark and DuckDB (same libm double `log` on
the same machine — the `text_tfidf_top3` oracle established this
parity); every per-row score is cast to DECIMAL(18,6) *before* the
order-dependent reduction so sums are exact and order-insensitive
(see `_util.py`).

Reference capability analog: the reference's query surface is
map+group-by-key over tokenized text (SURVEY §2.B); BM25 and LM
scoring are the retrieval/quality extensions a training-data curation
pipeline layers on that same tokenize→count core.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import (
    load_table,
    widen_if_narrow,
)

# Fixed query-term set for BM25 (the synthetic corpus vocabulary is
# operator names; any fixed set exercises the full scoring shape).
_BM25_TERMS = ("scan", "join", "merge", "window", "sort")
_K1 = 1.2
_B = 0.75


# BM25 scored-docs CTE chain (ends at `scored(doc_id, score)`) —
# shared by text_bm25_topk and the RRF hybrid fusion oracle.
_BM25_SCORED_SQL = f"""d AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl FROM d
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
), toks AS (
  SELECT d.doc_id, unnest(d.toks) AS term FROM d
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         CAST(
           (ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
            * tf.tf * {_K1 + 1})
           / (tf.tf + {_K1} * ({1 - _B} + {_B}
              * (CAST(dl.dl AS DOUBLE)
                 / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs))))
           AS DECIMAL(18,6)) AS contrib
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
), scored AS (
  SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
  FROM contrib GROUP BY doc_id
)"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) BM25 scores for the fixed query-term set —
    the shared core of text_bm25_topk and search_hybrid_rrf.

    Single-pass shape (r13): the corpus is tokenized ONCE and one
    groupBy(doc_id) emits (dl, tf_0..tf_4) — map-side partial
    aggregation collapses the exploded token stream to one narrow row
    per doc before the exchange, so the shuffle carries ~n_docs rows,
    not the token stream.  Corpus stats (n_docs, sum_dl) and the five
    per-term document frequencies ride ONE scalar aggregate over that
    same base (df_t = docs with tf_t > 0, exactly the old dft
    count), broadcast back, and the score assembles map-side: per
    term, contrib = cast((idf * tf * (k1+1)) / denom AS
    DECIMAL(18,6)) — the identical double expression as the old
    join form, so each contrib is bit-identical — and the doc score
    is the exact decimal sum of the five contribs (terms with tf = 0
    contribute exactly 0.000000, so including them cannot move the
    exact sum).  Docs with no query term are filtered out, preserving
    the old inner-join semantics.  The old form scanned the corpus
    three times (tf branch, dl join, stats) and shuffled a
    (doc_id, term) join; both are gone."""
    docs = load_table(spark, sf_dir, "documents")
    nterms = len(_BM25_TERMS)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("term")
    )
    # base feeds the scalar-stats aggregate AND the scored branch;
    # checkpointing the narrow per-doc rows guarantees the tokenize
    # pass runs once (the two identical Exchange subtrees were NOT
    # deduplicated in the static plan — plans/r13).
    base = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.sum((F.col("term") == F.lit(t)).cast("long")).alias(
                f"tf_{i}"
            )
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint()
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(nterms)
        ],
    )
    hit = base.filter(
        sum(F.col(f"tf_{i}") for i in range(nterms)) > 0
    ).crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def contrib(i: int):
        tf = F.col(f"tf_{i}")
        df = F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        denom = tf + F.lit(_K1) * (
            F.lit(1 - _B)
            + F.lit(_B) * (F.col("dl").cast("double") / avgdl)
        )
        return ((idf * tf * F.lit(_K1 + 1)) / denom).cast(
            "decimal(18,6)"
        )

    score = contrib(0)
    for i in range(1, nterms):
        score = score + contrib(i)
    return hit.select(
        "doc_id", score.cast("double").alias("score")
    )


@register(
    "text_bm25_topk",
    oracle=f"""
WITH {_BM25_SCORED_SQL}
SELECT doc_id, score, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 20
""",
    tags=("text", "retrieval", "bm25"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query-term set.

    Scale shape: the term-frequency side is one groupBy on
    (doc_id, term) *after* filtering tokens to the query terms (the
    filter makes the exploded stream tiny — |terms| rows per doc max);
    document frequencies and corpus stats are broadcast-joined
    (|terms| rows and 1 row respectively).  One shuffle for tf, one
    for the per-doc sum, one TakeOrdered for the top-k — no global
    materialization of the posting lists.
    """
    scored = _bm25_scored(spark, sf_dir)
    # TakeOrdered the top 20 first, then rank the 20 survivors — the
    # global row_number window would otherwise single-partition the
    # whole scored set.
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("doc_id", "score", "rnk")


@register(
    "text_lm_bigram_nll",
    oracle="""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
), occ AS (
  SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
                         for i in range(1, len(toks))]) AS bg
  FROM t
), tfb AS (
  SELECT doc_id, bg, count(*) AS tf_b FROM occ GROUP BY doc_id, bg
), cb AS (
  SELECT bg, CAST(sum(tf_b) AS BIGINT) AS cb FROM tfb GROUP BY bg
), ch AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS ch
  FROM cb GROUP BY 1
), v AS (
  SELECT count(DISTINCT term) AS v
  FROM (SELECT unnest(str_split(text, ' ')) AS term FROM documents)
)
SELECT tfb.doc_id,
       CAST(sum(tfb.tf_b) AS BIGINT) AS n_bigrams,
       round(CAST(SUM(tfb.tf_b
               * CAST(ln(CAST(ch.ch + v.v AS DOUBLE))
                      - ln(CAST(cb.cb + 1 AS DOUBLE))
                      AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(tfb.tf_b) AS DOUBLE), 6) AS avg_nll
FROM tfb
JOIN cb ON tfb.bg = cb.bg
JOIN ch ON split_part(tfb.bg, ' ', 1) = ch.w1
CROSS JOIN v
GROUP BY tfb.doc_id
""",
    tags=("text", "lm", "quality"),
)
def text_lm_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under an add-one
    smoothed bigram LM trained on the corpus itself.

    The curation analog of a KenLM perplexity gate (CCNet): documents
    whose token sequences are improbable under the corpus LM score
    high `avg_nll` and get filtered.  P(w2|w1) = (c(w1,w2)+1) /
    (c(w1·)+V) where c(w1·) counts bigram occurrences headed by w1
    (a proper conditional after smoothing) and V is the corpus
    vocabulary size.

    Scale shape: per-doc bigram counts are one groupBy; the corpus
    bigram table (≤ V², bounded by vocabulary not corpus size) and
    head table (≤ V) are re-aggregations of it, broadcast back.
    Documents with fewer than two tokens have no bigrams and drop out
    (both engines, inner semantics).
    """
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    # size >= 2 guard (same hazard bpe.pair_counts filters): a 1-token
    # doc makes sequence(1, size-1) descend to [1, 0] and element_at
    # throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT.  The oracle's unnest
    # of an empty gram list drops such docs silently; the filter keeps
    # both engines on inner semantics.
    t = docs.select(
        "doc_id", F.split("text", " ", -1).alias("toks")
    ).filter(F.size("toks") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i), F.element_at("toks", i + 1)
        ),
    )
    # 1:1 explode barrier (materialize toks once), then flatMap grams.
    occ = t.select(
        "doc_id", F.explode(F.array(grams)).alias("gs")
    ).select("doc_id", F.explode("gs").alias("bg"))
    # tfb feeds THREE consumers (the corpus bigram table cb, the head
    # table ch via cb, and the final per-doc join); left lazy each
    # re-executed the scan + bigram explode + groupBy subtree — the
    # before plan re-tokenized the corpus 3x (plans/r13).  Checkpoint
    # the aggregated (doc_id, bg, tf_b) rows once (bounded by distinct
    # per-doc bigrams, ~ the shuffle its own groupBy already paid) and
    # the small corpus-level cb table it feeds (r13).
    tfb_lazy = occ.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("tf_b")
    )
    # Corpus vocabulary size: a scalar (tiny), computed driver-side
    # like n_docs in text_tfidf_top3.  The vocab pass and the per-doc
    # bigram aggregate are INDEPENDENT corpus passes, so they run
    # concurrently (guide §2.6; concurrency.eager_all) — sequentially
    # the vocab count sat idle behind the tfb checkpoint build.
    from distributed_system_spark.concurrency import eager_all

    tfb, v = eager_all(
        spark,
        tfb_lazy.localCheckpoint,
        docs.select(F.explode(F.split("text", " ", -1)).alias("term"))
        .distinct()
        .count,
    )
    cb = (
        tfb.groupBy("bg")
        .agg(F.sum("tf_b").alias("cb"))
        .localCheckpoint()
    )
    ch = cb.groupBy(F.split("bg", " ", -1)[0].alias("w1")).agg(
        F.sum("cb").alias("ch")
    )
    nll = F.log((F.col("ch") + F.lit(v)).cast("double")) - F.log(
        (F.col("cb") + F.lit(1)).cast("double")
    )
    joined = (
        tfb.join(F.broadcast(cb), "bg")
        .join(
            F.broadcast(ch),
            F.split(tfb["bg"], " ", -1)[0] == ch["w1"],
        )
    )
    return (
        joined.select(
            "doc_id",
            "tf_b",
            (F.col("tf_b") * nll.cast("decimal(18,6)")).alias("w_nll"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("tf_b").alias("n_bigrams"),
            F.round(
                F.sum("w_nll").cast("double")
                / F.sum("tf_b").cast("double"),
                6,
            ).alias("avg_nll"),
        )
        .select("doc_id", "n_bigrams", "avg_nll")
    )


@register(
    "text_token_ids",
    oracle="""
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
), toks AS (
  SELECT doc_id, unnest(toks) AS tok,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM d
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), vocab AS (
  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS id FROM counts
)
SELECT t.doc_id, count(*) AS n_tokens,
       string_agg(CAST(v.id AS VARCHAR), ',' ORDER BY t.pos) AS token_ids
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id
""",
    tags=("text", "training-prep", "vocab"),
)
def text_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding: map every token to its frequency-ranked
    integer id and re-emit each document as its id sequence — the
    tokenize→numericalize step of a training-data pipeline.

    Scale shape: the vocabulary (|V| rows, bounded by vocabulary not
    corpus size) is built with one groupBy and ranked with one
    window over those |V| rows, then broadcast back to the exploded
    token stream; per-doc sequences reassemble order via the
    (pos, id) struct sort inside one aggregate.  The id sequence is
    emitted comma-joined (the repo's engine-stable array encoding —
    see `agg_arrays`).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ", -1)).alias("pos", "tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # Window over |V| rows only — bounded by vocabulary size.
    wv = Window.orderBy(F.col("c").desc(), "tok")
    vocab = counts.withColumn("id", F.row_number().over(wv))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "id"))
                    ),
                    lambda x: x["id"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
    )


_RRF_K = 60


@register(
    "search_hybrid_rrf",
    oracle=f"""
WITH {_BM25_SCORED_SQL},
bm_top AS (
  SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 50
),
bm_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r_text
  FROM bm_top
),
e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
cos_scored AS (
  SELECT c.id AS doc_id,
         round(list_sum(list_transform(range(1, 65),
                                       i -> q.vec[i] * c.vec[i]))
               / (sqrt(list_sum(list_transform(range(1, 65),
                                i -> q.vec[i] * q.vec[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                                i -> c.vec[i] * c.vec[i])))),
               6) AS cos
  FROM e q JOIN e c ON q.id = 0 AND c.id >= 10
),
vec_top AS (
  SELECT doc_id, cos FROM cos_scored ORDER BY cos DESC, doc_id LIMIT 50
),
vec_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos DESC, doc_id) AS r_vec
  FROM vec_top
),
fused AS (
  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
         round(coalesce(1.0 / ({_RRF_K} + b.r_text), 0)
               + coalesce(1.0 / ({_RRF_K} + v.r_vec), 0), 6) AS rrf
  FROM bm_rank b FULL JOIN vec_rank v ON b.doc_id = v.doc_id
)
SELECT doc_id, rrf, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
  FROM fused
) WHERE rnk <= 20
""",
    tags=("text", "retrieval", "hybrid", "rrf"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    ranking and the dense-vector cosine ranking (query vector id 0;
    vec_id aligns 1:1 with doc_id in the synthetic corpus) — the
    standard lexical+semantic search combiner
    (rrf = Σ 1/(60 + rank), Cormack et al.).

    Scale shape: fusion operates on each system's top-50 LIST, never
    the full corpus — both lists arrive via TakeOrdered, the rank
    windows run on ≤50 rows, and the full-outer fusion join touches
    ≤100 rows regardless of corpus size.  The two source rankings
    inherit their own scale analyses (`text_bm25_topk`,
    `ann_topk_cosine`).
    """
    from distributed_system_spark.operators.similarity import (
        brute_force_topk,
    )
    from distributed_system_spark.queries.similarity_q import _vecs

    bm_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
    )
    wb = Window.orderBy(F.col("score").desc(), "doc_id")
    bm_rank = bm_top.select(
        "doc_id", F.row_number().over(wb).alias("r_text")
    )

    vecs = _vecs(spark, sf_dir)
    vec_rank = (
        brute_force_topk(
            vecs.filter(F.col("id") == 0),
            vecs.filter(F.col("id") >= 10),
            k=50,
        )
        .select(F.col("n_id").alias("doc_id"), F.col("rnk").alias("r_vec"))
    )

    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_text")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)
        ),
        6,
    )
    fused = (
        bm_rank.join(vec_rank, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf"))
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("doc_id", "rrf", "rnk")


@register(
    "text_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
), counts AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(ln(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
             - CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE))
                             AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(sum(c) AS BIGINT), 6) AS entropy
FROM counts
GROUP BY doc_id
""",
    tags=("text", "quality", "entropy"),
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) — the
    repetitiveness signal quality filters threshold on (low entropy =
    highly repetitive doc).  Computed as H = ln(n) - Σ c·ln(c) / n so
    the only reduction over non-integers is the decimal-cast Σ c·ln(c)
    (order-insensitive); one groupBy per doc over (doc, token) counts,
    no corpus-wide state at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    c_ln_c = (
        (F.col("c") * F.log(F.col("c").cast("double")))
        .cast("decimal(18,6)")
    )
    return (
        counts.select("doc_id", "c", c_ln_c.alias("clc"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum("clc").cast("double") / F.sum("c"),
                6,
            ).alias("entropy"),
        )
    )


@register(
    "bpe_merges",
    # No SQL oracle: k data-dependent sequential passes are not
    # SQL-expressible (rows-only driver check). Exactness is pinned
    # by tests/test_bpe.py against a pure-Python reference replay.
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 BPE merges learned from the corpus (word-pair variant):
    each round one corpus-wide pair count + an arg-max + a JVM-side
    fold applying the merge — tokenizer training as an iterative
    Spark job, driver state = the 5 learned merges only."""
    from distributed_system_spark.operators.bpe import learn_merges

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges, _ = learn_merges(docs, k=5)
    return spark.createDataFrame(
        merges, "rank BIGINT, w1 STRING, w2 STRING, pair_count BIGINT"
    )


@register(
    "search_query_expansion",
    oracle=f"""
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
),
e AS (
  SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM d
),
dfreq AS (SELECT tok, count(*) AS df FROM e GROUP BY tok),
v AS (SELECT tok, df FROM dfreq ORDER BY df DESC, tok LIMIT 40),
base AS (SELECT unnest({list(_BM25_TERMS)!r}) AS tok),
anch AS (
  SELECT e.doc_id, e.tok FROM e JOIN base USING (tok)
),
part AS (
  SELECT e.doc_id, e.tok, v.df FROM e JOIN v USING (tok)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS big_d FROM documents),
pmi AS (
  SELECT a.tok AS base_tok, p.tok AS partner,
         count(*) AS n_xy,
         max(ad.df) AS n_a, max(p.df) AS n_b
  FROM anch a
  JOIN part p ON a.doc_id = p.doc_id AND a.tok <> p.tok
  JOIN dfreq ad ON ad.tok = a.tok
  GROUP BY a.tok, p.tok HAVING count(*) >= 5
),
exp1 AS (
  SELECT base_tok, partner FROM (
    SELECT base_tok, partner,
           row_number() OVER (
             PARTITION BY base_tok
             ORDER BY round(CAST(ln((CAST(n_xy AS DOUBLE)
                                     * CAST(big_d AS DOUBLE))
                                    / (CAST(n_a AS DOUBLE)
                                       * CAST(n_b AS DOUBLE)))
                            AS DECIMAL(18,12)), 12) DESC,
                      partner) AS rn
    FROM pmi CROSS JOIN tot
  ) WHERE rn = 1
),
qterms AS (
  SELECT tok FROM base
  UNION
  SELECT partner AS tok FROM exp1
),
dl AS (SELECT doc_id, len(toks) AS dl FROM d),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
toks AS (SELECT d.doc_id, unnest(d.toks) AS term FROM d),
tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t JOIN qterms q ON t.term = q.tok
  GROUP BY t.doc_id, t.term
),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(
           (ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
            * tf.tf * {_K1 + 1})
           / (tf.tf + {_K1} * ({1 - _B} + {_B}
              * (CAST(dl.dl AS DOUBLE)
                 / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs))))
           AS DECIMAL(18,6)) AS contrib
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, score, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 20
""",
    tags=("text", "retrieval", "query-expansion"),
)
def search_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion by corpus statistics: each base query term is
    expanded with its top-1 PMI associate (within-document
    co-occurrence against the top-40 DF vocabulary, >= 5 co-docs),
    and BM25 ranks documents for the EXPANDED term set — the
    pseudo-relevance trick that recovers documents phrasing the
    concept differently, computed entirely from the corpus with no
    external thesaurus.

    At 100 TB: the expansion table is |base| rows (anchor-filtered
    explode, vocab-bounded pair space — the cooccurrence_pmi shape),
    and the expanded term set joins the token stream as a broadcast
    semi-filter, after which the plan IS text_bm25_topk's: tiny tf
    stream, broadcast df/stats, TakeOrdered top-20."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ", -1).alias("toks"))
    e = d.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("tok")
    )
    dfreq = e.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    v = dfreq.orderBy(F.col("df").desc(), "tok").limit(40)
    base = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "tok string"
    )
    anch = e.join(F.broadcast(base), "tok").select(
        "doc_id", F.col("tok").alias("base_tok")
    )
    part = e.join(F.broadcast(v), "tok").select(
        "doc_id", F.col("tok").alias("partner"), F.col("df").alias("n_b")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("big_d"))
    adf = dfreq.select(
        F.col("tok").alias("base_tok"), F.col("df").alias("n_a")
    )
    pmi = (
        anch.join(part, "doc_id")
        .filter(F.col("base_tok") != F.col("partner"))
        .join(F.broadcast(adf), "base_tok")
        .groupBy("base_tok", "partner")
        .agg(
            F.count(F.lit(1)).alias("n_xy"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
        .filter(F.col("n_xy") >= 5)
    )
    pmi_val = F.round(
        F.log(
            (F.col("n_xy").cast("double") * F.col("big_d").cast("double"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).cast("decimal(18,12)"),
        12,
    )
    wexp = Window.partitionBy("base_tok").orderBy(
        pmi_val.desc(), "partner"
    )
    exp1 = (
        pmi.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(wexp))
        .filter(F.col("rn") == 1)
        .select(F.col("partner").alias("tok"))
    )
    qterms = base.select("tok").union(exp1).distinct()

    dl = d.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    toks = d.select("doc_id", F.explode("toks").alias("term")).join(
        F.broadcast(qterms.withColumnRenamed("tok", "term")), "term"
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(_K1) * (
        F.lit(1 - _B) + F.lit(_B) * (F.col("dl").cast("double") / avgdl)
    )
    contrib = ((idf * F.col("tf") * F.lit(_K1 + 1)) / denom).cast(
        "decimal(18,6)"
    )
    scored = (
        joined.select("doc_id", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("double").alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("doc_id", "score", "rnk")


@register(
    "search_ndcg_eval",
    oracle=f"""
WITH {_BM25_SCORED_SQL},
reltab AS (
  SELECT doc_id, least(3, CAST(sum(tf) AS BIGINT)) AS rel
  FROM tf GROUP BY doc_id
),
run AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored ORDER BY score DESC, doc_id LIMIT 20
),
ideal AS (
  SELECT doc_id, rel,
         row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
  FROM reltab ORDER BY rel DESC, doc_id LIMIT 20
),
dcg AS (
  SELECT CAST(SUM(CAST(
           ((1 << r.rel) - 1)
           * CAST(CAST(ln(2.0) AS DECIMAL(18,12)) AS DOUBLE)
           / CAST(CAST(ln(CAST(run.rnk + 1 AS DOUBLE)) AS DECIMAL(18,12))
                  AS DOUBLE)
         AS DECIMAL(18,12))) AS DOUBLE) AS dcg
  FROM run JOIN reltab r ON run.doc_id = r.doc_id
),
idcg AS (
  SELECT CAST(SUM(CAST(
           ((1 << rel) - 1)
           * CAST(CAST(ln(2.0) AS DECIMAL(18,12)) AS DOUBLE)
           / CAST(CAST(ln(CAST(rnk + 1 AS DOUBLE)) AS DECIMAL(18,12))
                  AS DOUBLE)
         AS DECIMAL(18,12))) AS DOUBLE) AS idcg
  FROM ideal
)
SELECT round(dcg.dcg, 6) AS dcg_at_20,
       round(idcg.idcg, 6) AS idcg_at_20,
       round(dcg.dcg / idcg.idcg, 6) AS ndcg_at_20
FROM dcg CROSS JOIN idcg
""",
    tags=("retrieval", "evaluation", "ndcg"),
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@20 of the BM25 ranking against graded relevance labels
    (rel = query-term occurrences in the doc, capped at 3 — the
    standard graded-judgment stand-in a search-eval harness derives
    when human labels don't exist yet).  DCG uses the classic
    (2^rel - 1) / log2(rank + 1) gain; IDCG re-ranks the same labels
    ideally, and their ratio is the one number that says whether the
    scorer ORDERS what the labels value.  Completes the retrieval-eval
    family: ann_recall_report measures the index, this measures the
    ranking function.

    Parity spine: BM25 scores are already engine-stable (the shared
    decimal-summed pipeline under text_bm25_topk's green row), gains
    are integers, and each rank discount rounds ln through
    DECIMAL(18,12) before identical double division — the 20 DCG
    terms then decimal-sum order-insensitively.

    At 100 TB: both rankings are TakeOrdered top-20s (never a global
    sort), the relevance table partial-aggregates from the
    term-filtered token stream, and the final arithmetic runs on two
    1-row frames."""
    scored = _bm25_scored(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    reltab = toks.groupBy("doc_id").agg(
        F.least(F.lit(3), F.count(F.lit(1))).cast("long").alias("rel")
    )
    run = (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), "doc_id")
            ),
        )
    )
    ideal = (
        reltab.orderBy(F.col("rel").desc(), "doc_id")
        .limit(20)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("rel").desc(), "doc_id")
            ),
        )
    )
    ln2 = (
        F.log(F.lit(2.0)).cast("decimal(18,12)").cast("double")
    )

    def term(rel_col, rnk_col):
        disc = (
            F.log((rnk_col + 1).cast("double"))
            .cast("decimal(18,12)")
            .cast("double")
        )
        # pyspark's shiftleft() only takes a literal bit count; the
        # column-count form must go through SQL expr.
        gain = F.expr("shiftleft(1, CAST(rel AS INT))") - 1
        return (gain * ln2 / disc).cast("decimal(18,12)")

    dcg = (
        run.join(reltab, "doc_id")
        .agg(
            F.sum(term(F.col("rel"), F.col("rnk")))
            .cast("double")
            .alias("dcg")
        )
    )
    idcg = ideal.agg(
        F.sum(term(F.col("rel"), F.col("rnk")))
        .cast("double")
        .alias("idcg")
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.round("dcg", 6).alias("dcg_at_20"),
        F.round("idcg", 6).alias("idcg_at_20"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_20"),
    )


@register(
    "retrieval_hard_negatives",
    oracle=f"""
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl FROM d
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
), toks AS (
  SELECT d.doc_id, unnest(d.toks) AS term FROM d
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id, tf.term,
         CAST(
           (ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
            * tf.tf * {_K1 + 1})
           / (tf.tf + {_K1} * ({1 - _B} + {_B}
              * (CAST(dl.dl AS DOUBLE)
                 / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs))))
           AS DECIMAL(18,6)) AS score
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT term, doc_id AS neg_doc, CAST(score AS DOUBLE) AS score, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY score DESC, doc_id) AS rnk
  FROM contrib
) WHERE rnk BETWEEN 2 AND 6
""",
    tags=("retrieval", "bm25", "training-data"),
)
def retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING from BM25 (the standard recipe for
    training dense retrievers/rerankers: for each query, the
    top-ranked lexical matches that are NOT the positive make the
    hardest negatives).  Each query term's single-term BM25 ranking
    is computed; rank 1 is taken as the positive and ranks 2-6 are
    emitted as that query's hard negatives with their scores — the
    (query, negative) table a contrastive training run joins against
    its positives, and the lexical twin of the embedding-space
    ``hard_negative_mining``.

    Scale shape: identical posting discipline to text_bm25_topk —
    tokens filtered to the query terms BEFORE any shuffle (|terms|
    rows per doc max), df/corpus stats broadcast; the per-term rank
    is a rank<=6 filter over a window partitioned by term, which
    Spark executes as WindowGroupLimit (per-partition top-k heaps,
    never a full per-term sort).  Scores are single DECIMAL-cast
    contributions — no summation, so no ordering hazard."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ", -1).alias("toks"))
    dl = d.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    toks = d.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(_K1) * (
        F.lit(1 - _B) + F.lit(_B) * (F.col("dl").cast("double") / avgdl)
    )
    score = ((idf * F.col("tf") * F.lit(_K1 + 1)) / denom).cast(
        "decimal(18,6)"
    )
    scored = joined.select("term", "doc_id", score.alias("score"))
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), "doc_id"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk").between(2, 6))
        .select(
            "term",
            F.col("doc_id").alias("neg_doc"),
            F.col("score").cast("double").alias("score"),
            "rnk",
        )
    )
