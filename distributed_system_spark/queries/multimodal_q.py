"""Multimodal-column queries: binary payload + metadata plumbing, the
Arrow-batched feature-extraction path, and REAL codec round-trips —
stdlib-WAV audio and pure-numpy PPM image decode run end-to-end under
Spark (see operators/multimodal.py; only compressed image formats
remain PIL-gated).

The oracle replicates the byte arithmetic in SQL (documents text is
ASCII, so ord == byte value), which checks that the pandas-UDF hop —
and for the codec queries the encode→container→decode chain —
preserves bytes exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from distributed_system_spark.operators.multimodal import (
    attach_binary,
    extract_features,
    sample_frames,
    scene_cuts,
)
from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table, widen_if_narrow


@register(
    "mm_binary_meta",
    oracle="""
SELECT doc_id,
       'text/plain' AS mime,
       length(text) AS n_bytes,
       md5(text) AS checksum,
       lower(hex(substr(text, 1, 16)::BLOB)) AS head16
FROM documents
""",
    tags=("multimodal",),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct, all JVM-side
    (octet_length / md5 / substring-on-binary / hex)."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.lower(F.hex(F.expr("substring(payload, 1, 16)"))).alias("head16"),
    )


@register(
    "mm_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT), 2))
           AS frame_idx
  FROM documents
)
SELECT f.doc_id, f.frame_idx,
       md5(substr(d.text, CAST(f.frame_idx * 16 + 1 AS INT), 16))
         AS frame_md5
FROM f JOIN documents d ON f.doc_id = d.doc_id
""",
    tags=("multimodal", "C10", "frame-sample"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas plumbing: 16-byte frames,
    every 2nd kept, md5 per frame (the corpus is ASCII so the oracle's
    char slicing sees the same bytes). A real video decoder slots into
    the same stage; the byte-chunk frame is the codec stand-in."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(docs, frame_bytes=16, every=2)
    return frames.select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))


@register(
    "mm_feature_extract",
    oracle="""
SELECT doc_id,
       length(text) AS n_bytes,
       CAST(list_sum([ord(substr(text, CAST(i AS INT), 1))
                      for i in range(1, least(length(text), 64) + 1)])
            AS BIGINT) AS head_sum,
       round(CAST(length(text) % 97 AS DOUBLE) / 97.0, 6) AS feat0
FROM documents
""",
    tags=("multimodal", "C10"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched 'decode' over the binary payload via mapInPandas
    (the real multimodal plumbing; the codec itself is the
    deterministic fake). feat0 rounded to match the oracle."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.withColumn("feat0", F.round("feat0", 6))


@register(
    "mm_audio_wav_decode",
    oracle="""
WITH ch AS (
  SELECT doc_id, unnest(str_split(text, '')) AS c FROM documents
), v AS (
  SELECT doc_id, unicode(c) - 128 AS v FROM ch
)
SELECT doc_id,
       count(*) AS n_samples,
       count(*) * 1000 // 8000 AS duration_ms,
       round(sqrt(avg(CAST(v * v AS DOUBLE))), 6) AS rms,
       CAST(max(abs(v)) AS BIGINT) AS peak
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "audio", "codec"),
)
def mm_audio_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec round-trip under Spark: each document's bytes
    become 8-bit PCM samples in a genuine WAV container (stdlib
    ``wave`` writer, mapInPandas), then ``audio_features`` decodes
    the WAV with the stdlib codec and computes sample count /
    duration / RMS / peak.  The oracle computes the same stats
    straight from the character codes (ASCII corpus: sample = byte -
    128), so a green row certifies the encode→container→decode chain
    is byte-exact — the codec itself, not a fake.  Two Arrow hops,
    zero shuffles."""
    from distributed_system_spark.operators.multimodal import (
        audio_features,
        wav_payloads,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = audio_features(wav_payloads(docs))
    return feats.select(
        "doc_id",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        "peak",
    )


@register(
    "mm_image_ppm_decode",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
), px AS (
  SELECT doc_id, h, i,
         unicode(substr(text, CAST(i AS INT), 1)) AS v
  FROM (SELECT doc_id, text, h,
               unnest(range(1, h * 24 + 1)) AS i
        FROM d)
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       h AS height,
       round(avg(CASE WHEN (i - 1) % 3 = 0 THEN v END), 6) AS mean_r,
       round(avg(CASE WHEN (i - 1) % 3 = 1 THEN v END), 6) AS mean_g,
       round(avg(CASE WHEN (i - 1) % 3 = 2 THEN v END), 6) AS mean_b
FROM px GROUP BY doc_id, h
""",
    tags=("multimodal", "image", "codec"),
)
def mm_image_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec round-trip under Spark: document bytes become
    8-px-wide RGB rasters in genuine binary-PPM containers
    (mapInPandas encode), then ``image_features`` decodes them with
    the pure-numpy PPM decoder and emits dimensions + channel means.
    The oracle recomputes the means from character codes at the
    r/g/b byte offsets, so a green row certifies real container
    parsing, not byte-passthrough.  (Compressed formats ride the same
    stage via the PIL-gated branch of ``decode_image``.)"""
    from distributed_system_spark.operators.multimodal import (
        image_features,
        ppm_payloads,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 24
    )
    feats = image_features(ppm_payloads(docs))
    return feats.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@register(
    "mm_audio_segments",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) AS n_bytes FROM documents
  WHERE length(text) >= 120
),
s AS (
  SELECT doc_id, text,
         unnest(range(0, (n_bytes - 120) // 80 + 1)) AS seg_idx
  FROM d
)
SELECT doc_id, seg_idx,
       CAST(seg_idx * 80 / 4 AS BIGINT) AS start_ms,
       CAST((seg_idx * 80 + 120) / 4 AS BIGINT) AS end_ms,
       md5(substr(text, CAST(seg_idx * 80 + 1 AS INT), 120)) AS seg_md5
FROM s
""",
    tags=("multimodal", "audio", "segmentation"),
)
def mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing over opaque payload bytes: 30 ms windows with a
    20 ms hop at 4 bytes/ms — pure integer byte arithmetic + one
    explode + JVM-side binary substring, so segmentation of a 100 TB
    audio corpus is a single shuffle-free scan (the decode/feature
    stage then rides mapInPandas per segment).  ASCII corpus means the
    oracle's char slicing sees the identical bytes."""
    from distributed_system_spark.operators.multimodal import (
        segment_audio,
    )

    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    segs = segment_audio(docs, window_bytes=120, hop_bytes=80)
    return segs.select(
        "doc_id", "seg_idx", "start_ms", "end_ms",
        F.md5("seg").alias("seg_md5"),
    )


@register(
    "mm_scene_cuts",
    oracle="""
WITH f AS (
  SELECT doc_id, text, length(text) // 16 AS n FROM documents
),
d AS (
  SELECT doc_id, unnest(range(1, n)) AS frame_idx, text
  FROM f WHERE n >= 2
),
s AS (
  SELECT doc_id, frame_idx,
         CAST(list_sum(
           [abs(ord(substr(text, CAST(frame_idx * 16 + j AS INT), 1))
                - ord(substr(text, CAST((frame_idx - 1) * 16 + j AS INT),
                             1)))
            for j in range(1, 17)]) AS BIGINT) AS diff
  FROM d
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, diff,
       diff > 300 AS is_cut
FROM s
""",
    tags=("multimodal", "C10", "scene-cut"),
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-cut) detection through the mapInPandas
    plumbing: 16-byte frames, consecutive-frame sum-of-absolute-byte-
    deltas, cut where the difference exceeds 300.  The byte-chunk
    frame is the codec stand-in (corpus is ASCII, so the oracle's
    char arithmetic sees the same bytes); a real decoder's luma plane
    slots into the same per-doc numpy stage.

    At 100 TB: every frame of a payload lives inside its own row, so
    the detector is ONE shuffle-free Arrow pass — no window, no
    self-join, output linear in total frames."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    return scene_cuts(docs, frame_bytes=16, threshold=300)


@register(
    "mm_image_phash_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
),
px AS (
  SELECT doc_id, h * 8 AS npix, i,
         unicode(substr(text, CAST(3 * i + 1 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 2 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 3 AS INT), 1)) AS g
  FROM (SELECT doc_id, text, h, unnest(range(0, h * 8)) AS i FROM d)
),
sig AS (
  SELECT doc_id,
         CAST(list_sum([CASE WHEN gl[(p * npix) // 16 + 1] * npix > total
                             THEN CAST(pow(2.0, p) AS BIGINT)
                             ELSE 0 END
                        for p in range(0, 16)]) AS BIGINT) AS sig
  FROM (SELECT doc_id, any_value(npix) AS npix, sum(g) AS total,
               list(g ORDER BY i) AS gl
        FROM px GROUP BY doc_id)
)
SELECT sig, count(*) AS n_images,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM sig GROUP BY sig
""",
    tags=("multimodal", "image", "dedup"),
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE dedup by perceptual hash: document bytes become binary-PPM
    images (the mm_image_ppm_decode fixture), each image is REALLY
    decoded and reduced to a 16-bit average-hash (operators/
    multimodal.py::image_ahash — integer-only: resampled gray values
    vs cross-multiplied image mean), and images sharing a signature
    group into near-duplicate clusters.  The oracle recomputes every
    signature from raw character codes at the r/g/b offsets, so a
    green row certifies decode + hash + grouping end-to-end.

    Scale shape: decode+hash is one Arrow-batched linear pass; the
    cluster step is a partial-aggregated groupBy on the 16-bit key —
    the same bucket-join discipline as every other dedup family
    member (candidates share a bucket, never all-pairs).  A Hamming-
    tolerant variant bands the 16 bits exactly like simhash_neardup
    bands its 64."""
    from distributed_system_spark.operators.multimodal import (
        image_ahash,
        ppm_payloads,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 24
    )
    sigs = image_ahash(ppm_payloads(docs))
    return sigs.groupBy("sig").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "dedup_phash_hamming",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
),
px AS (
  SELECT doc_id, h * 8 AS npix, i,
         unicode(substr(text, CAST(3 * i + 1 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 2 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 3 AS INT), 1)) AS g
  FROM (SELECT doc_id, text, h, unnest(range(0, h * 8)) AS i FROM d)
),
sig AS (
  SELECT doc_id,
         CAST(list_sum([CASE WHEN gl[(p * npix) // 32 + 1] * npix > total
                             THEN CAST(pow(2.0, p) AS BIGINT)
                             ELSE 0 END
                        for p in range(0, 32)]) AS BIGINT) AS sig
  FROM (SELECT doc_id, any_value(npix) AS npix, sum(g) AS total,
               list(g ORDER BY i) AS gl
        FROM px GROUP BY doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 2
""",
    tags=("multimodal", "image", "dedup", "hamming"),
)
def dedup_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMMING-tolerant image near-dup pairs: 32-bit average-hashes
    (same real-decode pipeline as mm_image_phash_dedup, pair-emitting
    width) banded into 4 x 8-bit blocks; candidate pairs share at
    least one intact band, then the exact popcount filter keeps
    hamming <= 2.  Recall is EXACT by pigeonhole — 2 differing bits
    can dirty at most 2 of the 4 bands, so every qualifying pair
    collides somewhere — which is why the oracle can be the all-pairs
    answer (the simhash_neardup argument, at image scale).

    Scale shape — two fixes the second decade forced (the original
    16-bit / doc-level band join measured **79.3x** wall at 10x data,
    1.13 s -> 89.3 s at 50 k docs):

    1. The band join runs on DISTINCT signatures, not documents:
       candidate work is bounded by the signature population (each
       sig has at most C(32,1)+C(32,2) = 528 neighbors within
       hamming 2), independent of how many documents share a sig.
       Qualifying sig pairs then expand back to document pairs
       through two equi-joins — work linear in docs + output.
    2. 32-bit width for the pair emitter: a 16-bit space SATURATES
       (measured: 4 427 distinct sigs at 5 k docs, 4 401 at 50 k —
       every new doc lands in an existing bucket, so same-sig pairs
       grow quadratically: 48.6 k output pairs at sf0.1, 5.3 M at
       sf1).  The grouped cluster-counting form keeps 16 bits
       (mm_image_phash_dedup — aggregation, output bounded by the
       space); the pair-emitting form needs a space that outruns the
       corpus.  Post-fix: 1.53 s -> 3.20 s (2.1x) across the second
       decade, 3.45 s -> 10.02 s (2.9x) across the third."""
    from distributed_system_spark.operators.multimodal import (
        image_ahash,
        ppm_payloads,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 24
    )
    sigs = image_ahash(ppm_payloads(docs), bits=32)
    usig = sigs.select("sig").distinct()
    bands = usig.select(
        "sig",
        F.explode(
            F.array(*[F.lit(b) for b in range(4)])
        ).alias("band"),
    ).withColumn(
        # pyspark's shiftright only takes a literal bit count; the
        # per-row band shift needs the SQL form.
        "block",
        F.expr("shiftright(sig, band * 8) & 255"),
    )
    sig_pairs = (
        bands.select(F.col("sig").alias("sig_a"), "band", "block")
        .join(
            bands.select(F.col("sig").alias("sig_b"), "band", "block"),
            ["band", "block"],
        )
        .filter(F.col("sig_a") < F.col("sig_b"))
        .select("sig_a", "sig_b")
        .distinct()
        .filter(
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= 2
        )
    )
    da = sigs.select(
        F.col("doc_id").alias("ida"), F.col("sig").alias("sig_a")
    )
    db = sigs.select(
        F.col("doc_id").alias("idb"), F.col("sig").alias("sig_b")
    )
    cross = (
        da.join(sig_pairs, "sig_a")
        .join(db, "sig_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
    )
    same = (
        sigs.select(F.col("doc_id").alias("id_a"), "sig")
        .join(sigs.select(F.col("doc_id").alias("id_b"), "sig"), "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
    )
    return same.unionByName(cross)


@register(
    "mm_image_resize",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
), g AS (
  SELECT doc_id, text, h, yy.y AS y, xx.x AS x,
         least(CAST(floor((yy.y + 0.5) * (h / 4.0)) AS BIGINT), h - 1)
           AS sy,
         2 * xx.x + 1 AS sx
  FROM d
  CROSS JOIN (SELECT unnest(range(0, 4)) AS y) yy
  CROSS JOIN (SELECT unnest(range(0, 4)) AS x) xx
)
SELECT doc_id, y, x,
       CAST(unicode(substr(text, CAST(sy * 24 + sx * 3 + 1 AS INT), 1))
            AS BIGINT) AS r,
       CAST(unicode(substr(text, CAST(sy * 24 + sx * 3 + 2 AS INT), 1))
            AS BIGINT) AS g,
       CAST(unicode(substr(text, CAST(sy * 24 + sx * 3 + 3 AS INT), 1))
            AS BIGINT) AS b
FROM g
""",
    tags=("multimodal", "image", "resize"),
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL thumbnail pipeline under Spark: text bytes become binary
    PPM containers (8-wide RGB rasters), decode through the native
    codec, nearest-neighbor resize to 4x4 (pixel-center map
    src = min(floor((i + 0.5) * src/dst), src-1) — the standard
    kernel), and emit every output pixel long-form.  The oracle
    replays the SAME index arithmetic in SQL against the source
    character codes, so a green row certifies the full
    encode -> container -> decode -> resample chain byte-for-byte —
    not a passthrough.  The x map is exact: (x + 0.5) * 8/4 = 2x + 1.

    At 100 TB: decode+resize is one mapInPandas hop fused into the
    scan (no shuffle, no collect); output is a fixed 16 rows per
    image whatever the source size.  Compressed formats ride the
    same stage via decode_image's PIL-gated branch."""
    from distributed_system_spark.operators.multimodal import (
        ppm_payloads,
        resize_pixels,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 24
    )
    return resize_pixels(ppm_payloads(docs), 4, 4)


@register(
    "mm_image_channel_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
),
px AS (
  SELECT doc_id, h * 8 AS npix, c.c AS channel,
         unicode(substr(text, CAST(3 * i.i + c.c + 1 AS INT), 1)) AS v
  FROM d
  CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c
  JOIN (SELECT doc_id AS d2, unnest(range(0, h * 8)) AS i FROM d) i
    ON i.d2 = d.doc_id
)
SELECT doc_id, CAST(channel AS BIGINT) AS channel,
       CAST(min(v) AS BIGINT) AS cmin,
       CAST(max(v) AS BIGINT) AS cmax,
       CAST(sum(v) AS BIGINT) AS csum,
       CAST(any_value(npix) AS BIGINT) AS npix,
       round(CAST(sum(v) AS DOUBLE) / any_value(npix), 6) AS cmean
FROM px GROUP BY doc_id, channel
""",
    tags=("multimodal", "image", "features"),
)
def mm_image_channel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-image, per-channel color profile through the REAL decode
    path: document bytes become binary-PPM containers, decode through
    the native codec, and each R/G/B plane reduces to integer
    min/max/sum plus the derived mean — the exposure/dead-channel
    screen an image-curation pipeline runs before any model-side
    feature extraction (a channel with cmin = cmax is dead; a cmax
    pinned at 255 is clipped).  The oracle recomputes every statistic
    from raw character codes at the r/g/b offsets, so a green row
    certifies container -> decode -> plane split -> reduction
    end-to-end.

    All-integer until the single display division (rounded at 6 on
    identical int64 operands in both engines).

    At 100 TB: one Arrow-batched linear pass emitting exactly 3 rows
    per image — the reduction happens INSIDE the decode hop (numpy,
    per plane), so no pixel ever crosses a shuffle."""
    from distributed_system_spark.operators.multimodal import (
        image_channel_stats,
        ppm_payloads,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 24
    )
    stats = image_channel_stats(ppm_payloads(docs))
    return stats.select(
        "doc_id",
        "channel",
        "cmin",
        "cmax",
        "csum",
        "npix",
        F.round(
            F.col("csum").cast("double") / F.col("npix"), 6
        ).alias("cmean"),
    )


def _crossmodal_oracle() -> str:
    """Composed oracle for crossmodal_dedup_pipeline: the
    dedup_phash_hamming 32-bit signature chain (inline below, same
    literals) plus dedup_q's shared 64-bit SimHash CTE."""
    from distributed_system_spark.queries.dedup_q import _SIMHASH_SQL

    return f"""
WITH d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM documents
  WHERE length(text) >= 24
),
px AS (
  SELECT doc_id, h * 8 AS npix, i,
         unicode(substr(text, CAST(3 * i + 1 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 2 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 3 AS INT), 1)) AS g
  FROM (SELECT doc_id, text, h, unnest(range(0, h * 8)) AS i FROM d)
),
sig AS (
  SELECT doc_id,
         CAST(list_sum([CASE WHEN gl[(p * npix) // 32 + 1] * npix > total
                             THEN CAST(pow(2.0, p) AS BIGINT)
                             ELSE 0 END
                        for p in range(0, 32)]) AS BIGINT) AS sig
  FROM (SELECT doc_id, any_value(npix) AS npix, sum(g) AS total,
               list(g ORDER BY i) AS gl
        FROM px GROUP BY doc_id)
),
{_SIMHASH_SQL.lstrip()},
ip AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= 2
),
tp AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM fp a JOIN fp b ON a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
j AS (
  SELECT coalesce(i.id_b, t.id_b) AS doc_id,
         CASE WHEN i.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_img,
         CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_txt
  FROM ip i FULL OUTER JOIN tp t
    ON i.id_a = t.id_a AND i.id_b = t.id_b
)
SELECT doc_id,
       CAST(sum(in_img) > 0 AS BOOLEAN) AS by_image,
       CAST(sum(in_txt) > 0 AS BOOLEAN) AS by_text,
       count(*) AS n_pairs
FROM j GROUP BY doc_id
"""


def _crossmodal_ctrl_oracle() -> str:
    """Composed oracle for crossmodal_dedup_ctrl: the high-entropy
    controlled corpus (dedup_q._XMODAL_CTRL_SQL), a 60-bit sampled
    average-hash chain over it (same arithmetic as the 32-bit chain,
    wider space), and dedup_q's 128-bit SimHash CTE — both pair sets
    EXHAUSTIVE all-pairs, so the Spark side's banding is proven."""
    from distributed_system_spark.queries.dedup_q import (
        _SIMHASH128_SQL,
        _XMODAL_CTRL_SQL,
    )

    return f"""
WITH {_XMODAL_CTRL_SQL.lstrip()},
d AS (
  SELECT doc_id, text, length(text) // 24 AS h FROM xcorpus
  WHERE length(text) >= 24
),
px AS (
  SELECT doc_id, h * 8 AS npix, i,
         unicode(substr(text, CAST(3 * i + 1 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 2 AS INT), 1))
       + unicode(substr(text, CAST(3 * i + 3 AS INT), 1)) AS g
  FROM (SELECT doc_id, text, h, unnest(range(0, h * 8)) AS i FROM d)
),
sig AS (
  SELECT doc_id,
         CAST(list_sum([CASE WHEN gl[(p * npix) // 60 + 1] * npix > total
                             THEN CAST(pow(2.0, p) AS BIGINT)
                             ELSE 0 END
                        for p in range(0, 60)]) AS BIGINT) AS sig
  FROM (SELECT doc_id, any_value(npix) AS npix, sum(g) AS total,
               list(g ORDER BY i) AS gl
        FROM px GROUP BY doc_id)
),
{_SIMHASH128_SQL.lstrip()},
ip AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= 2
),
tp AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM fp128 a JOIN fp128 b ON a.id < b.id
  WHERE bit_count(xor(a.sh1, b.sh1)) + bit_count(xor(a.sh0, b.sh0)) <= 3
),
j AS (
  SELECT coalesce(i.id_b, t.id_b) AS doc_id,
         CASE WHEN i.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_img,
         CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_txt
  FROM ip i FULL OUTER JOIN tp t
    ON i.id_a = t.id_a AND i.id_b = t.id_b
)
SELECT doc_id,
       CAST(sum(in_img) > 0 AS BOOLEAN) AS by_image,
       CAST(sum(in_txt) > 0 AS BOOLEAN) AS by_text,
       count(*) AS n_pairs
FROM j GROUP BY doc_id
"""


@register(
    "crossmodal_dedup_ctrl",
    oracle=_crossmodal_ctrl_oracle(),
    tags=("multimodal", "dedup", "ctrl", "bench"),
)
def crossmodal_dedup_ctrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``crossmodal_dedup_pipeline`` rebuilt for the FOURTH scale
    decade — the same two-modality drop list, with BOTH candidate
    generators re-sized so buckets stay near-singleton on a
    high-entropy corpus:

    - image side: 60-bit average-hash (space 2^60 vs the raw
      query's 2^32) banded 3 x 20 bits — pigeonhole-lossless for
      hamming <= 2, buckets ~n/2^20;
    - text side: 128-bit SimHash banded 4 x 32 bits
      (``simhash128_neardup_pairs``) — lossless for hamming <= 3,
      buckets ~n/2^32.

    The raw flagship measures real ascii text, whose byte-brightness
    statistics saturate a 32-bit average-hash space (every doc pair
    birthday-collides in some band — candidates go quadratic with
    the CORPUS, SCALE.md round-9); this ctrl corpus
    (``_XMODAL_CTRL_SQL``) replaces each doc's bytes with md5 blocks
    keyed by its doc_id — uniform brightness, doc-unique tokens —
    and plants 5% exact clones as ground truth, so the decade table
    measures the PLAN.  Both oracles are exhaustive all-pairs, so
    banding recall is proven at the gate.

    Scale shape: sig pairs join on DISTINCT signatures (3-band
    equi-join, expand back through two doc joins); text pairs join
    on (band, 32-bit bucket); agreement is one full-outer equi-join
    on the pair key; reduction one groupBy on the dropped id."""
    from distributed_system_spark.operators.dedup import (
        simhash128_docs,
        simhash128_neardup_pairs,
    )
    from distributed_system_spark.operators.multimodal import (
        image_ahash,
        ppm_payloads,
    )
    from distributed_system_spark.queries.dedup_q import _xmodal_ctrl

    corpus = _xmodal_ctrl(
        load_table(spark, sf_dir, "documents")
    ).filter(F.length("text") >= 24)
    # Same five-consumer shape as dedup_phash_hamming: checkpoint the
    # narrow 60-bit (doc_id, sig) rows so the ctrl-corpus generation +
    # PPM decode + average-hash pass runs once, not 5x (r13).  The
    # image-signature build and the text-side SimHash fingerprint
    # build (checkpointed inside simhash128_neardup_pairs) are
    # INDEPENDENT passes over the same corpus, so they materialize
    # concurrently (guide §2.6; concurrency.eager_all).
    from distributed_system_spark.concurrency import eager_all

    sigs, txt_pairs = eager_all(
        spark,
        image_ahash(ppm_payloads(corpus), bits=60).localCheckpoint,
        lambda: simhash128_neardup_pairs(
            simhash128_docs(corpus), max_hamming=3
        ),
    )
    usig = sigs.select("sig").distinct()
    bands = usig.select(
        "sig",
        F.explode(F.array(*[F.lit(b) for b in range(3)])).alias("band"),
    ).withColumn(
        "block", F.expr("shiftright(sig, band * 20) & 1048575")
    )
    sig_pairs = (
        bands.select(F.col("sig").alias("sig_a"), "band", "block")
        .join(
            bands.select(F.col("sig").alias("sig_b"), "band", "block"),
            ["band", "block"],
        )
        .filter(F.col("sig_a") < F.col("sig_b"))
        .select("sig_a", "sig_b")
        .distinct()
        .filter(
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= 2
        )
    )
    da = sigs.select(
        F.col("doc_id").alias("ida"), F.col("sig").alias("sig_a")
    )
    db = sigs.select(
        F.col("doc_id").alias("idb"), F.col("sig").alias("sig_b")
    )
    cross = (
        da.join(sig_pairs, "sig_a")
        .join(db, "sig_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
        )
    )
    same = (
        sigs.select(F.col("doc_id").alias("id_a"), "sig")
        .join(sigs.select(F.col("doc_id").alias("id_b"), "sig"), "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    img = (
        same.unionByName(cross)
        .distinct()
        .select("id_a", "id_b", F.lit(1).alias("in_img"))
    )
    txt = txt_pairs.select("id_a", "id_b", F.lit(1).alias("in_txt"))
    j = img.join(txt, ["id_a", "id_b"], "full_outer").select(
        F.col("id_b").alias("doc_id"),
        F.coalesce("in_img", F.lit(0)).alias("in_img"),
        F.coalesce("in_txt", F.lit(0)).alias("in_txt"),
    )
    return j.groupBy("doc_id").agg(
        (F.sum("in_img") > 0).alias("by_image"),
        (F.sum("in_txt") > 0).alias("by_text"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@register(
    "crossmodal_dedup_pipeline",
    oracle=_crossmodal_oracle(),
    tags=("multimodal", "dedup", "flagship"),
)
def crossmodal_dedup_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROSS-MODALITY dedup flagship: the IMAGE near-dup pass
    (``dedup_phash_hamming`` — real PPM decode -> 32-bit average-hash
    -> pigeonhole-lossless banded Hamming<=2 pairs) and the TEXT
    near-dup pass (``simhash_neardup`` — 64-bit SimHash, banded
    Hamming<=3) run over the SAME corpus in ONE composed plan, their
    pair sets full-outer joined on the pair key, and reduced to the
    multimodal DROP LIST: for every near-dup pair the keep-min rule
    drops the higher doc_id, and each dropped doc carries WHICH
    modality caught it (by_image / by_text) plus its pair count.
    This is ``dedup_modality_agreement``'s one-row report turned into
    the per-document curation artifact — the list an image+caption
    pipeline actually applies, where text-only or image-only flags
    mark the disagreement cases a reviewer samples.

    Scale shape: both candidate generators are banded equi-joins
    (signature-distinct on the image side, (band, bucket) on the
    text side — each documented in its own query); the agreement
    join is equi on (id_a, id_b); the final reduction is one groupBy
    on the dropped id.  No cartesian anywhere (plan-asserted).  On
    corpora past ~10^6 docs the 32-bit image space and 8-bit simhash
    bands saturate — the FOURTH-decade form is
    ``crossmodal_dedup_ctrl`` (60-bit image hash banded 3x20,
    128-bit simhash banded 4x32; round-9)."""
    from distributed_system_spark.queries.dedup_q import simhash_neardup

    img = dedup_phash_hamming(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_img")
    )
    txt = simhash_neardup(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_txt")
    )
    j = img.join(txt, ["id_a", "id_b"], "full_outer").select(
        F.col("id_b").alias("doc_id"),
        F.coalesce("in_img", F.lit(0)).alias("in_img"),
        F.coalesce("in_txt", F.lit(0)).alias("in_txt"),
    )
    return j.groupBy("doc_id").agg(
        (F.sum("in_img") > 0).alias("by_image"),
        (F.sum("in_txt") > 0).alias("by_text"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@register(
    "mm_audio_fingerprint",
    oracle="""
WITH s AS (
  SELECT doc_id, n, i, unicode(c) - 128 AS v FROM (
    SELECT doc_id, length(text) AS n,
           unnest(str_split(text, '')) AS c,
           generate_subscripts(str_split(text, ''), 1) AS i
    FROM documents WHERE length(text) >= 32)
),
e AS (
  SELECT doc_id, ((i - 1) * 32) // n AS frame,
         SUM(CAST(v AS BIGINT) * v) AS energy
  FROM s GROUP BY doc_id, ((i - 1) * 32) // n
),
f AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN a.energy > b.energy
                       THEN CAST(1 AS BIGINT) << CAST(30 - a.frame AS INT)
                       ELSE 0 END) AS BIGINT) AS afp
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.frame = a.frame + 1
  GROUP BY a.doc_id
)
SELECT f.doc_id, f.afp,
       CAST(count(*) OVER (PARTITION BY f.afp) AS BIGINT) AS n_same
FROM f
""",
    tags=("multimodal", "audio", "dedup", "fingerprint"),
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup fingerprints through the REAL WAV codec — the
    third modality of the dedup family (text simhash, image ahash,
    now audio energy-delta): each clip's 31-bit fingerprint sets bit
    b when time-slice b's integer energy exceeds slice b+1's
    (``operators/multimodal.py::audio_fingerprint``), and the readout
    counts how many clips share each fingerprint — the exact-match
    audio dedup a crawl pipeline runs before the expensive acoustic
    model ever sees a clip.

    The oracle recomputes the fingerprint straight from character
    codes (sample = byte - 128, the wav_payloads contract), so a
    green row certifies encode → WAV container → decode → framing →
    energy → bit-packing end to end, all integer.

    Scale shape: fingerprinting is one Arrow map pass (zero
    shuffles); the share-count is one groupBy on the fingerprint +
    an equi join back — hash-space 2^31, so buckets stay
    near-singleton and the join never amplifies."""
    from distributed_system_spark.operators.multimodal import (
        audio_fingerprint,
        wav_payloads,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 32
    )
    # fp feeds the share-count groupBy AND the join-back left side;
    # left lazy both re-run the WAV encode->decode->energy Arrow pass.
    # One checkpoint of the narrow (doc_id, afp) rows bounds it (r13).
    fp = audio_fingerprint(wav_payloads(docs)).localCheckpoint()
    counts = fp.groupBy("afp").agg(F.count(F.lit(1)).alias("n_same"))
    return fp.join(counts, "afp").select(
        "doc_id", "afp", F.col("n_same").cast("long").alias("n_same")
    )


@register(
    "mm_transcript_align",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) AS n_bytes,
         len(str_split(text, ' ')) AS n_toks
  FROM documents
),
segs AS (
  SELECT doc_id,
         unnest(range(0, (n_bytes - 120) // 80 + 1)) AS seg_idx,
         text
  FROM d WHERE n_bytes >= 120
),
seg AS (
  SELECT doc_id, seg_idx,
         CAST(seg_idx * 80 / 4 AS BIGINT) AS seg_start_ms,
         CAST((seg_idx * 80 + 120) / 4 AS BIGINT) AS seg_end_ms,
         md5(substr(text, CAST(seg_idx * 80 + 1 AS INT), 120)) AS seg_md5
  FROM segs
),
chunks AS (
  SELECT doc_id,
         unnest(range(0,
           CAST(greatest(ceil((n_toks - 50) / 40.0), 0) AS BIGINT) + 1))
           AS chunk_id
  FROM d
),
c AS (
  SELECT doc_id, chunk_id,
         CAST(chunk_id * 40 * 2 AS BIGINT) AS chunk_start_ms
  FROM chunks
),
hits AS (
  SELECT c.doc_id, c.chunk_id, c.chunk_start_ms,
         s.seg_idx, s.seg_start_ms, s.seg_md5,
         row_number() OVER (PARTITION BY c.doc_id, c.chunk_id
                            ORDER BY s.seg_start_ms DESC) AS rn
  FROM c JOIN seg s
    ON s.doc_id = c.doc_id
   AND s.seg_start_ms <= c.chunk_start_ms
   AND c.chunk_start_ms < s.seg_end_ms
)
SELECT doc_id, chunk_id, chunk_start_ms,
       seg_idx, seg_start_ms, seg_md5
FROM hits WHERE rn = 1
""",
    tags=("multimodal", "audio", "alignment"),
)
def mm_transcript_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript↔audio ALIGNMENT: map each text chunk (doc_chunking's
    50-token/stride-40 rule, 2 ms per token on the synthetic timeline)
    to the audio segment covering its start time (mm_audio_segments'
    30 ms windows, 20 ms hop) — the forced-alignment/subtitle-sync
    plumbing of a speech-pretraining pipeline, composed entirely from
    the two already-certified windowing rules.  Where the hop overlap
    covers a chunk start with two segments, the LATEST-starting one
    wins (as-of-backward with containment); transcript chunks past
    the audio tail have no segment and drop (inner semantics,
    documented).

    Scale shape: both windowings are shuffle-free explodes; the
    alignment is an EQUI hash join on doc_id with the time predicate
    as a residual (join_point_in_time's shape) and the winner is a
    per-(doc, chunk) row_number — partitions bounded by per-doc
    segment fanout, never a global window."""
    from distributed_system_spark.operators.multimodal import (
        segment_audio,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    seg = (
        segment_audio(attach_binary(docs), window_bytes=120, hop_bytes=80)
        .select(
            F.col("doc_id").alias("s_doc"),
            "seg_idx",
            F.col("start_ms").cast("long").alias("seg_start_ms"),
            F.col("end_ms").cast("long").alias("seg_end_ms"),
            F.md5("seg").alias("seg_md5"),
        )
    )
    n_toks = F.size(F.split("text", " ", -1))
    n_chunks = (
        F.greatest(F.ceil((n_toks - 50) / F.lit(40.0)), F.lit(0)).cast(
            "long"
        )
        + 1
    )
    c = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * 80).cast("long").alias("chunk_start_ms"),
    )
    hits = c.join(
        seg,
        (F.col("s_doc") == F.col("doc_id"))
        & (F.col("seg_start_ms") <= F.col("chunk_start_ms"))
        & (F.col("chunk_start_ms") < F.col("seg_end_ms")),
    )
    w = Window.partitionBy("doc_id", "chunk_id").orderBy(
        F.col("seg_start_ms").desc()
    )
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "chunk_id",
            "chunk_start_ms",
            "seg_idx",
            "seg_start_ms",
            "seg_md5",
        )
    )


@register(
    "mm_interleaved_pack",
    oracle="""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks, length(text) AS nb,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
chunks AS (
  SELECT doc_id, h, 2 * cid AS seq, 'text' AS kind,
         CAST(len(list_slice(toks, 1 + 40 * cid,
                             least(40 * cid + 50, len(toks)))) AS BIGINT)
           AS cost
  FROM (SELECT doc_id, h, toks,
               unnest(range(0,
                 CAST(greatest(ceil((len(toks) - 50) / 40.0), 0) AS BIGINT)
                 + 1)) AS cid
        FROM t)
),
imgs AS (
  SELECT doc_id, h, 1 AS seq, 'image' AS kind,
         least(CAST(ceil(nb / 64.0) AS BIGINT), 256) AS cost
  FROM t
),
items AS (
  SELECT doc_id, h, seq, kind, cost FROM chunks
  UNION ALL
  SELECT doc_id, h, seq, kind, cost FROM imgs
),
c AS (
  SELECT substr(h, 1, 1) AS shard, kind, cost,
         SUM(cost) OVER (PARTITION BY substr(h, 1, 1)
                         ORDER BY h, doc_id, seq
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM items
)
SELECT shard,
       CAST((cum - cost) // 512 AS BIGINT) AS pack_id,
       count(*) AS n_items,
       CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_text,
       CAST(sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_images,
       CAST(sum(cost) AS BIGINT) AS pack_tokens,
       CAST(greatest(sum(cost) - 512, 0) AS BIGINT) AS overflow_tokens
FROM c GROUP BY shard, CAST((cum - cost) // 512 AS BIGINT)
""",
    tags=("multimodal", "llm", "packing", "vlm"),
)
def mm_interleaved_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERLEAVED image+text sequence packing — the VLM-training prep
    shape (r10 verdict item #6): the packing family covered text
    (``seq_packing``) and events (``event_sequence_pack``) but not
    mixed-modality documents, where image placeholders consume context
    budget alongside text tokens.

    Each document contributes an ORDERED item stream: its
    ``doc_chunking`` text chunks (window 50 / stride 40, cost = chunk
    token count) at even sequence slots, and its image payload as a
    placeholder at slot 1 (between the first and second chunk — a
    leading-image interleave), costing ``min(ceil(n_bytes/64), 256)``
    tokens (the ViT patch-budget rule: 64 payload bytes per visual
    token, capped at one 256-token tile).  Items pack into 512-token
    contexts per md5 SHARD with the ``seq_packing`` sequential-fill
    rule — an item belongs to the pack its first token lands in; the
    per-(shard, pack) report carries item/text/image counts, token
    fill, and overflow (tokens past the budget when an item straddles
    the boundary — the padding/truncation decision downstream
    training makes).

    Scale shape: one scan; chunk fan-out bounded by n_tokens/stride;
    the running sum is a window PARTITIONED by the 16-way shard
    (embarrassingly parallel, zero global sorts — plan-asserted); the
    report is a partial-aggregated groupBy.  All-integer outputs, so
    the oracle compare is exact."""
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    toks = F.split("text", " ", -1)
    base = docs.select(
        "doc_id",
        h.alias("h"),
        toks.alias("toks"),
        F.size(toks).alias("n"),
        F.length("text").alias("nb"),
    )
    n_chunks = (
        F.greatest(F.ceil((F.col("n") - 50) / F.lit(40.0)), F.lit(0)).cast(
            "long"
        )
        + 1
    )
    piece = F.slice("toks", (1 + 40 * F.col("cid")).cast("int"), 50)
    chunks = base.select(
        "doc_id",
        "h",
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("_p", "cid"),
        "toks",
    ).select(
        "doc_id",
        "h",
        (2 * F.col("cid")).alias("seq"),
        F.lit("text").alias("kind"),
        F.size(piece).cast("long").alias("cost"),
    )
    imgs = base.select(
        "doc_id",
        "h",
        F.lit(1).cast("long").alias("seq"),
        F.lit("image").alias("kind"),
        F.least(
            F.ceil(F.col("nb") / F.lit(64.0)).cast("long"), F.lit(256)
        ).alias("cost"),
    )
    items = chunks.unionByName(imgs).withColumn(
        "shard", F.substring("h", 1, 1)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id", "seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = items.withColumn("cum", F.sum("cost").over(w))
    return (
        c.select(
            "shard",
            F.expr("(cum - cost) div 512").alias("pack_id"),
            "kind",
            "cost",
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
            F.sum((F.col("kind") == "image").cast("long")).alias(
                "n_images"
            ),
            F.sum("cost").alias("pack_tokens"),
            F.greatest(
                F.sum("cost") - 512, F.lit(0).cast("long")
            ).alias("overflow_tokens"),
        )
    )
