"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extraction plumbing.

Design (LLM-pipeline surface, SURVEY.md §2.C): media lives in the
DataFrame as a ``binary`` column next to a typed metadata struct
(mime, n_bytes, checksum). Decode / resize / frame-sample run as
``mapInPandas`` stages — Arrow moves the bytes to Python in batches,
never row-at-a-time. The actual image/audio codecs are NOT in this
container, so ``decode_image``/``decode_audio`` are STUBS behind an
import-try (PIL/soundfile): they raise ``NotImplementedError`` with a
clear message when the lib is absent. The Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and
tested via the deterministic ``fake_features`` extractor.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY), so partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` like any other column; keep
payloads under ~100 MB/row (parquet page limits) and store larger
media as object-store URIs + fetch inside the batch fn instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

META_SCHEMA = "mime string, n_bytes bigint, checksum string"

try:  # codec gate: not in this container — plumbing still real
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_binary(
    df: DataFrame, text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Demo payload builder: treat a string column as the media bytes
    and attach the typed metadata struct every multimodal row carries."""
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB: PIL is not in this container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container has no codecs — "
            "use fake_features for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decoder' standing in for codec work:
    (n_bytes, sum of first 64 byte values, a [0,1) scalar feature).
    Mirrors what a real extractor returns so plumbing tests are real.
    """
    head = payload[:64]
    head_sum = sum(head)
    return len(payload), head_sum, (len(payload) % 97) / 97.0


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB: PIL is not in this container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL; container has no codecs — "
            "the mapInPandas plumbing is exercised via sample_frames"
        )
    import io

    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    out = io.BytesIO()  # pragma: no cover
    img.resize((width, height)).save(out, img.format)  # pragma: no cover
    return out.getvalue()  # pragma: no cover


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    fixed-size frames and keep every ``every``-th one — the video
    frame-sample pattern with a byte-chunk stand-in for the codec
    (a real decoder slots into the same mapInPandas stage).

    One row out per sampled frame (explode-shaped). Arrow-batched;
    output size is |payload| / every, so a 100 TB corpus sampled at
    every=30 (1 fps of 30 fps video) emits ~3.3 TB downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[object] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, every):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(b[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, "payload").mapInPandas(
        run, f"{id_col} bigint, frame_idx bigint, frame binary"
    )


def extract_features(
    df: DataFrame,
    fn: Callable[[bytes], tuple] = fake_features,
    id_col: str = "doc_id",
    out_schema: str = "doc_id bigint, n_bytes bigint, head_sum bigint, feat0 double",
) -> DataFrame:
    """Arrow-batched feature extraction over the ``payload`` column.

    The mapInPandas stage is the one Python hop; everything before
    (payload build, filtering) and after (joins, aggs) stays JVM-side.
    Batch size rides spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    cols = [id_col, "payload"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "head_sum", "feat0"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(*cols).mapInPandas(run, out_schema)


def segment_audio(
    docs: DataFrame,
    window_bytes: int = 120,
    hop_bytes: int = 80,
    bytes_per_ms: int = 4,
) -> DataFrame:
    """Overlapping fixed-width windows over an opaque audio payload —
    the ASR/feature prep shape (e.g. 30 ms windows, 20 ms hop).

    Segmentation is pure metadata + byte arithmetic (no codec): the
    window/hop are expressed in BYTES (sample_rate × sample_width
    folded into ``bytes_per_ms``), offsets stay integers, and the
    per-segment bytes come from a JVM-side substring on the binary
    column — one explode, no shuffle, no Python.  A real resampler
    or feature extractor slots in as a mapInPandas stage over the
    ``seg`` column exactly like ``extract_features``.  Docs shorter
    than one window contribute zero segments (explicit guard — a
    descending sequence() would throw).
    """
    n_segs = F.when(
        F.col("meta.n_bytes") >= window_bytes,
        ((F.col("meta.n_bytes") - window_bytes) / hop_bytes).cast("long")
        + 1,
    ).otherwise(F.lit(0))
    segs = docs.withColumn("n_segs", n_segs).filter(
        F.col("n_segs") > 0
    )
    idx = F.explode(F.sequence(F.lit(0), F.col("n_segs") - 1)).alias(
        "seg_idx"
    )
    start_b = F.col("seg_idx") * hop_bytes
    return (
        segs.select("doc_id", "payload", idx)
        .select(
            "doc_id",
            "seg_idx",
            (start_b / bytes_per_ms).cast("long").alias("start_ms"),
            ((start_b + window_bytes) / bytes_per_ms)
            .cast("long")
            .alias("end_ms"),
            F.expr(
                f"substring(payload, seg_idx * {hop_bytes} + 1, "
                f"{window_bytes})"
            ).alias("seg"),
        )
    )
