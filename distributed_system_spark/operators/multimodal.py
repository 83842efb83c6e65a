"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extraction plumbing.

Design (LLM-pipeline surface, SURVEY.md §2.C): media lives in the
DataFrame as a ``binary`` column next to a typed metadata struct
(mime, n_bytes, checksum). Decode / resize / frame-sample run as
``mapInPandas`` stages — Arrow moves the bytes to Python in batches,
never row-at-a-time. REAL codec paths shipped here, container-safe:
PCM WAV decode/encode via the stdlib ``wave`` module (audio_features
runs it end-to-end under Spark), and pure-numpy decoders for the
uncompressed image formats (binary PPM, 24-bit BMP) with a numpy
nearest-neighbor resize kernel.  Compressed image formats (JPEG/PNG)
fall through to PIL behind an import-try and raise
``NotImplementedError`` only when that lib is absent.  The
deterministic ``fake_features`` extractor remains for
codec-independent plumbing tests.

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
    """Decode an image payload to an H×W×3 uint8 numpy array.

    REAL decode paths, in order: (1) formats this module decodes
    itself with numpy/stdlib — binary PPM (P6), 24-bit uncompressed
    BMP, and baseline PNG (stdlib zlib inflate + spec unfiltering,
    decode_png) — available in any container; (2) PIL for the
    remaining compressed formats (JPEG/WebP/...), import-gated.
    Only a PIL-class payload without PIL raises."""
    import numpy as np

    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if _HAS_PIL:
        import io

        return np.asarray(  # pragma: no cover - PIL absent in CI
            Image.open(io.BytesIO(payload)).convert("RGB")
        )
    raise NotImplementedError(
        "compressed image decode beyond PNG requires PIL; this "
        "container decodes PPM(P6)/BMP/PNG natively"
    )


def decode_ppm(payload: bytes):
    """Pure-numpy binary PPM (P6) decoder: header 'P6\\n<w> <h>\\n<max>\\n'
    then w*h*3 raw RGB bytes.  Returns an (h, w, 3) uint8 array."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # Header tokens may be separated by any whitespace and interleaved
    # with '#' comments per the netpbm spec.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def decode_bmp(payload: bytes):
    """Pure-numpy 24-bit uncompressed BMP decoder (BITMAPINFOHEADER).
    Returns an (h, w, 3) uint8 RGB array (BMP stores BGR bottom-up
    with rows padded to 4 bytes — both undone here)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (bpp={bpp})")
    stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def decode_png(payload: bytes):
    """Pure-stdlib PNG decoder (zlib inflate + spec unfiltering) —
    no PIL, no new dependency.  Supports the baseline still-image
    profile: 8-bit depth, color types 0 (gray), 2 (RGB) and 6
    (RGBA), non-interlaced, all five scanline filters (None/Sub/Up/
    Average/Paeth per the PNG spec §9).  Returns an (h, w, 3) uint8
    RGB array (gray replicated, alpha dropped — matching the PIL
    path's convert("RGB") contract)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack_from(">I", payload, pos), payload[
            pos + 4 : pos + 8
        ]
        body = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2, 6) or comp or filt or interlace:
        raise ValueError(
            "only 8-bit gray/RGB/RGBA non-interlaced PNG "
            f"(depth={depth} color={ctype} interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = np.frombuffer(
        zlib.decompress(b"".join(idat)), dtype=np.uint8
    ).reshape(h, 1 + w * ch)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f, line = raw[y, 0], raw[y, 1:].astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the left neighbor
            cur = np.zeros(w * ch, dtype=np.int64)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) >> 1
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else b if pb <= pc else c
                    )
                else:
                    raise ValueError(f"unknown PNG filter {f}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y], prev = cur.astype(np.uint8), cur
    img = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


def encode_png(arr) -> bytes:
    """Minimal PNG encoder (stdlib zlib, filter 0 on every scanline):
    (h, w, 3) uint8 RGB -> non-interlaced 8-bit truecolor PNG.  The
    deterministic inverse of decode_png for round-trip tests and
    payload builders."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * 3)], axis=1
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def encode_ppm(arr) -> bytes:
    """Inverse of decode_ppm: (h, w, 3) uint8 -> binary PPM bytes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize of an (h, w, c) array via numpy fancy
    indexing — the vectorized core a real thumbnailer needs, codec-
    free.  Pixel centers follow the standard (i + 0.5) * scale map."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = np.minimum(
        ((np.arange(height) + 0.5) * (h / height)).astype(np.int64), h - 1
    )
    xs = np.minimum(
        ((np.arange(width) + 0.5) * (w / width)).astype(np.int64), w - 1
    )
    return arr[ys][:, xs]


def decode_wav(payload: bytes):
    """REAL audio decode via the stdlib ``wave`` module + numpy: parse
    a PCM WAV payload into (n_channels, sample_rate, samples) where
    samples is an (n_frames, n_channels) int numpy array.  8-bit PCM
    is unsigned per the WAV spec and re-centered to signed."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch = wf.getnchannels()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        )
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    return nch, rate, samples.reshape(-1, nch)


def encode_wav(
    samples, sample_rate: int = 8000, sample_width: int = 1
) -> bytes:
    """Inverse of decode_wav for test/pipeline payload synthesis:
    mono int samples -> PCM WAV bytes (stdlib ``wave`` writer)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    s = np.asarray(samples)
    if sample_width == 1:
        raw = (s + 128).astype(np.uint8).tobytes()
    elif sample_width == 2:
        raw = s.astype("<i2").tobytes()
    else:
        raise NotImplementedError(f"{8 * sample_width}-bit PCM")
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sample_width)
        wf.setframerate(sample_rate)
        wf.writeframes(raw)
    return buf.getvalue()


def fake_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decoder' standing in for codec work:
    (n_bytes, sum of first 64 byte values, a [0,1) scalar feature).
    Mirrors what a real extractor returns so plumbing tests are real.
    """
    head = payload[:64]
    head_sum = sum(head)
    return len(payload), head_sum, (len(payload) % 97) / 97.0


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload, returning PPM bytes.  Decode goes
    through the real native/PIL chain in ``decode_image``; the resize
    itself is the numpy nearest-neighbor kernel (codec-free)."""
    return encode_ppm(resize_nearest(decode_image(payload), width, height))


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL image decode + per-image stats: width,
    height, and channel means, via the native PPM/BMP decoders (PIL
    chain for compressed formats).  The mapInPandas stage is the one
    Python hop — same contract as extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                arr = decode_image(bytes(p))
                h, w = arr.shape[:2]
                m = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (i, w, h, float(m[0]), float(m[1]), float(m[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "mean_r", "mean_g", "mean_b"
                ],
            )

    return df.select(id_col, "payload").mapInPandas(
        run,
        f"{id_col} bigint, width bigint, height bigint, "
        "mean_r double, mean_g double, mean_b double",
    )


def resize_pixels(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched REAL decode -> nearest-neighbor resize ->
    long-form pixel emission: each payload decodes through the native
    codec chain (``decode_image``), resizes to (width x height) with
    ``resize_nearest`` (pixel-center index map, the standard
    thumbnailer kernel), and emits one row per OUTPUT pixel — the
    long form keeps the oracle comparison row-wise, exactly like
    ``image_features``.

    At 100 TB: one mapInPandas hop, no shuffle anywhere — resize is
    embarrassingly parallel per payload, and output volume is the
    FIXED width*height rows per image regardless of source
    resolution (the reason thumbnailing belongs inside the scan-side
    map, not after a collect)."""
    import numpy as np

    yy, xx = np.meshgrid(
        np.arange(height, dtype=np.int64),
        np.arange(width, dtype=np.int64),
        indexing="ij",
    )
    yf, xf = yy.ravel(), xx.ravel()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ys, xs, rs, gs, bs = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                arr = resize_nearest(
                    decode_image(bytes(p)), width, height
                )
                flat = arr.reshape(-1, 3).astype(np.int64)
                ids.append(np.full(flat.shape[0], i, dtype=np.int64))
                ys.append(yf)
                xs.append(xf)
                rs.append(flat[:, 0])
                gs.append(flat[:, 1])
                bs.append(flat[:, 2])
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    "y": np.concatenate(ys),
                    "x": np.concatenate(xs),
                    "r": np.concatenate(rs),
                    "g": np.concatenate(gs),
                    "b": np.concatenate(bs),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        run,
        f"{id_col} bigint, y bigint, x bigint, "
        "r bigint, g bigint, b bigint",
    )


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL audio decode + per-clip stats via the stdlib
    WAV codec: sample count, duration, RMS and peak amplitude."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                _nch, rate, samples = decode_wav(bytes(p))
                mono = samples.mean(axis=1)
                rows.append(
                    (
                        i,
                        len(samples),
                        int(len(samples) * 1000 // rate),
                        float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))),
                        int(np.abs(samples).max(initial=0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "duration_ms", "rms", "peak"
                ],
            )

    return df.select(id_col, "payload").mapInPandas(
        run,
        f"{id_col} bigint, n_samples bigint, duration_ms bigint, "
        "rms double, peak bigint",
    )


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


def wav_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: int = 8000,
) -> DataFrame:
    """Encode each row's text bytes as an 8-bit PCM WAV payload
    (mapInPandas) — corpus synthesis for the real-codec decode path:
    sample value = byte value - 128, so the decoded stats are pure
    functions of the text and fully oracle-checkable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(
                    np.frombuffer(
                        t.encode("ascii"), dtype=np.uint8
                    ).astype(np.int16)
                    - 128,
                    sample_rate=sample_rate,
                    sample_width=1,
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} bigint, payload binary"
    )


def ppm_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Encode each row's text bytes as a binary-PPM image payload
    (mapInPandas): ``width``-pixel rows of RGB triples, tail bytes
    that don't fill a full row dropped.  Rows with fewer than one
    full row of bytes emit a 1×1 black pixel placeholder."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_bytes = width * 3
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
                h = len(b) // row_bytes
                if h == 0:
                    arr = np.zeros((1, 1, 3), dtype=np.uint8)
                else:
                    arr = b[: h * row_bytes].reshape(h, width, 3)
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} bigint, payload binary"
    )


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


def scene_cuts(
    df: DataFrame,
    frame_bytes: int = 16,
    threshold: int = 300,
    id_col: str = "doc_id",
) -> DataFrame:
    """Scene-cut detection over binary payloads: split each payload
    into full fixed-size frames, score consecutive-frame difference
    as the sum of absolute per-byte deltas, and flag a cut where the
    difference exceeds ``threshold`` — the shot-boundary pattern with
    the byte-chunk frame standing in for a decoded luma plane (a real
    decoder slots into the same stage).

    All of a payload's frames live inside its own row, so the whole
    detector is one shuffle-free mapInPandas pass — per-doc numpy
    (reshape + int16 abs-diff), never a window or self-join.  One row
    out per frame transition; ragged tails (< frame_bytes) are
    dropped so every compared frame is complete.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[object] = []
            idxs: list[int] = []
            diffs: list[int] = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p)
                n = len(b) // frame_bytes
                if n < 2:
                    continue
                a = (
                    np.frombuffer(b[: n * frame_bytes], dtype=np.uint8)
                    .reshape(n, frame_bytes)
                    .astype(np.int16)
                )
                d = np.abs(a[1:] - a[:-1]).sum(axis=1)
                ids.extend([i] * (n - 1))
                idxs.extend(range(1, n))
                diffs.extend(int(x) for x in d)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "diff": diffs}
            )

    out = df.select(id_col, "payload").mapInPandas(
        run, f"{id_col} bigint, frame_idx bigint, diff bigint"
    )
    return out.withColumn("is_cut", F.col("diff") > threshold)


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """``bits``-wide AVERAGE-HASH per image, through the REAL decoder:
    decode the payload (PPM/BMP/PNG via decode_image), sum r+g+b per
    pixel into an integer gray value, resample ``bits`` fixed
    positions (p * npix // bits — the aHash 'resize' step as index
    arithmetic), and set bit p when the sample is above the image
    mean.  The mean compare is cross-multiplied integers
    (g * npix > total) so no float exists anywhere — the signature is
    bit-identical in any engine that can read the same bytes.

    Width picks the use: 16 bits groups aggressively (cluster
    counting — the space saturates by design, like a coarse LSH
    band); 32 bits is the pair-emitting near-dup width (space does
    not saturate at any plausible image count, so same-sig buckets
    stay near-singleton; keep ``bits`` <= 62 so 1 << p stays in a
    signed 64-bit long in every engine).

    One Arrow hop per image batch; output is (id, ``bits``-bit sig) —
    the join key for hash-bucket image dedup."""
    if not 1 <= bits <= 62:
        # enforce the documented contract: 1 << p must stay inside a
        # signed 64-bit long when Arrow serializes the Python int.
        raise ValueError(f"image_ahash bits must be in [1, 62], got {bits}")
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                arr = decode_image(bytes(p)).astype(np.int64)
                g = arr.reshape(-1, 3).sum(axis=1)
                npix = int(g.size)
                total = int(g.sum())
                sig = 0
                for b in range(bits):
                    if int(g[(b * npix) // bits]) * npix > total:
                        sig |= 1 << b
                ids.append(int(i))
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.select(id_col, "payload").mapInPandas(
        run, f"{id_col} bigint, sig bigint"
    )


def image_channel_stats(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-channel (R/G/B) integer statistics per image, through the
    REAL decoder: decode the payload (PPM/BMP/PNG via decode_image)
    and reduce each channel plane to (min, max, sum, npix) — the
    color-profile feature extraction step of an image-curation
    pipeline (dead channels, clipped exposure, and grayscale-encoded-
    as-RGB all show up here before any model sees the image).

    All-integer outputs, so the reduction is bit-identical in any
    engine that can read the same bytes; one Arrow hop per image
    batch, three rows per image."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chans, mins, maxs, sums, ns = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                arr = decode_image(bytes(p)).reshape(-1, 3).astype(
                    np.int64
                )
                for c in range(3):
                    plane = arr[:, c]
                    ids.append(int(i))
                    chans.append(c)
                    mins.append(int(plane.min()))
                    maxs.append(int(plane.max()))
                    sums.append(int(plane.sum()))
                    ns.append(int(plane.size))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "channel": chans,
                    "cmin": mins,
                    "cmax": maxs,
                    "csum": sums,
                    "npix": ns,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        run,
        f"{id_col} bigint, channel bigint, cmin bigint, cmax bigint,"
        " csum bigint, npix bigint",
    )


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", frames: int = 32
) -> DataFrame:
    """(id, afp) energy-delta audio fingerprint through the REAL WAV
    decoder — the chromaprint idea reduced to its deterministic,
    engine-checkable core: decode the payload, split the (mono) PCM
    stream into ``frames`` equal time slices (sample i lands in frame
    ``i*frames//n`` — the resample-as-index-arithmetic trick
    ``image_ahash`` uses), sum each slice's integer energy (v²), and
    set bit b (MSB-first, b = 0..frames-2) when slice b's energy
    exceeds slice b+1's.  All-integer, so the fingerprint is
    bit-identical in any engine that reads the same bytes; clips
    shorter than ``frames`` samples emit no row (a slice would be
    empty).

    Near-identical clips (same content, small edits) agree on most
    energy deltas — Hamming distance on afp is the audio analog of
    image-ahash distance, and the same banding machinery applies at
    scale.  One Arrow hop per batch, zero shuffles."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                _nch, _rate, samples = decode_wav(bytes(p))
                mono = np.asarray(samples).reshape(len(samples), -1)[
                    :, 0
                ].astype(np.int64)
                n = mono.size
                if n < frames:
                    continue
                idx = (np.arange(n, dtype=np.int64) * frames) // n
                e = np.zeros(frames, dtype=np.int64)
                np.add.at(e, idx, mono * mono)
                fp = 0
                for b in range(frames - 1):
                    if e[b] > e[b + 1]:
                        fp |= 1 << (frames - 2 - b)
                ids.append(int(i))
                fps.append(fp)
            yield pd.DataFrame({id_col: ids, "afp": fps})

    return df.select(id_col, "payload").mapInPandas(
        run, f"{id_col} bigint, afp bigint"
    )
