"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media lives in the lake as an opaque ``binary`` payload column plus a
typed metadata struct — the layout every large multimodal corpus uses
(payload bytes + width/height/duration sidecar). The engine's job at
100 TB is the *plumbing*: schema, partition-friendly operators,
Arrow-batched UDF boundaries. Codec work (JPEG decode, audio resample,
video frame extraction) is a library call per element; the real
decoders (Pillow / soundfile) are import-gated — used when the library
is present, ``NotImplementedError`` when absent (the same optional
pattern as torch in embed.py and ta in rolling.py) — while every
Spark-side surface (schemas, batch shapes, operators) is real and
tested with a deterministic byte-level fake.

Scale notes: metadata projection and frame slicing are pure JVM
expressions (binary ``substring``/``sha2``/``length`` inside
whole-stage codegen — no Python in the hot path); only the feature
extractor crosses into Arrow, batch-at-a-time via ``mapInPandas``,
which is exactly where a torch/PIL decoder would sit on a GPU
executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]

#: bytes per sampled "frame" and stride between frame starts — stands in
#: for (frame pixel buffer, frame interval) of a real video pipeline
FRAME_BYTES = 64
FRAME_STRIDE = 128

FEATURE_DIM = 8


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to a pixel array via Pillow when it is
    importable (the import is inside the call so a worker-side install
    is picked up and tests can inject a stub); otherwise raise
    NotImplementedError — the documented optional-dependency contract
    shared with torch (embed.py) and ta (rolling.py). The
    oracle-checked engine path (byte_histogram_features) never needs
    it."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "Pillow is not installed; use byte_histogram_features() "
            "for the deterministic fake-decode path"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)))


def decode_audio(payload: bytes) -> "np.ndarray":
    """Decode an audio payload to a sample array via soundfile when it
    is importable; otherwise raise NotImplementedError (same optional
    pattern as decode_image)."""
    try:
        import io

        import soundfile
    except ImportError as exc:
        raise NotImplementedError(
            "soundfile is not installed; use byte_histogram_features() "
            "for the deterministic fake-decode path"
        ) from exc
    samples, _rate = soundfile.read(io.BytesIO(payload))
    return np.asarray(samples)


def to_media_table(documents: DataFrame) -> DataFrame:
    """Derive a media-shaped table from the ``documents`` corpus: the
    UTF-8 text bytes stand in for the codec payload. Metadata is a
    typed struct computed from the payload itself, so it is
    deterministic at any scale factor.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    n = F.length(payload)
    return documents.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            n.alias("n_bytes"),
            # fake "dimensions": a real pipeline reads these from the
            # container header; deterministic stand-ins keep the schema
            (n % 640 + 1).alias("width"),
            (n % 480 + 1).alias("height"),
            (n % 48000 + 1).alias("sample_rate"),
        ).alias("meta"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Metadata projection — pure JVM expressions (codegen), the query
    a catalog scan runs over petabytes without touching Python."""
    return media.select(
        "media_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


def frame_sample(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Sample fixed-size "frames" from each video payload — the byte-
    level stand-in for every-Nth-frame extraction. Pure JVM: a
    ``sequence`` of frame offsets exploded per row, then binary
    ``substring``; no shuffle, no Python, output rows stream straight
    out of the scan.
    """
    n = F.col("meta.n_bytes")
    n_frames = F.floor((n - F.lit(frame_bytes)) / F.lit(stride)) + 1
    return (
        media.filter(F.col("media_type") == "video")
        .filter(n >= frame_bytes)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), (n_frames - 1).cast("long"))
            ).alias("frame_no"),
            F.col("payload"),
        )
        .select(
            "media_id",
            "frame_no",
            F.expr(
                f"substring(payload, cast(frame_no * {stride} + 1 as int),"
                f" {frame_bytes})"
            ).alias("frame"),
        )
    )


THUMB_BYTES = 16


def thumbnail(media: DataFrame, out_bytes: int = THUMB_BYTES) -> DataFrame:
    """Byte-stride downsample of each image payload to a fixed
    ``out_bytes`` "thumbnail" — the resize analog at the byte level
    (a real pipeline would decode and bilinear-resample; the stride
    sample keeps the exact operator shape: fixed-size output per item,
    pure JVM substring arithmetic, no Python, no shuffle)."""
    n = F.col("meta.n_bytes")
    step = F.expr(f"meta.n_bytes div {out_bytes}")
    picks = [
        F.expr(
            f"substring(payload, cast(meta.n_bytes div {out_bytes}"
            f" * {i} + 1 as int), 1)"
        )
        for i in range(out_bytes)
    ]
    return (
        media.filter(F.col("media_type") == "image")
        .filter(n >= out_bytes)
        .select(
            "media_id",
            n.alias("n_bytes"),
            (step * 1).alias("stride"),
            F.concat(*picks).alias("thumb"),
        )
    )


AHASH_BANDS = 8
AHASH_BAND_BITS = 8


def ahash_bands(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) of each image payload as 8×8-bit band
    values — the perceptual-hash near-dup key (a real pipeline
    computes it over the decoded 8×8 gray thumbnail; the byte-level
    stand-in keeps the exact operator shape): the payload is
    byte-stride "resized" to 64 cells (cell i = bytes j with
    (j*64) div n = i), bit_i = (cell mean > global mean), evaluated
    as the EXACT integer cross-product s_i·n > S·c_i — no float
    enters the hash. The 64 bits pack into 8 8-bit bands that double
    as the LSH blocking keys: by pigeonhole, any pair at hamming ≤ 7
    shares at least one identical band, so band-equality candidate
    generation is EXHAUSTIVE up to distance 7 and best-effort beyond
    (the standard banded-LSH recall contract). One JVM-only
    projection pass: hex codec + in-row list folds, no Python, no
    shuffle."""
    n = F.col("meta.n_bytes")
    b = (
        media.filter(F.col("media_type") == "image")
        .filter(n >= 1)
        .select(
            "media_id",
            n.alias("n"),
            F.hex(F.col("payload")).alias("hx"),
        )
        .withColumn(
            "bytes",
            F.expr(
                "transform(sequence(0, cast(n - 1 as int)),"
                " j -> cast(conv(substring(hx, 2 * j + 1, 2), 16, 10)"
                " as bigint))"
            ),
        )
        .withColumn(
            "S", F.expr("aggregate(bytes, 0L, (acc, x) -> acc + x)")
        )
        .withColumn(
            "bits",
            F.expr(
                "transform(sequence(0, 63), i -> if("
                " aggregate(slice(bytes, cast(i * n div 64 as int) + 1,"
                "   cast((i + 1) * n div 64 - i * n div 64 as int)),"
                "   0L, (acc, x) -> acc + x) * n"
                " > S * ((i + 1) * n div 64 - i * n div 64),"
                " 1L, 0L))"
            ),
        )
    )
    bands = [
        F.expr(
            f"aggregate(sequence(0, {AHASH_BAND_BITS - 1}), 0L,"
            f" (acc, t) -> acc + bits[{k} * {AHASH_BAND_BITS} + t]"
            f" * shiftleft(1L, t))"
        ).alias(f"band{k}")
        for k in range(AHASH_BANDS)
    ]
    return b.select("media_id", *bands)


def payload_signature(
    media: DataFrame, out_bytes: int = THUMB_BYTES
) -> DataFrame:
    """Per-payload dedup keys for a multimodal corpus, one JVM-only
    projection pass (no Python, no shuffle): the exact content hash
    (sha256) plus the byte-stride signature (the :func:`thumbnail`
    sample as a hex key, computed for EVERY media type) — the
    "tiny-thumbnail hash" first-pass grouping practice for image/video
    dedup: near-identical payloads of equal stride collide on the
    signature even when their full hashes differ. Payloads shorter
    than ``out_bytes`` have no stride sample and are dropped, matching
    :func:`thumbnail`."""
    n = F.col("meta.n_bytes")
    picks = [
        F.expr(
            f"substring(payload, cast(meta.n_bytes div {out_bytes}"
            f" * {i} + 1 as int), 1)"
        )
        for i in range(out_bytes)
    ]
    return media.filter(n >= out_bytes).select(
        "media_id",
        "media_type",
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
        F.hex(F.concat(*picks)).alias("sig"),
    )


def byte_histogram_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake decode: L1-normalized histogram of bytes
    bucketed into ``dim`` classes — the stand-in for a real
    decode→embed step, shaped like one (fixed-dim float vector per
    item)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim)
    # bucket = value * dim // 256 covers [0, 255] for ANY dim <= 256
    # (for dim=8 this is exactly the old `>> 5`)
    hist = np.bincount(arr.astype(np.int64) * dim // 256, minlength=dim)[:dim]
    return hist / arr.size


def decoded_histogram_features(
    payload: bytes, media_type: str, dim: int = FEATURE_DIM
) -> np.ndarray:
    """Feature vector from a REAL decode: images histogram their pixel
    intensities, audio histograms its [-1, 1] samples, anything else
    falls back to the byte histogram. Output shape is identical to the
    fake path so the two are drop-in interchangeable downstream."""
    if media_type == "image":
        px = decode_image(payload).ravel()
        if px.size == 0:
            return np.zeros(dim)
        hist = np.bincount(
            np.clip(px, 0, 255).astype(np.int64) * dim // 256, minlength=dim
        )[:dim]
        return hist / px.size
    if media_type == "audio":
        wav = decode_audio(payload).ravel()
        if wav.size == 0:
            return np.zeros(dim)
        idx = np.clip(((wav + 1.0) / 2.0 * dim).astype(int), 0, dim - 1)
        hist = np.bincount(idx, minlength=dim)[:dim]
        return hist / wav.size
    return byte_histogram_features(payload, dim)


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes
    (``mapInPandas``): the slot where a real pipeline decodes and runs
    a vision/audio encoder per batch on the executor. The default
    deterministic byte-histogram fake keeps the full batch shape
    (iterator-of-DataFrames in, fixed-dim vector column out) testable
    and oracle-checkable; ``decode=True`` routes image/audio payloads
    through the optional real decoders (NotImplementedError per row
    type if the codec library is absent — same schema either way).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode:
                feats = [
                    decoded_histogram_features(p, t, dim).tolist()
                    for p, t in zip(pdf["payload"], pdf["media_type"])
                ]
            else:
                feats = [
                    byte_histogram_features(p, dim).tolist()
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, media_type string, features array<double>"
    )


PHASH_COEFFS = 16  # 4x4 low-frequency block of the 8x8 cell-grid DCT
PHASH_BANDS = 2
PHASH_BAND_BITS = 8
PHASH_MAX_DIST = 1  # pigeonhole: any pair at hamming <= 1 shares a band
# (8-bit bands keep per-band buckets at up to 256 — the aHash band
# width; 4-bit bands were measured to collapse into ~16 buckets and
# Sum(df^2) candidate mass dominated the query at sf0.1)


def phash_dct_weights() -> list:
    """Orthonormal 2D DCT-II weights for the 4x4 low-frequency block
    over the 8x8 cell grid, as plain-float literals (plan-build-time
    constants, identical in the Spark expression and the DuckDB
    oracle). Entry [c][i]: coefficient index c = 4u+v, cell index
    i = 8x+y."""
    import math

    ws = []
    for u in range(4):
        for v in range(4):
            au = math.sqrt(1.0 / 8.0) if u == 0 else math.sqrt(2.0 / 8.0)
            av = math.sqrt(1.0 / 8.0) if v == 0 else math.sqrt(2.0 / 8.0)
            row = []
            for x in range(8):
                for y in range(8):
                    row.append(
                        au
                        * av
                        * math.cos((2 * x + 1) * u * math.pi / 16.0)
                        * math.cos((2 * y + 1) * v * math.pi / 16.0)
                    )
            ws.append(row)
    return ws


def phash16_bands(media: DataFrame) -> DataFrame:
    """Perceptual DCT hash (pHash) of each image payload as 2 8-bit
    band values — the frequency-domain sibling of :func:`ahash_bands`
    (aHash flips on local brightness; pHash thresholds low-frequency
    DCT coefficients, so it survives uniform brightness/contrast
    shifts that flip aHash bits). Same byte-stride 8x8 cell grid as
    aHash, but the FLOAT cell means feed 16 fixed-literal DCT chains
    (left-associated 64-term sums — bitwise identical cross-engine);
    each coefficient bits against the median of the 15 non-DC
    coefficients (the classic pHash threshold; DC joins the bit
    vector and lands above the median by construction). The
    PHASH_BANDS = 2 8-bit bands double as LSH blocking keys: any pair
    at hamming <= PHASH_MAX_DIST = 1 shares an identical band
    (pigeonhole over 2 bands), so banded candidate generation is
    exhaustive at the query threshold. One JVM projection pass — no
    Python, no shuffle."""
    n = F.col("meta.n_bytes")
    b = (
        media.filter(F.col("media_type") == "image")
        .filter(n >= 1)
        .select(
            "media_id",
            n.alias("n"),
            F.hex(F.col("payload")).alias("hx"),
        )
        # cell sums fold DIRECTLY over each cell's hex range (one
        # O(n) pass total) instead of materializing an n-element byte
        # array first: the intermediate array invited a 64x
        # CollapseProject inlining blowup under interpreted eval and
        # cost a multi-hundred-MB barrier to pin
        .withColumn(
            "cells",
            F.expr(
                "transform(sequence(0, 63), i -> if("
                " (i + 1) * n div 64 - i * n div 64 > 0,"
                " cast(aggregate("
                "   sequence(cast(i * n div 64 as int),"
                "            cast((i + 1) * n div 64 as int) - 1),"
                "   0L, (acc, j) ->"
                "   acc + cast(conv(substring(hx, 2 * j + 1, 2), 16, 10)"
                "   as bigint)) as double)"
                " / cast((i + 1) * n div 64 - i * n div 64 as double),"
                " cast(0.0 as double)))"
            ),
        )
    )
    # pin the cell frame BEFORE the 16 coefficient chains reference
    # it: CollapseProject would otherwise substitute the cell-fold
    # expression into every one of the 1024 chain terms — measured 93s
    # vs seconds at sf0.1. The frame is tiny (media_id + 64 doubles
    # per image), so spreading it is a negligible shuffle, and the
    # 16x64-node interpreted chains (HOF results never enter codegen)
    # then run across the cluster instead of one inherited file-split
    # partition.
    b = b.select("media_id", "cells").localCheckpoint(eager=True)
    ws = phash_dct_weights()
    coeffs = []
    for c, row in enumerate(ws):
        expr = None
        for i, w in enumerate(row):
            term = F.element_at("cells", i + 1) * F.lit(w)
            expr = term if expr is None else expr + term
        coeffs.append(expr.alias(f"c{c}"))
    b = b.select("media_id", *coeffs)
    med = F.element_at(
        F.array_sort(F.array(*[F.col(f"c{c}") for c in range(1, 16)])), 8
    )
    b = b.withColumn("med", med)
    bands = []
    for k in range(PHASH_BANDS):
        expr = None
        for t in range(PHASH_BAND_BITS):
            c = k * PHASH_BAND_BITS + t
            bit = (F.col(f"c{c}") > F.col("med")).cast("long") * F.lit(
                1 << t
            )
            expr = bit if expr is None else expr + bit
        bands.append(expr.alias(f"band{k}"))
    return b.select("media_id", *bands)
