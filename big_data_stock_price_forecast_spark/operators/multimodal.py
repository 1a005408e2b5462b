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


def _cell_sums(payload: bytes) -> tuple["np.ndarray", "np.ndarray", int]:
    """(per-cell byte sums int64[64], per-cell counts int64[64], total)
    for the byte-stride 8x8 cell grid: cell i covers byte indices
    [i*n div 64, (i+1)*n div 64). Exact integer arithmetic — identical
    to the SQL fold regardless of evaluation order."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = arr.size
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(arr, out=cs[1:])
    b = (np.arange(65, dtype=np.int64) * n) // 64
    sums = cs[b[1:]] - cs[b[:-1]]
    counts = b[1:] - b[:-1]
    return sums, counts, int(cs[n])


def ahash_bands(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) of each image payload as 8×8-bit band
    values — the perceptual-hash near-dup key (a real pipeline
    computes it over the decoded 8×8 gray thumbnail; the byte-level
    stand-in keeps the exact operator shape): the payload is
    byte-stride "resized" to 64 cells (cell i = bytes j with
    i*n div 64 <= j < (i+1)*n div 64), bit_i = (cell mean > global
    mean), evaluated as the EXACT integer cross-product
    s_i·n > S·c_i — no float enters the hash. The 64 bits pack into 8
    8-bit bands that double as the LSH blocking keys: by pigeonhole,
    any pair at hamming ≤ 7 shares at least one identical band, so
    band-equality candidate generation is EXHAUSTIVE up to distance 7
    and best-effort beyond (the standard banded-LSH recall contract).

    One ``mapInArrow`` pass over (media_id, payload): the per-byte
    work runs vectorized in NumPy (guide §4.2) — the previous
    JVM-expression form decoded the payload through
    ``conv(substring(hex(payload)))`` one byte at a time inside
    interpreted higher-order folds, which was the dominant cost of
    both near-dup queries. Integer sums are order-free, so the hash
    is bit-identical to the fold (pinned by tests/test_round12_ops
    and the DuckDB oracle)."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        out_names = ["media_id"] + [f"band{k}" for k in range(AHASH_BANDS)]
        for batch in batches:
            ids = batch.column("media_id")
            pays = batch.column("payload")
            n_rows = batch.num_rows
            bands = np.zeros((n_rows, AHASH_BANDS), dtype=np.int64)
            for r in range(n_rows):
                sums, counts, total = _cell_sums(pays[r].as_py())
                n = int(counts.sum())
                bits = (sums * n > total * counts).astype(np.int64)
                packed = bits.reshape(AHASH_BANDS, AHASH_BAND_BITS) << (
                    np.arange(AHASH_BAND_BITS, dtype=np.int64)
                )
                bands[r] = packed.sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(bands[:, k]) for k in range(AHASH_BANDS)],
                names=out_names,
            )

    schema = "media_id long, " + ", ".join(
        f"band{k} long" for k in range(AHASH_BANDS)
    )
    return (
        media.filter(F.col("media_type") == "image")
        .filter(F.col("meta.n_bytes") >= 1)
        .select("media_id", "payload")
        .mapInArrow(run, schema=schema)
    )


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
    exhaustive at the query threshold.

    One ``mapInArrow`` pass over (media_id, payload), like
    :func:`ahash_bands` (guide §4.2). Bit-parity with the oracle's
    unrolled SQL: the cell means are exact-integer sums divided once
    (order-free), and each DCT coefficient accumulates its 64 terms
    in the same left-associated order as the SQL chain — one IEEE
    mul+add per term, vectorized ACROSS images, sequential WITHIN the
    chain — so every double is bitwise identical. The previous
    JVM-expression form paid an O(n_bytes) interpreted
    ``conv(substring(hex))`` fold per image plus a 16×64-term
    projection whose generated class failed janino compilation
    (observed ``ERROR CodeGenerator`` → interpreted fallback) and a
    localCheckpoint barrier; all three are gone."""
    import pyarrow as pa

    ws_t = np.ascontiguousarray(
        np.array(phash_dct_weights(), dtype=np.float64).T
    )  # [i, c]: cell index i -> coefficient c

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        out_names = ["media_id"] + [f"band{k}" for k in range(PHASH_BANDS)]
        for batch in batches:
            ids = batch.column("media_id")
            pays = batch.column("payload")
            n_rows = batch.num_rows
            cells = np.zeros((n_rows, 64), dtype=np.float64)
            for r in range(n_rows):
                sums, counts, _total = _cell_sums(pays[r].as_py())
                nz = counts > 0
                cells[r, nz] = sums[nz].astype(np.float64) / counts[
                    nz
                ].astype(np.float64)
            # left-assoc 64-term chains, identical fold order to the
            # SQL: one vectorized mul+add per term across all rows
            coeffs = cells[:, 0:1] * ws_t[0]
            for i in range(1, 64):
                coeffs += cells[:, i : i + 1] * ws_t[i]
            med = np.sort(coeffs[:, 1:16], axis=1)[:, 7]
            bits = (coeffs > med[:, None]).astype(np.int64)
            bands = np.zeros((n_rows, PHASH_BANDS), dtype=np.int64)
            for k in range(PHASH_BANDS):
                sl = bits[:, k * PHASH_BAND_BITS : (k + 1) * PHASH_BAND_BITS]
                bands[:, k] = (
                    sl << np.arange(PHASH_BAND_BITS, dtype=np.int64)
                ).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(bands[:, k]) for k in range(PHASH_BANDS)],
                names=out_names,
            )

    schema = "media_id long, " + ", ".join(
        f"band{k} long" for k in range(PHASH_BANDS)
    )
    return (
        media.filter(F.col("media_type") == "image")
        .filter(F.col("meta.n_bytes") >= 1)
        .select("media_id", "payload")
        .mapInArrow(run, schema=schema)
    )
