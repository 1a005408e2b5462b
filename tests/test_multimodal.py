"""Multimodal binary-column plumbing: opaque payload + typed metadata,
JVM-native frame slicing, Arrow-batched fake-decode features."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_BYTES,
    FRAME_STRIDE,
    byte_histogram_features,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    media_meta,
    to_media_table,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_real_decoders_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_media_table_schema_and_meta(spark):
    docs = load_table(spark, SF, "documents")
    media = to_media_table(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.schema["meta"].dataType.fieldNames() == [
        "n_bytes", "width", "height", "sample_rate",
    ]
    row = (
        media.join(docs, media.media_id == docs.doc_id)
        .select("media_id", "payload", "meta", "text")
        .first()
    )
    raw = row["text"].encode("utf-8")
    assert bytes(row["payload"]) == raw
    assert row["meta"]["n_bytes"] == len(raw)

    m = media_meta(media).first()
    assert len(m["payload_sha"]) == 64


def test_media_meta_sha_matches_hashlib(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    got = {
        r["media_id"]: r["payload_sha"]
        for r in media_meta(to_media_table(docs)).collect()
    }
    for r in docs.collect():
        expect = hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
        assert got[r["doc_id"]] == expect


def test_frame_sample_slices_bytes(spark):
    docs = load_table(spark, SF, "documents")
    media = to_media_table(docs)
    frames = frame_sample(media).collect()
    assert frames, "expected at least one video with a full frame"
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("media_type") == "video").collect()
    }
    seen = set()
    for r in frames:
        start = r["frame_no"] * FRAME_STRIDE
        assert (
            bytes(r["frame"]) == payloads[r["media_id"]][start : start + FRAME_BYTES]
        )
        seen.add(r["media_id"])
    # every video long enough for one frame is represented
    expect_ids = {m for m, p in payloads.items() if len(p) >= FRAME_BYTES}
    assert seen == expect_ids


def test_frame_sample_is_pure_jvm(spark):
    """No Python/Arrow stage in the frame plan — decode-free slicing
    must stay in codegen at 100 TB."""
    plan = frame_sample(to_media_table(load_table(spark, SF, "documents")))
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in explained and "ArrowEval" not in explained


def test_byte_features_match_numpy(spark):
    docs = load_table(spark, SF, "documents").limit(8)
    media = to_media_table(docs)
    feats = {
        r["media_id"]: np.array(r["features"])
        for r in extract_features(media).collect()
    }
    for r in media.collect():
        expect = byte_histogram_features(bytes(r["payload"]))
        np.testing.assert_allclose(feats[r["media_id"]], expect, atol=1e-12)
        assert len(feats[r["media_id"]]) == FEATURE_DIM
        assert abs(feats[r["media_id"]].sum() - 1.0) < 1e-9


def test_real_decoders_optional_contract(monkeypatch):
    """Without Pillow/soundfile the decode slots raise
    NotImplementedError (never a bare ImportError); with the library
    importable, decode_image/decode_audio dispatch into it and
    decoded_histogram_features keeps the fake path's shape contract."""
    import importlib
    import sys

    from big_data_stock_price_forecast_spark.operators import multimodal as M

    have_pil = importlib.util.find_spec("PIL") is not None
    have_sf = importlib.util.find_spec("soundfile") is not None

    if not have_pil:
        try:
            M.decode_image(b"\x00\x01")
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass
    if not have_sf:
        try:
            M.decode_audio(b"\x00\x01")
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass

    # inject stub codec modules: dispatch + feature shape are ours to
    # test; the pixels/samples come from whatever library is present
    class _FakeImg:
        def __init__(self, payload):
            self._p = payload

        def __array__(self, dtype=None, copy=None):
            return np.frombuffer(self._p, dtype=np.uint8).reshape(-1, 2)

    fake_pil_image = type(sys)("PIL.Image")
    fake_pil_image.open = lambda buf: _FakeImg(buf.read())
    fake_pil = type(sys)("PIL")
    fake_pil.Image = fake_pil_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil_image)

    fake_sf = type(sys)("soundfile")
    fake_sf.read = lambda buf: (
        np.frombuffer(buf.read(), dtype=np.uint8) / 255.0 * 2.0 - 1.0,
        16000,
    )
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)

    payload = bytes(range(64)) * 2
    img = M.decode_image(payload)
    assert img.shape == (64, 2)
    wav = M.decode_audio(payload)
    assert wav.min() >= -1.0 and wav.max() <= 1.0

    for mt in ["image", "audio", "video"]:
        f = M.decoded_histogram_features(payload, mt)
        assert f.shape == (M.FEATURE_DIM,)
        assert abs(f.sum() - 1.0) < 1e-9
    # video falls back to the byte histogram == fake path
    np.testing.assert_allclose(
        M.decoded_histogram_features(payload, "video"),
        M.byte_histogram_features(payload),
    )


def test_payload_signature_dup_groups(spark):
    """media_dup_groups contract on planted payloads: exact duplicates
    share signature AND sha (n_payloads=1); near-duplicates differing
    only at a non-sampled byte share the stride signature but not the
    sha (n_payloads=2); unique and sub-16-byte payloads emit no
    group. All planted ids are = 0 mod 3 so they land in one media
    type."""
    from pyspark.sql import Row, functions as F

    from big_data_stock_price_forecast_spark.operators.multimodal import (
        payload_signature,
        to_media_table,
    )

    base = "abcdefghijklmnopqrstuvwxyzABCDEF"  # 32 chars -> stride 2
    near = base[0] + "#" + base[2:]  # position 2 (1-based) is unsampled
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="A" * 32),
            Row(doc_id=3, text="A" * 32),   # exact dup of 0
            Row(doc_id=6, text=base),
            Row(doc_id=9, text=near),       # near dup of 6
            Row(doc_id=12, text="B" * 32),  # unique
            Row(doc_id=15, text="short"),   # < 16 bytes: dropped
        ]
    )
    sig = payload_signature(to_media_table(docs))
    assert sig.filter(F.col("media_id") == 15).count() == 0
    groups = (
        sig.groupBy("media_type", "sig")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("media_id").alias("canonical_id"),
            F.count_distinct("payload_sha").alias("n_payloads"),
        )
        .filter(F.col("n_items") >= 2)
        .collect()
    )
    got = sorted(
        (r["canonical_id"], r["n_items"], r["n_payloads"]) for r in groups
    )
    assert got == [(0, 2, 1), (6, 2, 2)]
    assert all(r["media_type"] == "image" for r in groups)
