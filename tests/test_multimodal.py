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
