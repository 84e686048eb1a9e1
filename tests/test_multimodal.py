"""Multimodal column plumbing: schema, Arrow batching, deterministic fake
decode, stubbed real backend."""

from __future__ import annotations

import pytest


def test_media_pipeline(spark):
    from uncharted_ta1_pipeline_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        resize,
        synth_media,
    )

    m = synth_media(spark, n=30)
    assert m.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(m).toPandas().sort_values("media_id")
    assert len(feats) == 30
    assert (feats["n_bytes"] == 128).all()  # 8 * 32 hex chars -> 128 bytes
    assert feats["fake_brightness"].between(0, 1).all()

    # determinism across runs (fake decode is content-derived)
    feats2 = extract_features(m).toPandas().sort_values("media_id")
    assert feats.reset_index(drop=True).equals(feats2.reset_index(drop=True))

    r = resize(m, max_dim=128).toPandas()
    assert (r[["out_width", "out_height"]].max(axis=1) <= 128).all()
    assert (r[["out_width", "out_height"]].min(axis=1) >= 1).all()

    fs = frame_sample(m, every_ms=5000).toPandas()
    assert (fs["frame_ts_ms"] % 5000 == 0).all()
    assert fs.groupby("media_id").size().min() >= 1

    with pytest.raises(NotImplementedError):
        extract_features(m, decode_backend="real")
