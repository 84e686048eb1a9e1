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


def test_real_ppm_codec_roundtrip(spark):
    """The numpy PPM (P6) codec is a REAL decode path: encode -> decode is
    exact, extracted brightness equals the true pixel mean, and
    resize_pixels produces a decodable payload with the resampled
    geometry."""
    import numpy as np

    from uncharted_ta1_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
        extract_features,
        resize_pixels,
        synth_ppm_media,
    )

    # pure codec round-trip, including header comments
    arr = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    assert (_decode_ppm(_encode_ppm(arr)) == arr).all()
    commented = b"P6\n# a comment\n4 5\n255\n" + arr.tobytes()
    assert (_decode_ppm(commented) == arr).all()

    m = synth_ppm_media(spark, n=24).cache()
    pdf = m.toPandas().sort_values("media_id")
    # every payload is a well-formed P6 of the declared geometry
    for _, row in pdf.iterrows():
        a = _decode_ppm(bytes(row.payload))
        assert a.shape == (row.meta["height"], row.meta["width"], 3)

    feats = extract_features(m, decode_backend="ppm").toPandas().sort_values("media_id")
    for (_, row), (_, f) in zip(pdf.iterrows(), feats.iterrows()):
        a = _decode_ppm(bytes(row.payload))
        assert f.fake_brightness == round(float(np.mean(a)) / 255.0, 6)

    r = resize_pixels(m, max_dim=16).toPandas().sort_values("media_id")
    assert len(r) == 24
    for _, row in r.iterrows():
        a = _decode_ppm(bytes(row.payload))
        assert a.shape == (row.out_height, row.out_width, 3)
        assert max(row.out_width, row.out_height) <= 16
