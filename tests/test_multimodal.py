"""Multimodal decode plumbing: vectorized fake decode determinism, byte
counting, null payloads, and the honest NotImplementedError without fake."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from contest_parsing_ray.stages.multimodal import FEATURE_DIM, DecodeStub, decode_features


def _media_table():
    return pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "payload": [b"hello", b"hello", b"", None],
            "media_type": ["text/plain"] * 4,
        }
    )


def test_fake_decode_vectorized_and_deterministic():
    out1 = DecodeStub(fake=True)(_media_table())
    out2 = DecodeStub(fake=True)(_media_table())
    assert out1["n_bytes"].to_pylist() == [5, 5, 0, 0]
    f1 = np.asarray(out1["features"].to_pylist())
    f2 = np.asarray(out2["features"].to_pylist())
    assert f1.shape == (4, FEATURE_DIM)
    np.testing.assert_array_equal(f1, f2)
    # identical payloads -> identical features; distinct payloads differ
    np.testing.assert_array_equal(f1[0], f1[1])
    assert not np.array_equal(f1[0], f1[2])
    assert np.isfinite(f1).all() and (f1 >= 0).all() and (f1 <= 1).all()
    assert "payload" not in out1.column_names


def test_decode_without_fake_raises():
    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)(_media_table())


def test_decode_features_dataset():
    ds = ray.data.from_arrow(_media_table())
    out = decode_features(ds, fake=True, concurrency=2, batch_size=2).to_pandas()
    assert len(out) == 4
    assert set(out.columns) >= {"doc_id", "media_type", "n_bytes", "features"}
