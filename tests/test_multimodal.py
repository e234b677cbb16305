"""Multimodal decode plumbing: vectorized fake decode determinism, byte
counting, null payloads, and the honest NotImplementedError without fake."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# Real WAV codec
# ---------------------------------------------------------------------------

def _sine_pcm16(freq=440.0, sr=8000, n=8000, amp=0.5):
    import numpy as np

    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def test_wav_roundtrip_sine_features():
    import numpy as np

    from contest_parsing_ray.stages.multimodal import decode_wav, encode_wav_pcm16

    s = _sine_pcm16(freq=440.0, sr=8000, n=8000, amp=0.5)
    meta, x = decode_wav(encode_wav_pcm16(s, 8000))
    assert meta["sample_rate"] == 8000 and meta["n_channels"] == 1
    assert len(x) == 8000
    np.testing.assert_allclose(x, s / 32768.0, atol=1e-12)
    # a 0.5-amplitude sine has RMS ~ 0.5/sqrt(2)
    assert abs(float(np.sqrt(np.mean(x * x))) - 0.5 / np.sqrt(2)) < 0.01


def test_wav_multichannel_and_extra_chunks():
    import struct

    import numpy as np

    from contest_parsing_ray.stages.multimodal import decode_wav, encode_wav_pcm16

    stereo = np.stack([_sine_pcm16(n=100), _sine_pcm16(n=100)], axis=1)
    payload = encode_wav_pcm16(stereo, 16000)
    meta, x = decode_wav(payload)
    assert meta["n_channels"] == 2 and len(x) == 100
    # inject an unknown chunk between WAVE and fmt — parser must skip it
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # odd size+pad
    patched = payload[:12] + junk + payload[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    meta2, x2 = decode_wav(patched)
    np.testing.assert_array_equal(x, x2)


def test_wav_rejects_garbage():
    import pytest

    from contest_parsing_ray.stages.multimodal import decode_wav

    for bad in (b"", b"RIFFxxxx", b"RIFF\x10\x00\x00\x00WAVE"):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_wav_decode_stage_and_batching_invariance():
    import numpy as np
    import pandas as pd
    import ray.data

    from contest_parsing_ray.stages.multimodal import (
        decode_wav_features,
        synth_wav_payloads,
    )
    import pyarrow as pa

    ids = pa.array([f"doc-{i}" for i in range(50)])
    payloads = synth_wav_payloads(ids)
    media = pd.DataFrame(
        {"doc_id": ids.to_pylist(), "payload": payloads,
         "media_type": "audio/wav"}
    )
    got = {}
    for bs in (7, 50):
        out = (
            decode_wav_features(
                ray.data.from_pandas(media), concurrency=2, batch_size=bs
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        got[bs] = out
    pd.testing.assert_frame_equal(got[7], got[50])
    out = got[50]
    assert set(out["sample_rate"]) <= {8000, 16000}
    assert (out["n_samples"] >= 400).all()
    assert (out["rms"] > 0).all() and (out["peak"] <= 1.0).all()
    # strict=False on a corrupted payload -> null row, others intact
    media.loc[0, "payload"] = b"not a wav"
    lax = (
        decode_wav_features(
            ray.data.from_pandas(media), strict=False, concurrency=1,
            batch_size=50,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert np.isnan(lax.loc[0, "rms"]) and not np.isnan(lax.loc[1, "rms"])


def test_png_roundtrip_all_filters():
    """encode_png(filter_type=f) -> decode_png recovers exact pixels for
    every scanline filter (0..4) and every channel count (1/2/3/4)."""
    from contest_parsing_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        for ft in range(5):
            payload = encode_png(px[:, :, 0] if c == 1 else px, filter_type=ft)
            meta, dec = decode_png(payload)
            assert (meta["width"], meta["height"], meta["n_channels"]) == (9, 13, c)
            assert np.array_equal(dec, px)


def test_png_rejects_garbage():
    import zlib

    from contest_parsing_ray.stages.multimodal import decode_png, encode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + b"\x00" * 40)
    good = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    good[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    # truncated IDAT stream
    t = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises((ValueError, zlib.error)):
        decode_png(t[:40])


def test_png_decode_stage_and_batching_invariance():
    from contest_parsing_ray.stages.multimodal import (
        decode_png,
        decode_png_features,
        synth_png_payloads,
    )

    ids = pa.array([f"doc-{i}" for i in range(40)])
    payloads = synth_png_payloads(ids)
    # the synthetic corpus must exercise every filter type and channel count
    metas = [decode_png(p)[0] for p in payloads]
    assert {m["n_channels"] for m in metas} == {1, 2, 3, 4}
    media = pd.DataFrame(
        {"doc_id": ids.to_pylist(), "payload": payloads,
         "media_type": "image/png"}
    )
    got = {}
    for bs in (7, 40):
        out = (
            decode_png_features(
                ray.data.from_pandas(media), concurrency=2, batch_size=bs
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        got[bs] = out
    pd.testing.assert_frame_equal(got[7], got[40])
    out = got[40]
    assert (out["width"] >= 8).all() and (out["height"] >= 8).all()
    assert (out["max_px"] <= 255).all() and (out["std_px"] > 0).all()
    # features match a direct decode of the same payloads
    m0, px0 = decode_png(payloads[0])
    row0 = out[out["doc_id"] == "doc-0"].iloc[0]
    assert row0["width"] == m0["width"] and row0["height"] == m0["height"]
    np.testing.assert_allclose(row0["mean_px"], px0.astype(np.float64).mean())
    # strict=False on a corrupted payload -> null row, others intact
    media.loc[0, "payload"] = b"not a png"
    lax = (
        decode_png_features(
            ray.data.from_pandas(media), strict=False, concurrency=1,
            batch_size=40,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert np.isnan(lax.loc[0, "mean_px"]) and not np.isnan(lax.loc[1, "mean_px"])
