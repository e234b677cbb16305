"""Multimodal (image/audio/video) column plumbing + a REAL WAV codec.

Build-brief operator: binary payload columns with typed metadata, decoded /
feature-extracted by actor-pool ``map_batches`` stages.

Two decode kernels:

- ``WavDecode`` — a REAL RIFF/PCM WAV parser (stdlib ``struct`` + numpy,
  no external codec): parses fmt/data chunks, decodes PCM8/PCM16/PCM32/
  float32 samples, and emits audio features (duration, RMS, peak,
  zero-crossing rate, DC mean) computed from the actual decoded samples.
- ``DecodeStub`` — image/video codecs (PIL/ffmpeg) are NOT in this
  container, so their kernel stays STUBBED: raises ``NotImplementedError``
  unless ``fake=True`` (deterministic fake features from payload bytes).
  The plumbing — schema, batch sizing for large binary rows, actor
  signature, output layout — is real and tested.

Schema convention:

    payload: binary           -- opaque media bytes
    media_type: string        -- "image/png", "audio/wav", ...
    meta_width/meta_height or meta_sample_rate: int32 (nullable)

Large binary rows need SMALL batch sizes so batch x concurrency fits the
worker heap (see the memory-aware sizing note in the build brief);
``decode_features`` defaults to batch_size=32.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from ._shuffle import _splitmix64

FEATURE_DIM = 8


class DecodeStub:
    """Actor-pool decode stage. Real decoders slot in by replacing
    ``_decode_batch`` (model/codec loaded once per actor in __init__)."""

    def __init__(self, payload_col: str = "payload", fake: bool = False):
        self.payload_col = payload_col
        self.fake = fake
        # real impl: self.codec = load_codec(); here: nothing to load

    def _decode_batch(self, payloads: pa.Array) -> np.ndarray:
        """(n, FEATURE_DIM) float32 features — deterministic fake, computed
        buffer-level over the whole batch (no per-row Python)."""
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct DecodeStub(fake=True) for the deterministic stub"
            )
        from ._shuffle import hash64_strings

        row_hash = hash64_strings(payloads)  # one pass over the raw buffer
        with np.errstate(over="ignore"):
            seeds = row_hash[:, None] * (
                np.arange(1, FEATURE_DIM + 1, dtype=np.uint64)[None, :]
            )
            feats = _splitmix64(seeds.ravel()).reshape(-1, FEATURE_DIM)
        return (feats.astype(np.float64) / float(2**64)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col].combine_chunks()
        col = col.cast(pa.large_binary())
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset : col.offset + len(col) + 1
        ]
        n_bytes = np.diff(offs)
        feats = self._decode_batch(col)
        batch = batch.drop_columns([self.payload_col])  # decoded: payload dropped
        batch = batch.append_column("n_bytes", pa.array(n_bytes, type=pa.int64()))
        batch = batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
            ),
        )
        return batch


def decode_features(
    media: ray.data.Dataset,
    payload_col: str = "payload",
    fake: bool = False,
    concurrency: int = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """media(payload, media_type, meta_*) → (media_type, meta_*, n_bytes,
    features: fixed_size_list<float32>[8])."""
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"payload_col": payload_col, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM): the one codec implementable from the published container
# format alone — stdlib struct for the chunk headers, numpy for the samples.
# Format reference: the public RIFF/WAVE spec (fmt chunk layout, PCM data).
# ---------------------------------------------------------------------------

_WAV_FORMATS = {1: "pcm", 3: "float"}  # WAVE_FORMAT_PCM / IEEE_FLOAT


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """Minimal RIFF/PCM16 writer (test + synthetic-corpus helper).

    ``samples``: int16 array, shape (n,) or (n, n_channels), interleaved on
    write as the spec requires."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1 and n_channels > 1:
        raise ValueError("multi-channel samples must be (n, ch)")
    if s.ndim == 2:
        n_channels = s.shape[1]
    data = s.reshape(-1).tobytes()
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[dict, np.ndarray]:
    """RIFF/WAVE → (meta, mono float64 samples in [-1, 1]).

    Walks the chunk list (skipping LIST/fact/etc., honoring the odd-size
    pad byte), reads fmt, and decodes the data chunk with ONE
    ``np.frombuffer`` view — the per-byte work is all numpy. Multi-channel
    audio is averaged to mono for the feature set."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt_meta: dict | None = None
    data: bytes | None = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            af, ch, sr, br, ba, bps = struct.unpack("<HHIIHH", body[:16])
            if af == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                af = struct.unpack("<H", body[24:26])[0]
            fmt_meta = {
                "audio_format": af, "n_channels": ch, "sample_rate": sr,
                "bits_per_sample": bps,
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_meta is None or data is None:
        raise ValueError("missing fmt or data chunk")
    af = fmt_meta["audio_format"]
    bps = fmt_meta["bits_per_sample"]
    if _WAV_FORMATS.get(af) == "float" and bps == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif af == 1 and bps == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif af == 1 and bps == 8:  # PCM8 is unsigned, biased at 128
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif af == 1 and bps == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(
            f"unsupported WAV encoding: format={af} bits={bps}"
        )
    ch = max(1, fmt_meta["n_channels"])
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return fmt_meta, x


class WavDecode:
    """Actor-pool WAV decode + feature stage. Per-row chunk-header parsing
    is unavoidable (RIFF is a per-blob container), but all sample math is
    numpy over the data-chunk buffer. Output columns: sample_rate,
    n_channels, n_samples, duration_s, rms, peak, zcr, dc_mean."""

    def __init__(self, payload_col: str = "payload", strict: bool = True):
        self.payload_col = payload_col
        self.strict = strict  # False: bad payloads yield null features

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col].combine_chunks()
        n = len(col)
        sr = np.zeros(n, dtype=np.int32)
        ch = np.zeros(n, dtype=np.int32)
        ns = np.zeros(n, dtype=np.int64)
        feats = np.full((n, 4), np.nan)  # rms, peak, zcr, dc_mean
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            payload = col[i].as_py()
            try:
                meta, x = decode_wav(payload)
            except ValueError:
                if self.strict:
                    raise
                ok[i] = False
                continue
            sr[i], ch[i], ns[i] = (
                meta["sample_rate"], meta["n_channels"], len(x)
            )
            if len(x):
                feats[i, 0] = float(np.sqrt(np.mean(x * x)))
                feats[i, 1] = float(np.abs(x).max())
                feats[i, 2] = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1 else 0.0
                )
                feats[i, 3] = float(x.mean())
        batch = batch.drop_columns([self.payload_col])
        dur = np.divide(
            ns, sr, out=np.zeros(n, dtype=np.float64), where=sr > 0
        )
        cols = {
            "sample_rate": pa.array(sr, mask=~ok),
            "n_channels": pa.array(ch, mask=~ok),
            "n_samples": pa.array(ns, mask=~ok),
            "duration_s": pa.array(dur, mask=~ok),
            "rms": pa.array(feats[:, 0], mask=~ok),
            "peak": pa.array(feats[:, 1], mask=~ok),
            "zcr": pa.array(feats[:, 2], mask=~ok),
            "dc_mean": pa.array(feats[:, 3], mask=~ok),
        }
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def decode_wav_features(
    media: ray.data.Dataset,
    payload_col: str = "payload",
    strict: bool = True,
    concurrency: int = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """media(payload=WAV bytes, ...) → per-row audio features decoded from
    the REAL samples (see :class:`WavDecode`)."""
    return media.map_batches(
        WavDecode,
        fn_constructor_kwargs={"payload_col": payload_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def synth_wav_payloads(doc_ids: pa.Array | pa.ChunkedArray) -> list[bytes]:
    """Deterministic per-doc WAV payloads (sine + harmonic, parameters a
    pure function of the doc_id hash) — the test/bench corpus generator;
    no external audio data needed."""
    from ._shuffle import hash64_strings

    h = hash64_strings(doc_ids)
    out: list[bytes] = []
    for hv in h:
        hv = int(hv)
        sr = 8000 if hv % 2 else 16000
        n = 400 + (hv >> 8) % 1200
        freq = 110.0 + (hv >> 16) % 3200 / 4.0
        amp = 0.2 + ((hv >> 32) % 700) / 1000.0
        t = np.arange(n, dtype=np.float64) / sr
        x = amp * np.sin(2 * np.pi * freq * t)
        x += 0.25 * amp * np.sin(2 * np.pi * 2 * freq * t)
        out.append(
            encode_wav_pcm16(
                np.clip(x * 32767.0, -32768, 32767).astype(np.int16), sr
            )
        )
    return out
