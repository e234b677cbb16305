"""Multimodal (image/audio/video) column plumbing.

Build-brief operator: binary payload columns with typed metadata, decoded /
feature-extracted by actor-pool ``map_batches`` stages. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode kernel is
STUBBED: ``DecodeStub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the payload bytes. Everything around the kernel — schema,
batch sizing for large binary rows, actor signature, output layout — is
real and tested.

Schema convention:

    payload: binary           -- opaque media bytes
    media_type: string        -- "image/png", "audio/wav", ...
    meta_width/meta_height or meta_sample_rate: int32 (nullable)

Large binary rows need SMALL batch sizes so batch x concurrency fits the
worker heap (see the memory-aware sizing note in the build brief);
``decode_features`` defaults to batch_size=32.
"""

from __future__ import annotations

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
