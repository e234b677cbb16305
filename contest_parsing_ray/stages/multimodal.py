"""Multimodal (image/audio/video) column plumbing + REAL WAV and PNG codecs.

Build-brief operator: binary payload columns with typed metadata, decoded /
feature-extracted by actor-pool ``map_batches`` stages.

Three decode kernels:

- ``WavDecode`` — a REAL RIFF/PCM WAV parser (stdlib ``struct`` + numpy,
  no external codec): parses fmt/data chunks, decodes PCM8/PCM16/PCM32/
  float32 samples, and emits audio features (duration, RMS, peak,
  zero-crossing rate, DC mean) computed from the actual decoded samples.
- ``PngDecode`` — a REAL PNG decoder (stdlib ``zlib`` + numpy
  unfiltering, all five scanline filters): emits image features
  (dimensions, channels, pixel mean/std/min/max) from the decoded pixels.
- ``DecodeStub`` — JPEG/video codecs (PIL/ffmpeg) are NOT in this
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


# ---------------------------------------------------------------------------
# PNG: the second real codec — stdlib ``zlib`` for the DEFLATE stream, numpy
# for unfiltering. Format reference: the public PNG spec (RFC 2083 / W3C
# PNG): 8-byte signature, length-type-data-crc chunks, IHDR/IDAT/IEND,
# per-scanline filter byte (None/Sub/Up/Average/Paeth).
# Supported: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
# 6 (RGBA), no interlace — the shapes a training-data pipeline normalizes
# to anyway; everything else raises (or nulls, strict=False).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (test + synthetic-corpus helper).

    ``arr``: uint8, (h, w) gray or (h, w, {2,3,4}) channels. Every scanline
    gets the SAME ``filter_type`` (0..4); filtering is computed vectorized
    from the known pixels (the encode direction has no sequential
    dependence), so the writer doubles as a filter-coverage fixture for the
    decoder."""
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = a.reshape(h, w * c).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, c:] = flat[:, :-c]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, c:] = flat[:-1, :-c]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - (left + up) // 2
    elif filter_type == 4:
        p = left + up - ul
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
        )
        filt = flat - pred
    else:
        raise ValueError(f"bad filter type {filter_type}")
    raw = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), (filt % 256).astype(np.uint8)],
        axis=1,
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[dict, np.ndarray]:
    """PNG → (meta, uint8 pixels (h, w, channels)).

    Chunk walk + CRC check, one ``zlib.decompress`` over the concatenated
    IDAT stream, then numpy unfiltering: None is a view, Up is one
    vectorized add per row, Sub is the mod-256 prefix sum (``np.cumsum``
    with ``dtype=uint8`` wraps exactly as the spec requires), Average and
    Paeth vectorize over the channel lanes with the unavoidable sequential
    step along x."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt_m, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp != 0 or filt_m != 0:
                raise ValueError("bad compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            ihdr = (w, h, color_type)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    w, h, color_type = ihdr
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:]
    if ftypes.max(initial=0) > 4:
        raise ValueError("bad scanline filter byte")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    # consecutive same-filter runs of None/Sub/Up rows decode as one block
    y = 0
    while y < h:
        ft = ftypes[y]
        if ft in (0, 1):
            y2 = y
            while y2 + 1 < h and ftypes[y2 + 1] == ft:
                y2 += 1
            block = rows[y : y2 + 1]
            if ft == 0:
                out[y : y2 + 1] = block
            else:  # Sub: mod-256 prefix sum along x per channel lane
                lanes = block.reshape(y2 + 1 - y, w, c)
                out[y : y2 + 1] = np.cumsum(lanes, axis=1, dtype=np.uint8).reshape(
                    y2 + 1 - y, stride
                )
            prev = out[y2]
            y = y2 + 1
            continue
        if ft == 2:  # Up
            out[y] = rows[y] + prev
        elif ft == 3:  # Average
            row = rows[y].astype(np.int16).reshape(w, c)
            pv = prev.astype(np.int16).reshape(w, c)
            rec = np.zeros((w, c), dtype=np.int16)
            left = np.zeros(c, dtype=np.int16)
            for x in range(w):
                left = (row[x] + (left + pv[x]) // 2) % 256
                rec[x] = left
            out[y] = rec.astype(np.uint8).reshape(stride)
        else:  # Paeth
            row = rows[y].astype(np.int16).reshape(w, c)
            pv = prev.astype(np.int16).reshape(w, c)
            pvl = np.zeros((w, c), dtype=np.int16)
            pvl[1:] = pv[:-1]
            rec = np.zeros((w, c), dtype=np.int16)
            left = np.zeros(c, dtype=np.int16)
            for x in range(w):
                p = left + pv[x] - pvl[x]
                pa_, pb, pc_ = (
                    np.abs(p - left), np.abs(p - pv[x]), np.abs(p - pvl[x])
                )
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left,
                    np.where(pb <= pc_, pv[x], pvl[x]),
                )
                left = (row[x] + pred) % 256
                rec[x] = left
            out[y] = rec.astype(np.uint8).reshape(stride)
        prev = out[y]
        y += 1
    meta = {"width": w, "height": h, "color_type": color_type, "n_channels": c}
    return meta, out.reshape(h, w, c)


class PngDecode:
    """Actor-pool PNG decode + feature stage (mirrors :class:`WavDecode`).

    Output columns: width, height, n_channels, mean_px, std_px, min_px,
    max_px — computed from the actual decoded pixels."""

    def __init__(self, payload_col: str = "payload", strict: bool = True):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col].combine_chunks()
        n = len(col)
        wd = np.zeros(n, dtype=np.int32)
        ht = np.zeros(n, dtype=np.int32)
        ch = np.zeros(n, dtype=np.int32)
        feats = np.full((n, 4), np.nan)  # mean, std, min, max
        ok = np.ones(n, dtype=bool)
        import zlib

        for i in range(n):
            try:
                meta, px = decode_png(col[i].as_py())
            except (ValueError, zlib.error, struct.error):
                if self.strict:
                    raise
                ok[i] = False
                continue
            wd[i], ht[i], ch[i] = meta["width"], meta["height"], meta["n_channels"]
            pf = px.astype(np.float64)
            feats[i] = (pf.mean(), pf.std(), pf.min(), pf.max())
        batch = batch.drop_columns([self.payload_col])
        cols = {
            "width": pa.array(wd, mask=~ok),
            "height": pa.array(ht, mask=~ok),
            "n_channels": pa.array(ch, mask=~ok),
            "mean_px": pa.array(feats[:, 0], mask=~ok),
            "std_px": pa.array(feats[:, 1], mask=~ok),
            "min_px": pa.array(feats[:, 2], mask=~ok),
            "max_px": pa.array(feats[:, 3], mask=~ok),
        }
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def decode_png_features(
    media: ray.data.Dataset,
    payload_col: str = "payload",
    strict: bool = True,
    concurrency: int = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """media(payload=PNG bytes, ...) → per-row image features decoded from
    the REAL pixels (see :class:`PngDecode`)."""
    return media.map_batches(
        PngDecode,
        fn_constructor_kwargs={"payload_col": payload_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def synth_png_payloads(doc_ids: pa.Array | pa.ChunkedArray) -> list[bytes]:
    """Deterministic per-doc PNG payloads (gradient + checker pattern,
    parameters a pure function of the doc_id hash; filter type cycles
    through all five so the corpus exercises every unfilter path)."""
    from ._shuffle import hash64_strings

    h64 = hash64_strings(doc_ids)
    out: list[bytes] = []
    for hv in h64:
        hv = int(hv)
        w = 8 + (hv >> 4) % 25
        h = 8 + (hv >> 12) % 25
        c = (1, 2, 3, 4)[(hv >> 20) % 4]
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * ((hv >> 24) % 7 + 1) + yy * ((hv >> 28) % 5 + 1)) % 256
        px = np.stack(
            [(base + 31 * k + ((xx // 4 + yy // 4 + k) % 2) * 64) % 256
             for k in range(c)],
            axis=2,
        ).astype(np.uint8)
        out.append(encode_png(px[:, :, 0] if c == 1 else px, filter_type=hv % 5))
    return out


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
