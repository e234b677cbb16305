"""REAL video decode: RIFF/AVI container parsing + MJPEG frame decode.

Closes the last multimodal stub (``multimodal.DecodeStub`` kept video behind
``NotImplementedError`` because the container has no ffmpeg/PyAV). An AVI
file is plain RIFF chunk structure — pure ``struct`` unpacking — and MJPEG
video data chunks are ordinary baseline JPEGs, which ``multimodal.decode_jpeg``
(the pure-numpy T.81 decoder) already handles. So the full pipeline —
container demux → frame sampling → per-frame pixel decode → feature
aggregation — runs on real bytes with zero native codecs.

Reference parity: the reference has no video path; this implements the
build brief's multimodal axis ("frame-sample as actor-pool map_batches
stages") with the decode step REAL rather than stubbed. The actor-pool
shape mirrors ``multimodal.JpegDecode`` (`multimodal.py:1129`), per the
reference's stateful-stage pattern (``Sequential_MainFile.py:31-54``'s
per-worker parser state).

Scale notes (100 TB): videos are the canonical "large binary payload"
column — a batch is ``batch_size`` payloads resident at once, so
``decode_video_features`` defaults to a SMALL batch_size (8) and lets the
actor pool provide parallelism. Frame sampling (``frame_stride``) bounds
decode cost per payload: a 30 fps clip sampled at stride 30 decodes 1/30th
of its frames, and the demux step never copies unsampled frame bytes (the
RIFF walk slices only the sampled ``memoryview`` ranges).

Supported: AVI 1.0, single 'vids' stream, 'MJPG' fourcc, frames in '00dc'
chunks (optionally inside 'rec ' LISTs), optional idx1 (ignored — the movi
walk is authoritative). Everything else raises ValueError with the marker
that broke. No B-frames/audio/interleave concerns: MJPEG is intra-only.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from .multimodal import decode_jpeg, encode_jpeg_baseline
from ._shuffle import pool_size

__all__ = [
    "encode_avi_mjpeg",
    "parse_avi",
    "decode_avi_frames",
    "VideoDecode",
    "decode_video_features",
    "synth_avi_payloads",
]


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + body + even padding."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10, quality: int = 85) -> bytes:
    """Minimal AVI/MJPEG writer (test + synthetic-corpus helper).

    ``frames``: uint8 (h, w) gray or (h, w, 3) RGB arrays, all the same
    shape. Each frame becomes one baseline JPEG in a '00dc' chunk; a
    standard idx1 index is appended (players want it; our reader ignores
    it). Layout follows the public AVI RIFF spec (msdn 'AVI RIFF File
    Reference'): RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    LIST('movi' 00dc...) idx1)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    jpegs = [encode_jpeg_baseline(f, quality=quality) for f in frames]
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)
    usec_per_frame = max(1, 1_000_000 // fps)

    # avih: MainAVIHeader (14 DWORDs)
    avih = struct.pack(
        "<14I",
        usec_per_frame,            # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec (advisory)
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags = AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    # strh: AVIStreamHeader for the single 'vids' stream
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    # strf: BITMAPINFOHEADER, biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(_chunk(b"strh", strh)) + len(_chunk(b"strf", strf))) \
        + b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    hdrl_body = b"hdrl" + _chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_parts = [b"movi"]
    idx_entries = []
    offset = 4  # idx1 offsets are relative to the start of 'movi' fourcc
    for j in jpegs:
        ck = _chunk(b"00dc", j)
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        movi_parts.append(ck)
        offset += len(ck)
    movi_body = b"".join(movi_parts)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi(payload: bytes | memoryview) -> tuple[dict, list[memoryview]]:
    """AVI bytes -> (meta, per-frame JPEG memoryviews). Demux only — no
    pixel decode, no frame-byte copies (each frame is a slice view)."""
    buf = memoryview(payload)
    if len(buf) < 12 or bytes(buf[0:4]) != b"RIFF" or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)

    meta = {"width": 0, "height": 0, "n_frames": 0, "usec_per_frame": 0,
            "fourcc": ""}
    frames: list[memoryview] = []

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            fourcc = bytes(buf[pos : pos + 4])
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_lo = pos + 8
            body_hi = body_lo + size
            if body_hi > hi:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                ltype = bytes(buf[body_lo : body_lo + 4])
                if ltype in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body_lo + 4, body_hi)
            elif fourcc == b"avih":
                (meta["usec_per_frame"], _, _, _, meta["n_frames"], _, _, _,
                 meta["width"], meta["height"]) = struct.unpack_from("<10I", buf, body_lo)
            elif fourcc == b"strh":
                stype = bytes(buf[body_lo : body_lo + 4])
                if stype == b"vids":
                    meta["fourcc"] = bytes(buf[body_lo + 4 : body_lo + 8]).decode(
                        "ascii", "replace"
                    )
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(buf[body_lo:body_hi])
            pos = body_hi + (size & 1)  # even-byte chunk alignment

    walk(12, end)
    if meta["fourcc"] and meta["fourcc"] != "MJPG":
        raise ValueError(f"unsupported video codec {meta['fourcc']!r} (MJPG only)")
    if not frames:
        raise ValueError("no video frames ('00dc'/'00db' chunks) in movi")
    meta["n_frames"] = meta["n_frames"] or len(frames)
    return meta, frames


def decode_avi_frames(
    payload: bytes, frame_stride: int = 1
) -> tuple[dict, list[np.ndarray]]:
    """AVI bytes -> (meta, decoded uint8 pixel arrays for every
    ``frame_stride``-th frame). Unsampled frames are never decoded."""
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    meta, views = parse_avi(payload)
    sampled = [decode_jpeg(bytes(v)) for v in views[::frame_stride]]
    meta = dict(meta, n_sampled=len(sampled))
    return meta, [px for _, px in sampled]


class VideoDecode:
    """Actor-pool AVI/MJPEG decode + per-video feature stage (mirrors
    ``multimodal.JpegDecode``; demux tables built per payload, JPEG Huffman
    LUT construction amortized inside ``decode_jpeg``).

    Output columns: width, height, n_frames, n_sampled, fps_x1000,
    mean_px, std_px, min_px, max_px, motion — pixel stats pooled over the
    SAMPLED frames' real pixels; ``motion`` is the mean absolute
    inter-sampled-frame pixel delta (0 for single-frame samples), the
    standard cheap curation signal for static/duplicate clips."""

    def __init__(
        self,
        payload_col: str = "payload",
        frame_stride: int = 1,
        strict: bool = True,
    ):
        self.payload_col = payload_col
        self.frame_stride = frame_stride
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col].combine_chunks()
        n = len(col)
        wd = np.zeros(n, dtype=np.int32)
        ht = np.zeros(n, dtype=np.int32)
        nf = np.zeros(n, dtype=np.int32)
        ns = np.zeros(n, dtype=np.int32)
        fps = np.zeros(n, dtype=np.int32)
        feats = np.full((n, 5), np.nan)  # mean, std, min, max, motion
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                meta, frames = decode_avi_frames(
                    col[i].as_py(), frame_stride=self.frame_stride
                )
            except (ValueError, struct.error):
                if self.strict:
                    raise
                ok[i] = False
                continue
            wd[i], ht[i] = meta["width"], meta["height"]
            nf[i], ns[i] = meta["n_frames"], meta["n_sampled"]
            upf = meta["usec_per_frame"]
            fps[i] = round(1_000_000_000 / upf) if upf else 0  # fps x1000
            stack = np.stack([f.astype(np.float64) for f in frames])
            motion = (
                float(np.abs(np.diff(stack, axis=0)).mean())
                if len(frames) > 1
                else 0.0
            )
            feats[i] = (stack.mean(), stack.std(), stack.min(), stack.max(), motion)
        batch = batch.drop_columns([self.payload_col])
        cols = {
            "width": pa.array(wd, mask=~ok),
            "height": pa.array(ht, mask=~ok),
            "n_frames": pa.array(nf, mask=~ok),
            "n_sampled": pa.array(ns, mask=~ok),
            "fps_x1000": pa.array(fps, mask=~ok),
            "mean_px": pa.array(feats[:, 0], mask=~ok),
            "std_px": pa.array(feats[:, 1], mask=~ok),
            "min_px": pa.array(feats[:, 2], mask=~ok),
            "max_px": pa.array(feats[:, 3], mask=~ok),
            "motion": pa.array(feats[:, 4], mask=~ok),
        }
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def decode_video_features(
    media: ray.data.Dataset,
    payload_col: str = "payload",
    frame_stride: int = 1,
    strict: bool = True,
    concurrency: int = 4,
    batch_size: int = 8,
) -> ray.data.Dataset:
    """media(payload=AVI bytes, ...) -> per-video features decoded from the
    REAL sampled-frame pixels (see :class:`VideoDecode`). Small default
    batch_size: video payloads are the large-binary case — bound resident
    bytes per actor, scale out via the pool."""
    return media.map_batches(
        VideoDecode,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "frame_stride": frame_stride,
            "strict": strict,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        # passed through verbatim: an int is a FIXED pool — (1, n)
        # autoscaling ramps one actor at a time, and on short runs the
        # ramp dominates the wall
        concurrency=pool_size(concurrency),
    )


def synth_avi_payloads(doc_ids: pa.Array | pa.ChunkedArray) -> list[bytes]:
    """Deterministic per-doc AVI/MJPEG payloads: 2-6 frames of a smooth
    gradient that translates frame-over-frame (so ``motion`` is nonzero),
    parameters a pure function of the doc_id hash; cycles gray/RGB and
    two quality levels so the corpus exercises both JPEG color paths."""
    from ._shuffle import hash64_strings

    h64 = hash64_strings(doc_ids)
    out: list[bytes] = []
    for hv in h64:
        hv = int(hv)
        w = 16 + (hv >> 4) % 17
        h = 16 + (hv >> 10) % 17
        rgb = (hv >> 16) % 2 == 1
        quality = (75, 90)[(hv >> 17) % 2]
        n_frames = 2 + (hv >> 18) % 5
        fps = (5, 10, 25)[(hv >> 21) % 3]
        shift = 1 + (hv >> 23) % 3
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n_frames):
            base = ((hv >> 24) % 120) + (xx + t * shift) * ((hv >> 28) % 3 + 1) + yy
            if rgb:
                px = np.stack(
                    [base, base + ((hv >> 32) % 40), (xx * 2 + yy * 2 + t * shift)],
                    axis=2,
                )
            else:
                px = base
            frames.append(np.clip(px, 0, 255).astype(np.uint8))
        out.append(encode_avi_mjpeg(frames, fps=fps, quality=quality))
    return out
