"""Ingest: Parquet sequences table → canonical `events` Dataset.

Reference analog: the three parsers that turn raw exports into flat columnar
tables with normalized, bucketed timestamps (``TracesParser.py:146-156``
Int64-µs→Datetime + ``dt.round``; ``MetricsParser.py:111-124`` epoch→Datetime;
schema normalization ``MetricsParser.py:94-109`` and the typecast zoo
``TraceInOneRowExploder.py:321-381``). Here the input is already columnar, so
ingest is: read (column-pruned) → derive ``event_time_us`` as a pure function
of ``doc_id`` → enforce the canonical schema. All per-batch work is
vectorized Arrow; no Python row loops.

``doc_id`` format: ``"{source}/{epoch_minute:012d}/{seq:06d}"`` and

    event_time_us = epoch_minute * 60_000_000
                    + (seq * SEQ_OFFSET_MULTIPLIER) % 60_000_000

(the within-minute offset spreads events across the minute so the
round-to-nearest grid has interesting half-bucket cases).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.bucketing import add_bucket_columns
from .synthetic import SEQ_OFFSET_MULTIPLIER

EVENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("event_time_us", pa.int64()),
    ]
)


def derive_event_time(batch: pa.Table) -> pa.Table:
    """Vectorized doc_id → event_time_us (pure function, no state).

    Splits on '/', parses the two numeric fields with Arrow casts, and does
    the offset arithmetic in numpy. Zero-copy in, one appended column out.
    """
    parts = pc.split_pattern(batch["doc_id"], pattern="/")
    minute = pc.list_element(parts, 1).cast(pa.int64())
    seq = pc.list_element(parts, 2).cast(pa.int64())
    m = minute.to_numpy(zero_copy_only=False)
    q = seq.to_numpy(zero_copy_only=False)
    ts = m * 60_000_000 + (q * SEQ_OFFSET_MULTIPLIER) % 60_000_000
    return batch.append_column("event_time_us", pa.array(ts, type=pa.int64()))


def read_sequences(
    path: str,
    columns: list[str] | None = None,
    with_tokens: bool = True,
) -> ray.data.Dataset:
    """Read the sequences Parquet table and derive event_time_us.

    ``with_tokens=False`` prunes the (heavy) tokens column at the read for
    pipelines that only need ``n_tok`` — at 100 TB the tokens column is
    ~99% of the bytes, so rollup-only runs must not load it
    (prune-at-the-read; reference had no such pruning, it read whole files,
    ``MetricsParser.py:81``).
    """
    if columns is None:
        columns = ["doc_id", "tokens", "n_tok", "source"]
        if not with_tokens:
            columns = ["doc_id", "n_tok", "source"]
    ds = ray.data.read_parquet(path, columns=columns)
    return ds.map_batches(derive_event_time, batch_format="pyarrow")


def bucketize(ds: ray.data.Dataset, widths_us: dict[str, int]) -> ray.data.Dataset:
    """Append round-to-nearest bucket columns for each tier (M10/F3)."""
    return ds.map_batches(
        lambda b: add_bucket_columns(b, "event_time_us", widths_us),
        batch_format="pyarrow",
    )


def token_checksum(batch: pa.Table) -> pa.Table:
    """Per-row order-sensitive token-array checksum (for the token-array
    equality invariant: tokens must survive ingest/dedup/shuffle
    byte-identical, per BASELINE.json input_hint).

    checksum = sum((i+1) * (token_i + 1)) mod 2^64 — cheap, vectorized via
    Arrow list offsets + numpy segment sums.
    """
    tokens = batch["tokens"]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    # list_value_length + flatten are slice-safe (raw .offsets buffers are not)
    lengths = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = tokens.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    pos = (
        np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    ).astype(np.uint64)
    with np.errstate(over="ignore"):
        weighted = (pos + np.uint64(1)) * (flat + np.uint64(1))
    if len(flat):
        # sentinel so trailing empty rows don't corrupt reduceat segments
        weighted = np.append(weighted, np.uint64(0))
        sums = np.add.reduceat(weighted, offsets[:-1])
        sums = np.where(lengths == 0, np.uint64(0), sums)
    else:
        sums = np.zeros(len(lengths), dtype=np.uint64)
    return batch.append_column("token_ck", pa.array(sums.view(np.int64), type=pa.int64()))
