"""Scalar/list kernels — the reference's expression vocabulary (SURVEY §2.8),
as vectorized pyarrow.compute / numpy functions usable inside ``map_batches``.

| here | reference |
|---|---|
| pod_to_container      | F1 str.split('-') + reverse/slice/join pause repair (``MetricsParser.py:136``) |
| epoch_seconds_to_us / us_to_timestamp | F2 from_epoch + Int64-µs→Datetime casts (``MetricsParser.py:117-120``) |
| round_to_grid         | F3 dt.round duration grammar (``MetricsParser.py:118``; functions.bucketing) |
| concat_date_time      | F4 Date+" "+Time → datetime (``LogsParser.py:49-50``) |
| shift_hours           | F5 timedelta(hours=k) tz repair (``ParseSettings.py:54-55``) |
| if_else_equals        | F6 when/then/otherwise (``TracesParser.py:120-127``) |
| list_join             | F7 list.join(" - ") stringify (``TraceInOneRowExploder.py:152-157``) |
| row_mean_non_null     | F8 concat_list + row-wise non-null mean (``TraceInOneRowExploder.py:276-301``) |
| strip_digits          | F9 regex digit-strip column-stem matching (``TraceInOneRowExploder.py:268-271``) |
| fill_null_from        | F10 fill_null(value=Series) template fill (``TraceInOneRowExploder.py:237-240``) |
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bucketing import bucket_array as round_to_grid  # F3 re-export


def pod_to_container(pod: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F1: strip the last 2 dash-separated segments of a pod name
    ('pod-a-1-abc12-xyz34' → 'pod-a-1'; fewer than 3 segments → '',
    matching the reference's split/reverse/slice(2)/join)."""
    stripped = pc.replace_substring_regex(pod, pattern=r"-[^-]*-[^-]*$", replacement="")
    had_two_dashes = pc.not_equal(stripped, pod)
    empty = pc.if_else(pc.is_null(pod), pod, pa.scalar("", type=pa.string()))
    return pc.if_else(pc.fill_null(had_two_dashes, False), stripped, empty)


def epoch_seconds_to_us(sec: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F2: epoch seconds (float or string) → int64 epoch µs."""
    f = pc.cast(sec, pa.float64())
    return pc.cast(pc.round(pc.multiply(f, 1e6)), pa.int64())


def us_to_timestamp(us: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F2: int64 epoch µs → timestamp[us]."""
    return pc.cast(us, pa.timestamp("us"))


def concat_date_time(
    date: pa.Array | pa.ChunkedArray, time_: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """F4: 'YYYY-MM-DD' + ' ' + 'HH:MM:SS[.fff]' → timestamp[us]."""
    joined = pc.binary_join_element_wise(date, time_, " ")
    return pc.strptime(joined, format="%Y-%m-%d %H:%M:%S", unit="us", error_is_null=True)


def shift_hours(ts_us: pa.Array | pa.ChunkedArray, hours: int) -> pa.Array:
    """F5: constant timezone-repair shift."""
    return pc.add(pc.cast(ts_us, pa.int64()), pa.scalar(hours * 3_600_000_000))


def if_else_equals(
    col: pa.Array | pa.ChunkedArray, match: str, then_col, otherwise=None
) -> pa.Array:
    """F6: when(col == match).then(then_col).otherwise(otherwise)."""
    cond = pc.fill_null(pc.equal(col, match), False)
    other = (
        otherwise
        if otherwise is not None
        else pa.nulls(len(col), type=pa.array(then_col).type if not isinstance(then_col, (pa.Array, pa.ChunkedArray)) else then_col.type)
    )
    return pc.if_else(cond, then_col, other)


def list_join(lists: pa.Array | pa.ChunkedArray, sep: str = " - ") -> pa.Array:
    """F7: stringify collected lists ('a - b - c')."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    if not pa.types.is_string(lists.type.value_type):
        flat = pc.cast(lists.flatten(), pa.string())
        lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(lists) + 1, dtype=np.int32)
        np.cumsum(np.nan_to_num(lengths), out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), flat)
    return pc.binary_join(lists, sep)


def row_mean_non_null(*cols) -> pa.Array:
    """F8: row-wise mean over the non-null entries of several columns (the
    reference's concat_list + manual coalesce-average)."""
    stacked = [
        np.asarray(pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False), dtype=np.float64)
        for c in cols
    ]
    mat = np.vstack(stacked)
    with np.errstate(invalid="ignore"):
        mean = np.nanmean(mat, axis=0)
    return pa.array(mean, type=pa.float64())


def strip_digits(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F9: remove all digit runs (column-stem matching)."""
    return pc.replace_substring_regex(col, pattern=r"[0-9]+", replacement="")


def fill_null_from(
    col: pa.Array | pa.ChunkedArray, template: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """F10: element-wise null fill from a template column."""
    return pc.if_else(pc.is_null(col), template, col)
