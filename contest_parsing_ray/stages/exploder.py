"""Trace-in-one-row exploder — the reference's A3 tail, completed.

Reference: ``TraceInOneRowExploder.py:51-215`` — per (trace, service) it
computes ~35 aggregates (mean/min/max of metric columns, mean of depth
stats, span count, ``mode(http.status_code)``, and list-collects of
spanID/operationName/starttime joined with ``" - "``), then implodes each
trace into ONE wide row with ``{servicename}-`` column prefixes
(``:383-389``) plus trace-level totals (``:72-74``).

Ray-Data re-expression: hash-partition by trace so each trace co-locates,
then ONE vectorized function per partition:

- numeric aggregates via pandas cython groupby,
- group string-joins via Arrow ``binary_join`` over a run-length list array
  (no per-group Python ``" - ".join``),
- multi-mode via a counts→max→filter→group-join chain (ties are sorted
  ascending then joined — deterministic, where polars ``mode()`` order is
  unspecified),
- the per-trace pivot via ``pivot_table(aggfunc="first")`` against a
  two-pass global service set (same pattern as ``widen``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ._shuffle import hash_partitioned_map


def _group_join(
    df: pd.DataFrame, group_cols: list[str], value_col: str, sep: str = " - "
) -> pd.DataFrame:
    """Vectorized per-group string join; ``df`` must already be sorted by
    ``group_cols`` (+ any desired within-group order). Returns one row per
    group: group_cols + joined value_col."""
    if len(df) == 0:
        return df[group_cols + [value_col]].astype({value_col: str})
    keys = df[group_cols]
    change = (keys != keys.shift()).any(axis=1).to_numpy()
    change[0] = True
    starts = np.flatnonzero(change)
    offsets = np.append(starts, len(df)).astype(np.int32)
    vals = pa.array(df[value_col].astype(str).to_numpy(), type=pa.string())
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), vals)
    joined = pc.binary_join(lst, sep).to_pandas()
    out = keys.iloc[starts].reset_index(drop=True)
    out[value_col] = joined
    return out


def _group_modes(
    df: pd.DataFrame, group_cols: list[str], value_col: str, sep: str = " - "
) -> pd.DataFrame:
    """All tied modes of value_col per group, sorted ascending, joined."""
    counts = (
        df.groupby(group_cols + [value_col], sort=False, dropna=True)
        .size()
        .reset_index(name="__n")
    )
    if len(counts) == 0:
        return counts[group_cols + [value_col]].astype({value_col: str})
    counts["__max"] = counts.groupby(group_cols, sort=False)["__n"].transform("max")
    modes = counts[counts["__n"] == counts["__max"]]
    modes = modes.sort_values(group_cols + [value_col], kind="stable")
    return _group_join(modes, group_cols, value_col, sep)


def trace_one_row(
    spans: ray.data.Dataset,
    trace_col: str = "trace_id",
    service_col: str = "servicename",
    mean_cols: tuple[str, ...] = (),
    minmax_cols: tuple[str, ...] = (),
    join_cols: tuple[str, ...] = (),
    mode_cols: tuple[str, ...] = (),
    duration_col: str | None = None,
    sort_cols: tuple[str, ...] = (),
    max_services: int = 1000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """One wide row per trace: per-service aggregates with ``{service}-``
    prefixes + trace-level totals.

    Per (trace, service): ``mean_{c}`` for mean_cols; ``mean/min/max_{c}``
    for minmax_cols; ``spans_in_service`` count; ``join_{c}`` " - "-joins
    (in sort_cols order) for join_cols; ``mode_{c}`` sorted tied modes for
    mode_cols. Trace level: ``trace_duration`` (sum of duration_col) and
    ``trace_span_length``."""
    # pass 1: global service set (ST3 two-pass, same as widen)
    services = sorted(spans.unique(service_col))
    if len(services) > max_services:
        raise ValueError(
            f"pivot would create {len(services)} service column groups; "
            f"max_services={max_services} (reference warns >1000 dynamic "
            "columns, TraceInOneRowExploder.py:4-5)"
        )

    agg_names: list[str] = []
    agg_names += [f"mean_{c}" for c in mean_cols]
    for c in minmax_cols:
        agg_names += [f"mean_{c}", f"min_{c}", f"max_{c}"]
    agg_names.append("spans_in_service")
    agg_names += [f"join_{c}" for c in join_cols]
    agg_names += [f"mode_{c}" for c in mode_cols]
    wide_cols = [f"{s}-{a}" for s in services for a in agg_names]
    numeric_wide = {
        f"{s}-{a}"
        for s in services
        for a in agg_names
        if not (a.startswith("join_") or a.startswith("mode_"))
    }

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [trace_col, "trace_span_length"] + (
            ["trace_duration"] if duration_col else []
        ) + wide_cols
        if len(df) == 0:
            empty = pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
            for c in out_cols:
                if c in numeric_wide or c in ("trace_span_length", "trace_duration"):
                    empty[c] = empty[c].astype(np.float64)
            return empty
        order = [trace_col, service_col, *sort_cols]
        df = df.sort_values(order, kind="stable")
        g = df.groupby([trace_col, service_col], sort=True)

        pieces = []
        for c in mean_cols:
            pieces.append(g[c].mean().rename(f"mean_{c}"))
        for c in minmax_cols:
            pieces.append(g[c].mean().rename(f"mean_{c}"))
            pieces.append(g[c].min().rename(f"min_{c}"))
            pieces.append(g[c].max().rename(f"max_{c}"))
        pieces.append(g.size().astype(np.float64).rename("spans_in_service"))
        merged = pd.concat(pieces, axis=1).reset_index()
        for c in join_cols:
            j = _group_join(df, [trace_col, service_col], c).rename(
                columns={c: f"join_{c}"}
            )
            merged = merged.merge(j, on=[trace_col, service_col], how="left")
        for c in mode_cols:
            m = _group_modes(df, [trace_col, service_col], c).rename(
                columns={c: f"mode_{c}"}
            )
            merged = merged.merge(m, on=[trace_col, service_col], how="left")

        piv = merged.pivot_table(
            index=trace_col, columns=service_col, values=agg_names, aggfunc="first"
        )
        piv.columns = [f"{s}-{a}" for a, s in piv.columns]
        piv = piv.reindex(columns=wide_cols)
        for c in wide_cols:
            if c in numeric_wide:
                piv[c] = piv[c].astype(np.float64)
        piv = piv.reset_index()

        tg = df.groupby(trace_col, sort=True)
        piv["trace_span_length"] = tg.size().reindex(piv[trace_col]).to_numpy().astype(np.float64)
        if duration_col:
            piv["trace_duration"] = (
                tg[duration_col].sum().reindex(piv[trace_col]).to_numpy().astype(np.float64)
            )
        return piv[out_cols]

    return hash_partitioned_map(
        spans, [trace_col], per_partition,
        num_partitions=num_partitions, batch_format="pandas",
    )
