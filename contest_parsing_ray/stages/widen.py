"""Wide pivot: one row per bucket with per-source prefixed columns.

Reference analog: ``TraceInOneRowExploder`` — the two-level group-and-pivot
that implodes each trace into ONE wide row of per-service aggregates with
``{servicename}-`` column prefixes (``TraceInOneRowExploder.py:51-215``,
prefixer ``:383-389``, diagonal concat ``:233``) and the null-template fill
for traces missing a service (``:229-243``, stateful ``microservice_lookup``).

The reference accumulates the service→column-template lookup MUTABLY across
the loop (ST3); the engine removes that cross-row state with a two-pass
plan: pass 1 collects the global key set (tiny aggregate), pass 2 pivots
with the full column set known, so every wide row has identical schema and
missing (bucket, source) cells are nulls — no dynamic schema repair
(reference ``TraceInOneRowExploder.py:76-80``) needed.

Width guard: the reference warns >1000 dynamic columns is unusable
(``TraceInOneRowExploder.py:4-5``); ``max_keys`` caps the pivot width.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from ._shuffle import hash_partitioned_map


def widen(
    rollup: ray.data.Dataset,
    key_col: str = "source",
    index_col: str = "bucket_us",
    value_cols: tuple[str, ...] = ("cnt", "sum_v", "p95_v"),
    max_keys: int = 1000,
) -> ray.data.Dataset:
    """rollup(key, bucket, aggs...) → one row per bucket, columns
    ``{key}-{agg}`` for every key (missing cells null)."""
    # pass 1: global key set (driver-side tiny aggregate — analog of the
    # reference's microservice_lookup, made stateless)
    keys = sorted(rollup.unique(key_col))
    if len(keys) > max_keys:
        raise ValueError(
            f"pivot would create {len(keys)} x {len(value_cols)} columns; "
            f"max_keys={max_keys} (reference warns >1000 dynamic columns, "
            "TraceInOneRowExploder.py:4-5) — use a list/struct layout instead"
        )
    wide_cols = [f"{k}-{v}" for k in keys for v in value_cols]

    def pivot_partition(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(
            index=index_col, columns=key_col, values=list(value_cols), aggfunc="first"
        )
        # flatten MultiIndex to "{key}-{value}" and align to the global set;
        # float64 so all-NaN partition columns don't become Arrow null type
        import numpy as np

        p.columns = [f"{k}-{v}" for v, k in p.columns]
        p = p.reindex(columns=wide_cols).astype(np.float64)
        return p.reset_index()

    return hash_partitioned_map(rollup, [index_col], pivot_partition, batch_format="pandas")


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Wide → long unpivot (the inverse of :func:`widen`): one output row
    per (input row, value column), values cast to float64.

    Pure per-batch fan-out — a row-multiplying map with NO shuffle (the
    same row-multiplying-map shape as the reference's explode chains,
    SURVEY M1/M7).
    """
    import pyarrow as pa

    def f(t: "pa.Table") -> "pa.Table":
        parts = []
        for c in value_cols:
            part = t.select(id_cols)
            part = part.append_column(
                var_col, pa.repeat(pa.scalar(c, type=pa.string()), len(t))
            )
            part = part.append_column(value_col, t[c].cast(pa.float64()))
            parts.append(part)
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow")
