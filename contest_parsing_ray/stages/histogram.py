"""Distributed fixed-bin value histogram per key.

The scale shape every monitoring/training-data pipeline needs for value
distributions (latency buckets, token-length spreads): per-batch
``bincount`` partials collapse each batch to at most ``n_keys × n_bins``
tiny rows BEFORE the exchange, so the groupby shuffle moves O(bins), never
O(rows) — the same partial-before-shuffle rule as ``stages/rollup.py``.
Reference analog: the per-bucket aggregates of ``Joiner.py:345-354``,
generalized from point stats to a distribution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def value_histogram(
    events: ray.data.Dataset,
    key_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> ray.data.Dataset:
    """events → ``(key, bin, cnt)`` with ``bin = clip(floor((v - lo) *
    n_bins / (hi - lo)), 0, n_bins - 1)`` (out-of-range values land in the
    edge bins; empty bins are omitted). Nulls are dropped."""
    if not (hi > lo and n_bins > 0):
        raise ValueError(f"need hi > lo and n_bins > 0, got [{lo}, {hi}) x {n_bins}")

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key_col).type
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = batch[key_col].to_pandas()
        ok = ~np.isnan(v)
        if not ok.all():
            v, keys = v[ok], keys[ok].reset_index(drop=True)
        # op order matches SQL `FLOOR((v - lo) * n_bins / (hi - lo))` so
        # boundary values bin identically under an exact-compare oracle;
        # clip BEFORE the int cast — a float large enough to overflow
        # int64 would otherwise wrap to INT64_MIN and land in bin 0
        b = np.clip(
            np.floor((v - lo) * float(n_bins) / (hi - lo)), 0, n_bins - 1
        ).astype(np.int64)
        # null keys form their own group (SQL GROUP BY NULL), never the
        # -1 sentinel (negative codes would crash bincount)
        codes, uniques = pd.factorize(keys, sort=False, use_na_sentinel=False)
        flat = codes * n_bins + b
        cnt = np.bincount(flat, minlength=len(uniques) * n_bins)
        nz = np.flatnonzero(cnt)
        # explicit key type: empty batches must not emit a null-typed key
        return pa.table(
            {
                key_col: pa.Array.from_pandas(
                    pd.Series(uniques[nz // n_bins]), type=key_type
                ),
                "bin": pa.array((nz % n_bins).astype(np.int64), type=pa.int64()),
                "cnt": pa.array(cnt[nz].astype(np.int64), type=pa.int64()),
            }
        )

    partials = events.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns([key_col, "bin", "cnt"])

    return (
        partials.groupby([key_col, "bin"])
        .sum("cnt")
        .map_batches(rename, batch_format="pyarrow")
    )
