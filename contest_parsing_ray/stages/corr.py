"""Pairwise Pearson correlation between per-key time series.

Which metrics co-move? Input is a rollup-tier series ``(key, bucket,
value)`` — points ∝ keys x buckets, compact by construction. ONE hash
exchange on the BUCKET co-locates each bucket's cross-section; every
partition then reduces its buckets to sufficient-statistic partials
``(k1, k2, n, sx, sy, sxx, syy, sxy)`` — at most keys^2/2 rows per
partition regardless of bucket count — and the driver folds those into
the closed-form sample correlation. Nothing key-cardinality-sized or
bucket-cardinality-sized ever moves after the exchange.

Semantics match SQL ``corr(a.v, b.v)`` over the bucket-equality self-join
with ``k1 < k2``: only buckets where BOTH keys are present (and non-null)
contribute; pairs with n < 2 or zero variance yield NULL. Null keys are
dropped — a SQL equality self-join can never match NULL = NULL.

Contract: key cardinality is bounded (tier-stats scale — event types,
sources); the exchange itself is O(series points), which is already
compact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ._shuffle import hash_partitioned_map


def pairwise_corr(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """→ small driver table ``(k1, k2, n, r)`` for every unordered key
    pair, ``k1 < k2`` (string order), ``r`` the sample Pearson
    correlation over co-present buckets (null when undefined)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna() & df[value_col].notna()]
        if len(df) == 0:
            return pd.DataFrame({
                "k1": pd.Series([], dtype=object),
                "k2": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "sx": pd.Series([], dtype=np.float64),
                "sy": pd.Series([], dtype=np.float64),
                "sxx": pd.Series([], dtype=np.float64),
                "syy": pd.Series([], dtype=np.float64),
                "sxy": pd.Series([], dtype=np.float64),
            })
        wide = df.pivot_table(
            index=ts_col, columns=key_col, values=value_col,
            aggfunc="mean", sort=True,
        )
        keys = sorted(map(str, wide.columns))
        wide.columns = [str(c) for c in wide.columns]
        rows = []
        for i in range(len(keys)):
            xi = wide[keys[i]].to_numpy(dtype=np.float64)
            for j in range(i + 1, len(keys)):
                yj = wide[keys[j]].to_numpy(dtype=np.float64)
                m = ~(np.isnan(xi) | np.isnan(yj))
                if not m.any():
                    continue
                x, y = xi[m], yj[m]
                rows.append((keys[i], keys[j], int(m.sum()),
                             x.sum(), y.sum(), (x * x).sum(),
                             (y * y).sum(), (x * y).sum()))
        return pd.DataFrame(
            rows, columns=["k1", "k2", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    parts = hash_partitioned_map(
        series.select_columns([key_col, ts_col, value_col]), [ts_col],
        partial, num_partitions=num_partitions, batch_format="pandas",
    )

    acc: dict[tuple[str, str], np.ndarray] = {}
    for rb in parts.iter_batches(batch_format="pandas"):
        for row in rb.itertuples(index=False):
            k = (row.k1, row.k2)
            v = np.array([row.n, row.sx, row.sy, row.sxx, row.syy, row.sxy])
            acc[k] = acc.get(k, 0) + v

    out_k1, out_k2, out_n, out_r = [], [], [], []
    for (k1, k2) in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[(k1, k2)]
        n = int(n)
        num = n * sxy - sx * sy
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r = num / np.sqrt(den2) if (n >= 2 and den2 > 0) else None
        out_k1.append(k1)
        out_k2.append(k2)
        out_n.append(n)
        out_r.append(None if r is None else float(r))
    return pa.table({
        "k1": pa.array(out_k1, pa.string()),
        "k2": pa.array(out_k2, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "r": pa.array(out_r, pa.float64()),
    })
