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
    correlation over co-present buckets (null when undefined).

    Input contract: ONE row per (key, bucket) — a compact series such as a
    rollup tier, the shape the SQL bucket-equality self-join oracle
    assumes. Duplicate (key, bucket) rows would be mean-collapsed by the
    pivot while SQL corr weights every duplicate row combination, so they
    raise instead of silently diverging."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna() & df[value_col].notna()]
        if df.duplicated(subset=[key_col, ts_col]).any():
            raise ValueError(
                "pairwise_corr input must be unique per (key, bucket); "
                "pre-aggregate the series (e.g. a rollup tier) first"
            )
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


def trend_slope(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    x_scale: float = 3_600_000_000.0,
    num_partitions: int | None = None,
) -> pa.Table:
    """Per-key OLS trend of value over time: ``(key, n, slope,
    intercept)`` — SQL ``regr_slope/regr_intercept(y, x)`` semantics
    (rows with a null on either side dropped; n < 2 or zero x-variance →
    NULL slope).

    x is ``(ts - per-key min ts) / x_scale`` (default µs→hours): raw-µs
    regressors put x² near 1e30 where float64 sufficient stats lose the
    answer to cancellation, and a per-µs slope rounds to 0 at 6 decimals.
    The shift does not change the slope and keeps every moment well
    scaled; the intercept is reported at the key's own first bucket
    (x = 0), matching the oracle that applies the same shift.

    ONE key-hash exchange co-locates each key; the whole fit is then local
    (centered closed form, numerically stable) and one tiny row per key
    returns to the driver. Same compact-series contract as pairwise_corr.
    """

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna() & df[value_col].notna()
                & df[ts_col].notna()]
        if len(df) == 0:
            return pd.DataFrame({
                "key": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "slope": pd.Series([], dtype=np.float64),
                "intercept": pd.Series([], dtype=np.float64),
            })
        rows = []
        for k, sub in df.groupby(key_col, sort=False):
            x = (sub[ts_col].to_numpy(np.int64)
                 - int(sub[ts_col].min())) / x_scale
            y = sub[value_col].to_numpy(np.float64)
            n = len(x)
            xm = x - x.mean()
            sxx = float((xm * xm).sum())
            if n < 2 or sxx == 0.0:
                rows.append((str(k), n, None, None))
                continue
            slope = float((xm * (y - y.mean())).sum()) / sxx
            rows.append((str(k), n, slope, float(y.mean() - slope * x.mean())))
        return pd.DataFrame(rows, columns=["key", "n", "slope", "intercept"])

    parts = hash_partitioned_map(
        series.select_columns([key_col, ts_col, value_col]), [key_col],
        fit, num_partitions=num_partitions, batch_format="pandas",
    )
    out = []
    for rb in parts.iter_batches(batch_format="pandas"):
        out.append(rb)
    res = (pd.concat(out, ignore_index=True) if out
           else pd.DataFrame(columns=["key", "n", "slope", "intercept"]))
    res = res.sort_values("key").reset_index(drop=True)
    return pa.table({
        key_col: pa.array(res["key"].tolist(), pa.string()),
        "n": pa.array(res["n"].astype(np.int64).tolist(), pa.int64()),
        "slope": pa.array(
            [None if pd.isna(v) else float(v) for v in res["slope"]],
            pa.float64()),
        "intercept": pa.array(
            [None if pd.isna(v) else float(v) for v in res["intercept"]],
            pa.float64()),
    })


def autocorr(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    lag: int = 1,
    num_partitions: int | None = None,
) -> pa.Table:
    """Per-key lag-``lag`` autocorrelation of an ordered series (SQL
    ``corr(x, LAG(x, lag))`` row semantics — ROW lag, not time lag) →
    small ``(key, n, acf)`` table; NULL when fewer than 2 pairs or zero
    variance on either side. Same one-exchange compact-series shape as
    trend_slope.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna()]
        rows = []
        for k, sub in df.groupby(key_col, sort=False):
            sub = sub.sort_values(ts_col, kind="stable")
            x = sub[value_col].to_numpy(np.float64)
            if len(x) <= lag:
                rows.append((str(k), 0, None))
                continue
            a, b = x[lag:], x[:-lag]
            m = ~(np.isnan(a) | np.isnan(b))
            a, b = a[m], b[m]
            n = len(a)
            if n < 2:
                rows.append((str(k), n, None))
                continue
            am, bm = a - a.mean(), b - b.mean()
            den2 = (am * am).sum() * (bm * bm).sum()
            acf = float((am * bm).sum() / np.sqrt(den2)) if den2 > 0 else None
            rows.append((str(k), n, acf))
        return pd.DataFrame(rows, columns=["key", "n", "acf"])

    parts = hash_partitioned_map(
        series.select_columns([key_col, ts_col, value_col]), [key_col],
        fit, num_partitions=num_partitions, batch_format="pandas",
    )
    out = []
    for rb in parts.iter_batches(batch_format="pandas"):
        out.append(rb)
    res = (pd.concat(out, ignore_index=True) if out
           else pd.DataFrame(columns=["key", "n", "acf"]))
    res = res.sort_values("key").reset_index(drop=True)
    return pa.table({
        key_col: pa.array(res["key"].tolist(), pa.string()),
        "n": pa.array(res["n"].astype(np.int64).tolist(), pa.int64()),
        "acf": pa.array(
            [None if pd.isna(v) else float(v) for v in res["acf"]],
            pa.float64()),
    })
