"""Time-series operators Ray Data lacks natively: as-of join and sliding
windows (build-brief "custom operators" — composition of hash-partitioned
co-location + per-key vectorized pandas, per the (a)-path in the brief).

Partitioning assumption (documented per the brief): all rows of one key
co-locate via the key hash; each key's series fits one task's memory
(series = rollup points / right-side lookups, orders of magnitude smaller
than events). For larger series, range-partition time within key and carry
boundary rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ._shuffle import hash_partitioned_map


def _pa_type(t) -> pa.DataType:
    """Dataset.schema() may be a PandasBlockSchema whose .types are numpy
    dtypes / classes, not Arrow DataTypes — normalize (shared by the
    schema-padding joins)."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == np.dtype(object):  # pandas object column == strings here
        return pa.string()
    return pa.from_numpy_dtype(dt)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    right_value_cols: list[str],
    num_partitions: int | None = None,
    direction: str = "backward",
) -> ray.data.Dataset:
    """For every left row: attach the matching right row of the same key —
    ``backward`` (latest right_ts <= left_ts, the default), ``forward``
    (earliest right_ts >= left_ts; DuckDB ``ASOF JOIN ON l.ts <= r.ts``),
    or ``nearest`` (smallest |right_ts - left_ts|, ties to the earlier row
    — pd.merge_asof semantics, no SQL analog).

    Both sides are tagged, unioned, co-located by key hash, and merged
    per-partition with ``pd.merge_asof`` per key — one shuffle total.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    l_schema = left.schema()
    r_schema = right.schema()
    lcols = l_schema.names
    clash = sorted(set([right_ts_col, *right_value_cols]) & set(lcols))
    if clash:
        # merge_asof would silently suffix colliding names (_x/_y) and the
        # typed output would miss them — loud error, like interval_join
        raise ValueError(
            f"right columns {clash} collide with left columns; rename the "
            "right side before joining"
        )
    rcols = [key_col, right_ts_col, *right_value_cols]
    types = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    types.update({n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)})
    all_cols = lcols + [c for c in rcols if c not in lcols]
    out_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: int, cols: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select([c for c in cols if c in b.column_names])
            # pad to the union schema with typed nulls so both branches match
            for c in all_cols:
                if c not in b.column_names:
                    b = b.append_column(c, pa.nulls(len(b), type=types[c]))
            b = b.select(all_cols)
            return b.append_column(
                "__side", pa.array(np.full(len(b), side, dtype=np.int8))
            )

        return fn

    both = left.map_batches(tag(0, lcols), batch_format="pyarrow").union(
        right.map_batches(tag(1, rcols), batch_format="pyarrow")
    )

    def typed(out: pd.DataFrame | None) -> pa.Table:
        # explicit arrow types per column (cf. interval_join): pandas
        # partitions that held nulls float-coerce int64 columns, and
        # per-partition dtype drift would break the output schema merge
        if out is None:
            return pa.table({c: pa.array([], type=types[c]) for c in out_cols})
        return pa.table(
            {c: pa.array(out[c], type=types[c], from_pandas=True)
             for c in out_cols}
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        lraw = df[df["__side"] == 0][lcols]
        # SQL LEFT semantics: a null left ts matches nothing but the row
        # is KEPT (right columns null) — and it must not reach the int64
        # cast below
        null_l = lraw[lraw[left_ts_col].isna()]
        l = lraw.dropna(subset=[left_ts_col]).sort_values(
            left_ts_col, kind="stable"
        )
        if len(l) == 0 and len(null_l) == 0:
            return typed(None)
        # the union pads each side with nulls -> pandas promotes int64
        # columns to float64; restore int dtypes on the null-free side
        l = l.copy()
        l[left_ts_col] = l[left_ts_col].astype(np.int64)
        r = (
            df[df["__side"] == 1][rcols]
            .dropna(subset=[right_ts_col])
            .sort_values(right_ts_col, kind="stable")
        )
        r[right_ts_col] = r[right_ts_col].astype(np.int64)
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts_col,
            right_on=right_ts_col,
            by=key_col,
            direction=direction,
        )
        if len(null_l):
            out = pd.concat(
                [out, null_l.reindex(columns=out.columns)],
                ignore_index=True,
            )
        return typed(out)

    return hash_partitioned_map(
        both, [key_col], merge, num_partitions=num_partitions, batch_format="pandas"
    )


def sessionize(
    events: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    gap_us: int,
    order_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_us``; one output row per session: ``(user, session_id,
    session_start_us, session_end_us, n_events)``.

    Classic web-scale log operator (the events table's analog of grouping
    spans into traces). Determinism: events ordered by ``(ts, order_col)``
    per user, ``session_id`` is the 1-based ordinal within the user.
    Partitioning assumption (same as asof_join above): one user's events
    fit one task — enforced by the hash co-location on ``user_col``.
    """

    def sess(t: pa.Table) -> pa.Table:
        # arrow in/out so the user column keeps its EXACT input type: a
        # pandas partition holding null int64 users would coerce to
        # float64 while null-free partitions stay int64, and the merged
        # Dataset schema would conflict (caught by the null-variant gate)
        utype = t.schema.field(user_col).type

        def out(users, session_id, start, end, n) -> pa.Table:
            return pa.table(
                {
                    user_col: pa.array(users, type=utype, from_pandas=True),
                    "session_id": pa.array(session_id, pa.int64()),
                    "session_start_us": pa.array(start, pa.int64()),
                    "session_end_us": pa.array(end, pa.int64()),
                    "n_events": pa.array(n, pa.int64()),
                }
            )

        if len(t) == 0:
            z = np.array([], dtype=np.int64)
            return out(z, z, z, z, z)
        df = t.to_pandas()
        u_raw = df[user_col]
        # use_na_sentinel=False: null users form their own group instead of
        # the -1 sentinel wrapping onto the last real user's label
        codes, uniques = pd.factorize(u_raw, sort=False, use_na_sentinel=False)
        ts = df[ts_col].to_numpy().astype(np.int64)
        ordv = df[order_col].to_numpy()
        order = np.lexsort((ordv, ts, codes))
        cs, tss = codes[order], ts[order]
        brk = np.empty(len(cs), dtype=bool)
        brk[0] = True
        brk[1:] = (cs[1:] != cs[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(cs)]]) - 1
        su = cs[starts]
        new_user = np.empty(len(su), dtype=bool)
        new_user[0] = True
        new_user[1:] = su[1:] != su[:-1]
        user_first = np.flatnonzero(new_user)
        reps = np.diff(np.append(user_first, len(su)))
        session_id = np.arange(len(su), dtype=np.int64) - np.repeat(
            user_first, reps
        ) + 1
        return out(
            np.asarray(uniques)[su],
            session_id,
            tss[starts],
            tss[ends],
            (ends - starts + 1).astype(np.int64),
        )

    cols = [user_col, ts_col, order_col]
    return hash_partitioned_map(
        events.select_columns(cols), [user_col], sess,
        num_partitions=num_partitions, batch_format="pyarrow",
    )


def interval_join(
    events: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    interval_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Range join (the brief's named custom operator alongside as-of):
    for every interval row, emit one output row per event of the same key
    with ``lo <= ts <= hi`` (inclusive BETWEEN; overlapping intervals
    fan events out). Output: event columns + ``interval_cols``.

    Both sides co-locate via ONE hash exchange on the key; per partition
    the match is two vectorized ``searchsorted`` calls against the
    (key, ts)-sorted events (a composite key-offset transform makes the
    pair ordering a single 1-D search) and a ranges-concat expansion —
    no per-interval Python. Partitioning assumption as for asof_join:
    one key's rows fit one task.
    """
    e_schema = events.schema()
    ecols = e_schema.names
    clash = sorted(set(interval_cols) & set(ecols))
    if clash:
        # the output keeps event columns by name; a same-named interval
        # column would be silently dropped — make it a loud error
        raise ValueError(
            f"interval_cols {clash} collide with event columns; rename the "
            "interval side (e.g. select with a suffix) before joining"
        )
    rcols = [key_col, lo_col, hi_col, *interval_cols]

    types = {n: _pa_type(t) for n, t in zip(e_schema.names, e_schema.types)}
    r_schema = intervals.schema()
    types.update({n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)})
    all_cols = ecols + [c for c in rcols if c not in ecols]

    def tag(side: int, cols: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select([c for c in cols if c in b.column_names])
            for c in all_cols:
                if c not in b.column_names:
                    b = b.append_column(c, pa.nulls(len(b), type=types[c]))
            b = b.select(all_cols)
            return b.append_column(
                "__side", pa.array(np.full(len(b), side, dtype=np.int8))
            )

        return fn

    both = events.map_batches(tag(0, ecols), batch_format="pyarrow").union(
        intervals.map_batches(tag(1, rcols), batch_format="pyarrow")
    )

    out_cols = ecols + [c for c in interval_cols if c not in ecols]

    def typed(out: pd.DataFrame | None) -> pa.Table:
        # explicit arrow types per column: pandas partitions that held
        # nulls float-coerce int64 columns, and per-partition dtype drift
        # would break the output schema merge (null-gate trap)
        if out is None:
            return pa.table({c: pa.array([], type=types[c]) for c in out_cols})
        return pa.table(
            {c: pa.array(out[c], type=types[c], from_pandas=True)
             for c in out_cols}
        )

    def match(df: pd.DataFrame) -> pa.Table:
        # SQL join semantics: a NULL key equals nothing, so null-key rows
        # on either side match nothing (they still hash-route together,
        # but are dropped here)
        ev = df[df["__side"] == 0].dropna(subset=[ts_col, key_col])
        iv = df[df["__side"] == 1].dropna(subset=[lo_col, hi_col, key_col])
        if len(ev) == 0 or len(iv) == 0:
            return typed(None)
        # shared key codes across both sides
        codes, _ = pd.factorize(
            pd.concat([ev[key_col], iv[key_col]], ignore_index=True),
            sort=False, use_na_sentinel=False,
        )
        ek, ik = codes[: len(ev)].astype(np.int64), codes[len(ev):].astype(np.int64)
        ets = ev[ts_col].to_numpy().astype(np.int64)
        lo = iv[lo_col].to_numpy().astype(np.int64)
        hi = iv[hi_col].to_numpy().astype(np.int64)
        # composite (key, ts) -> single sortable int64: rank-compress all
        # time values first (order-preserving, exact — every lo/hi/ts is
        # present in the rank table), so the per-key band is at most
        # (rows-in-partition + 1) wide and n_keys x band can never
        # overflow int64 regardless of the raw epoch range
        uniq = np.unique(np.concatenate([ets, lo, hi]))
        ets_r = np.searchsorted(uniq, ets)
        lo_r = np.searchsorted(uniq, lo)
        hi_r = np.searchsorted(uniq, hi)
        span = len(uniq) + 1
        ev_comp = ek * span + ets_r
        order = np.argsort(ev_comp, kind="stable")
        ev_sorted = ev_comp[order]
        start = np.searchsorted(ev_sorted, ik * span + lo_r, side="left")
        end = np.searchsorted(ev_sorted, ik * span + hi_r, side="right")
        # inverted intervals (hi < lo) match nothing; without the clamp
        # their negative counts would crash the repeat expansion
        cnt = np.maximum(end - start, 0)
        total = int(cnt.sum())
        if total == 0:
            return typed(None)
        iv_rep = np.repeat(np.arange(len(iv)), cnt)
        # concatenated ranges [start_i, end_i) per interval
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        ev_pos = order[np.repeat(start, cnt) + (np.arange(total) - np.repeat(offs, cnt))]
        out = ev.iloc[ev_pos][ecols].reset_index(drop=True)
        ivr = iv.iloc[iv_rep].reset_index(drop=True)
        for c in interval_cols:
            if c not in out.columns:
                out[c] = ivr[c].to_numpy()
        return typed(out[out_cols])

    return hash_partitioned_map(
        both, [key_col], match,
        num_partitions=num_partitions, batch_format="pandas",
    )


def topn_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    n: int,
    tiebreak_col: str,
    descending: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per key: the ``n`` rows with the largest (``descending=True``) /
    smallest ``value_col`` — the ROW_NUMBER()-per-partition window analog,
    tie-broken deterministically by ascending ``tiebreak_col``.

    Scale shape: each batch is pre-trimmed to its own per-key top-n
    (vectorized lexsort + group-ordinal mask) BEFORE the exchange, so the
    shuffle moves at most ``n x keys-per-batch`` rows, never the stream.
    The same trim runs once per hash partition for the final answer.
    """

    def trim(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        import pandas as pd_  # local alias: keep the pyarrow path lean

        codes, _ = pd_.factorize(t[key_col].to_pandas(), sort=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        tb = t[tiebreak_col].to_numpy(zero_copy_only=False)
        vkey = -v if descending else v
        order = np.lexsort((tb, vkey, codes))
        cs = codes[order]
        new = np.empty(len(cs), dtype=bool)
        new[0] = True
        new[1:] = cs[1:] != cs[:-1]
        # ordinal within key along the sorted order
        starts = np.flatnonzero(new)
        reps = np.diff(np.append(starts, len(cs)))
        ordinal = np.arange(len(cs)) - np.repeat(starts, reps)
        keep_sorted = order[ordinal < n]
        return t.take(pa.array(np.sort(keep_sorted)))

    trimmed = ds.map_batches(trim, batch_format="pyarrow")
    return hash_partitioned_map(
        trimmed, [key_col], trim,
        num_partitions=num_partitions, batch_format="pyarrow",
    )


def ewma(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per key, ordered by ``ts_col``: exponentially-weighted moving
    average with ``y[0] = x[0]``, ``y[t] = (1-α)·y[t-1] + α·x[t]``
    (``pd.Series.ewm(adjust=False)`` recursion). Adds ``{value_col}_ewma``.

    The smoothing/downsampling companion of the rollup tiers (north-rule
    continuous-aggregate family). Same co-location contract as
    :func:`sliding_window`: one key's series fits one task.
    """

    def smooth(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        # dropna=False: a null key is a REAL group (module-wide policy —
        # sessionize/ohlc/histogram all smooth null keys as their own
        # series rather than emitting NaN)
        df[f"{value_col}_ewma"] = (
            df.groupby(key_col, sort=False, dropna=False)[value_col]
            .transform(lambda s: s.astype(np.float64).ewm(
                alpha=alpha, adjust=False).mean())
        )
        return df

    return hash_partitioned_map(
        series, [key_col], smooth,
        num_partitions=num_partitions, batch_format="pandas",
    )


def sliding_window(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    window: int,
    agg: str = "sum",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per key, ordered by ``ts_col``: rolling aggregate over the previous
    ``window`` rows (inclusive) — ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW. Output adds ``{col}_w{window}_{agg}`` columns."""

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # dropna=False: a null key is a REAL group (module-wide policy —
        # see ewma); default dropna silently lost those rows and made a
        # null-key-only partition crash on pd.concat([])
        for _, g in df.groupby(key_col, sort=False, dropna=False):
            g = g.sort_values(ts_col, kind="stable").copy()
            for c in value_cols:
                r = g[c].rolling(window, min_periods=1)
                g[f"{c}_w{window}_{agg}"] = getattr(r, agg)()
            outs.append(g)
        if not outs:
            out = df.copy()
            for c in value_cols:
                out[f"{c}_w{window}_{agg}"] = pd.Series([], dtype=np.float64)
            return out
        return pd.concat(outs, ignore_index=True)

    return hash_partitioned_map(
        series, [key_col], roll, num_partitions=num_partitions, batch_format="pandas"
    )


def rolling_zscore(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int,
    min_periods: int = 3,
    threshold: float = 2.0,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per key, ordered by ``ts_col``: z-score of each point against the
    TRAILING window of the previous ``window`` values — the baseline never
    includes the observation it judges (SQL frame ``ROWS BETWEEN window
    PRECEDING AND 1 PRECEDING``). Adds ``{value_col}_mu``,
    ``{value_col}_sd`` (sample std, ddof=1 = SQL STDDEV_SAMP),
    ``{value_col}_z`` and ``is_anomaly`` (|z| > threshold; False wherever z
    is undefined: fewer than ``min_periods`` baseline points, or zero
    baseline variance).

    The anomaly-flagging companion of the rollup tiers (north-rule
    monitoring family — flag a bucket whose count/mean breaks from its own
    recent history). Input is a rollup series (points ∝ keys x buckets),
    not raw events; same co-location contract as :func:`sliding_window`.
    """
    mu_c, sd_c, z_c = f"{value_col}_mu", f"{value_col}_sd", f"{value_col}_z"

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        df["_x"] = df[value_col].astype(np.float64)
        # shift(1) then rolling(window): position k's frame holds original
        # rows k-window..k-1 — exactly the SQL trailing frame above.
        # min_periods counts non-NaN baseline points, so short histories
        # (group head) yield NaN = SQL NULL under the COUNT >= min gate.
        g = df.groupby(key_col, sort=False, dropna=False)
        df["_prev"] = g["_x"].shift(1)
        gp = df.groupby(key_col, sort=False, dropna=False)["_prev"]
        df[mu_c] = gp.transform(
            lambda s: s.rolling(window, min_periods=min_periods).mean()
        )
        df[sd_c] = gp.transform(
            lambda s: s.rolling(window, min_periods=min_periods).std(ddof=1)
        )
        z = (df["_x"] - df[mu_c]) / df[sd_c]
        z[~(df[sd_c] > 0)] = np.nan  # zero-variance baseline: undefined
        df[z_c] = z
        df["is_anomaly"] = z.abs().gt(threshold)  # NaN > τ is False
        return df.drop(columns=["_x", "_prev"])

    return hash_partitioned_map(
        series, [key_col], score,
        num_partitions=num_partitions, batch_format="pandas",
    )


def time_weighted_avg(
    events: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_us: int,
    order_col: str | None = None,
    num_partitions: int | None = None,
    input_bytes: int | None = None,
) -> ray.data.Dataset:
    """Per (key, floor-``width_us`` bucket): time-weighted mean of
    ``value_col`` — each sample weighted by its holding time until the NEXT
    sample of the same bucket (irregular sampling makes the plain mean
    over-count burst periods; TWA is the standard fix in timeseries tiers).
    The bucket's last sample carries no weight; a single-sample bucket
    emits no row; null values are dropped before neighbor pairing. Ties in
    ``ts_col`` are pinned by ``order_col`` and carry zero weight either
    way. Output: ``key_col, bucket_us, twa, n_weighted``.

    Weights never cross a bucket edge, so the exchange key is
    (key, bucket): unlike the per-key stages above, a hot key's history
    splits across buckets and partitions stay bounded at any corpus size —
    this one co-locates raw events, so the stronger key matters.
    """

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(t[value_col].is_valid())
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        b = (ts // width_us) * width_us
        return pa.table(
            {
                key_col: t[key_col],
                "bucket_us": pa.array(b, type=pa.int64()),
                ts_col: t[ts_col],
                value_col: t[value_col],
                **({order_col: t[order_col]} if order_col else {}),
            }
        )

    prepped = events.map_batches(prep, batch_format="pyarrow")
    sort_cols = [key_col, "bucket_us", ts_col] + (
        [order_col] if order_col else []
    )

    def twa(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=df[key_col].dtype),
                    "bucket_us": pd.Series([], dtype=np.int64),
                    "twa": pd.Series([], dtype=np.float64),
                    "n_weighted": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        nxt = df.groupby([key_col, "bucket_us"], sort=False, dropna=False)[
            ts_col
        ].shift(-1)
        # int64 µs < 2^53: the float64 round-trip through shift is exact
        dt = nxt - df[ts_col].astype(np.float64)
        m = dt.notna()
        sub = pd.DataFrame(
            {
                key_col: df[key_col][m],
                "bucket_us": df["bucket_us"][m],
                "_wv": df[value_col][m].astype(np.float64) * dt[m],
                "_w": dt[m],
            }
        )
        g = sub.groupby(
            [key_col, "bucket_us"], sort=False, dropna=False, as_index=False
        ).agg(_wv=("_wv", "sum"), _w=("_w", "sum"), n_weighted=("_w", "size"))
        out = g.assign(
            twa=np.where(g["_w"] > 0, g["_wv"] / np.where(g["_w"] > 0, g["_w"], 1.0), np.nan),
            n_weighted=g["n_weighted"].astype(np.int64),
        )
        return out[[key_col, "bucket_us", "twa", "n_weighted"]]

    return hash_partitioned_map(
        prepped, [key_col, "bucket_us"], twa,
        num_partitions=num_partitions, batch_format="pandas",
        input_bytes=input_bytes,
    )


def merge_intervals(
    intervals: ray.data.Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Merge overlapping-or-touching intervals per key (gaps-and-islands):
    one output row per maximal island — ``(key, island_id, start_us,
    end_us, n_merged)``, island_id 1-based per key in start order.

    Touching merges: an interval starting exactly at the running max end
    joins the island (s <= prev_max), matching the SQL ``s > MAX(e) OVER
    (... 1 PRECEDING)`` break rule. Null keys form their own group
    (module-wide policy). Partitioning: one key's intervals fit one task
    (hash co-location on ``key_col``) — island state is inherently
    sequential per key, keys parallelize across partitions.

    Reference analog: the trace-window grouping in Joiner.py, generalized
    to arbitrary interval sets (session coverage, downtime windows).
    """

    def merge(t: pa.Table) -> pa.Table:
        # arrow in/out keeps the key column's EXACT input type across
        # partitions (pandas would float-coerce int64 keys in partitions
        # holding nulls — the schema-merge trap the null gate catches)
        ktype = t.schema.field(key_col).type

        def out(keys, island_id, start, end, n) -> pa.Table:
            return pa.table(
                {
                    key_col: pa.array(keys, type=ktype, from_pandas=True),
                    "island_id": pa.array(island_id, pa.int64()),
                    "start_us": pa.array(start, pa.int64()),
                    "end_us": pa.array(end, pa.int64()),
                    "n_merged": pa.array(n, pa.int64()),
                }
            )

        if len(t) == 0:
            z = np.array([], dtype=np.int64)
            return out(z, z, z, z, z)
        df = t.to_pandas()
        codes, uniques = pd.factorize(
            df[key_col], sort=False, use_na_sentinel=False
        )
        s = df[start_col].to_numpy().astype(np.int64)
        e = df[end_col].to_numpy().astype(np.int64)
        order = np.lexsort((e, s, codes))
        cs, ss, es = codes[order], s[order], e[order]
        # reset-aware running max end per key (C-level grouped cummax)
        cummax = pd.Series(es).groupby(cs).cummax().to_numpy()
        prev = pd.Series(cummax).groupby(cs).shift(1).to_numpy()
        brk = np.isnan(prev) | (ss > prev)  # key's first row always breaks
        starts_idx = np.flatnonzero(brk)
        end_idx = np.append(starts_idx[1:], len(cs)) - 1
        su = cs[starts_idx]
        new_key = np.empty(len(su), dtype=bool)
        new_key[0] = True
        new_key[1:] = su[1:] != su[:-1]
        key_first = np.flatnonzero(new_key)
        reps = np.diff(np.append(key_first, len(su)))
        island_id = np.arange(len(su), dtype=np.int64) - np.repeat(
            key_first, reps
        ) + 1
        return out(
            np.asarray(uniques)[su],
            island_id,
            ss[starts_idx],
            cummax[end_idx].astype(np.int64),
            np.diff(np.append(starts_idx, len(cs))).astype(np.int64),
        )

    cols = [key_col, start_col, end_col]
    return hash_partitioned_map(
        intervals.select_columns(cols), [key_col], merge,
        num_partitions=num_partitions, batch_format="pyarrow",
    )


def rolling_quantile(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    q: float,
    window: int,
    out_col: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per key, ordered by ``ts_col``: EXACT discrete quantile of the
    trailing ``window`` rows INCLUDING the current one (SQL frame ``ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW``), quantile_disc semantics
    ``sorted[ceil(q*w)-1]`` where ``w`` counts the frame's non-null values
    (partial head windows included, like the SQL window function).

    Not pandas ``rolling().quantile(interpolation='lower')`` — that is
    ``floor(q*(w-1))``, which diverges from quantile_disc whenever
    ``frac(q*w) < q`` (e.g. q=0.9, w=9). Implemented as a per-key
    ``sliding_window_view`` + row-sort: O(n * window log window) flat
    numpy, no Python loop over rows. Same co-location + compact-series
    contract as :func:`rolling_zscore`.
    """
    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1], got {q}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    out_c = out_col or f"{value_col}_q{int(round(q * 100))}"

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        if len(df) == 0:
            df[out_c] = pd.Series([], dtype=np.float64)
            return df
        from numpy.lib.stride_tricks import sliding_window_view

        codes, _ = pd.factorize(df[key_col], sort=False,
                                use_na_sentinel=False)
        x = df[value_col].to_numpy().astype(np.float64)
        out = np.empty(len(x), dtype=np.float64)
        for c in np.unique(codes):  # loop over KEYS (compact), not rows
            m = codes == c
            xv = x[m]
            arr = np.concatenate([np.full(window - 1, np.nan), xv])
            sw = sliding_window_view(arr, window)
            srt = np.sort(sw, axis=1)  # NaN sorts last
            w_eff = (~np.isnan(sw)).sum(axis=1)
            # 1e-9 guard: the double product can land a hair ABOVE an
            # exact integer (0.07*100 == 7.000000000000001), which would
            # ceil to the next order statistic and break quantile_disc
            idx = np.maximum(
                np.ceil(q * w_eff - 1e-9).astype(np.int64) - 1, 0
            )
            vals = srt[np.arange(len(xv)), np.minimum(idx, window - 1)]
            vals[w_eff == 0] = np.nan
            out[m] = vals
        df[out_c] = out
        return df

    return hash_partitioned_map(
        series, [key_col], roll,
        num_partitions=num_partitions, batch_format="pandas",
    )


def cusum(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_sd: float = 0.5,
    h_sd: float = 5.0,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Two-sided CUSUM changepoint statistic per key over an ordered
    series (Page 1954): with per-key baseline ``mu``/``sd`` (sample std
    over the whole series) and slack ``kappa = k_sd * sd``,

        s+_t = max(0, s+_{t-1} + (x_t - mu) - kappa)
        s-_t = max(0, s-_{t-1} + (mu - x_t) - kappa)

    flagged ``is_change`` when either side exceeds ``h_sd * sd``. Keys
    with undefined sd (fewer than 2 points) yield null statistics and
    False flags.

    The clamped recursion is computed WITHOUT a sequential loop via the
    reflection identity ``s_t = c_t - min(0, min_{j<=t} c_j)`` (c = prefix
    sum of the drift terms) — grouped cumsum + cummin, all C-level. One
    key-hash exchange co-locates each key, which also makes the per-key
    baseline local (no second pass); same compact-series contract as
    rolling_zscore.
    """
    sp_c, sm_c = f"{value_col}_cusum_pos", f"{value_col}_cusum_neg"

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        if len(df) == 0:
            df[sp_c] = pd.Series([], dtype=np.float64)
            df[sm_c] = pd.Series([], dtype=np.float64)
            df["is_change"] = pd.Series([], dtype=bool)
            return df
        g = df.groupby(key_col, sort=False, dropna=False)
        x = df[value_col].astype(np.float64)
        mu = g[value_col].transform("mean").astype(np.float64)
        sd = g[value_col].transform(lambda s: s.std(ddof=1))
        kappa = k_sd * sd
        for drift, col in (((x - mu) - kappa, sp_c),
                           ((mu - x) - kappa, sm_c)):
            d = pd.DataFrame({"k": df[key_col], "d": drift})
            gd = d.groupby("k", sort=False, dropna=False)["d"]
            c = gd.cumsum()
            run_min = pd.DataFrame({"k": df[key_col], "c": c}).groupby(
                "k", sort=False, dropna=False)["c"].cummin()
            df[col] = c - np.minimum(run_min, 0.0)
        h = h_sd * sd
        df["is_change"] = ((df[sp_c] > h) | (df[sm_c] > h)).fillna(
            False).astype(bool)
        return df

    return hash_partitioned_map(
        series, [key_col], score,
        num_partitions=num_partitions, batch_format="pandas",
    )


def seasonal_decompose(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int,
    width_us: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Classical additive seasonal decomposition per key over a rollup
    series: ``value = trend + seasonal + remainder``.

    - ``trend``: centered ``period``-row moving average (frame
      ``period//2 - 1 PRECEDING .. period//2 FOLLOWING`` for even periods,
      symmetric for odd), defined only where the frame holds a full
      ``period`` rows — row-frame semantics, identical to the SQL window.
    - ``seasonal``: per (key, phase) mean of the detrended values, phase =
      ``(ts // width_us) % period`` (hour-of-day for a 1h/24 series);
      null where the phase never has a defined trend.
    - ``remainder``: value - trend - seasonal.

    One key-hash exchange; the trend is a cumsum difference per key and
    the seasonal index a grouped mean — all C-level, loop only over
    compact keys. The phase join-back is a local merge, not a shuffle.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    before = (period - 1) // 2 if period % 2 else period // 2 - 1
    after = period - 1 - before

    def decomp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        n = len(df)
        trend = np.full(n, np.nan)
        if n:
            codes, _ = pd.factorize(df[key_col], sort=False,
                                    use_na_sentinel=False)
            x = df[value_col].to_numpy().astype(np.float64)
            for c in np.unique(codes):
                idx = np.flatnonzero(codes == c)
                xv = x[idx]
                m = len(xv)
                if m < period:
                    continue
                csum = np.concatenate([[0.0], np.cumsum(xv)])
                # window [i-before, i+after] valid for before<=i<m-after
                i0, i1 = before, m - after
                trend[idx[i0:i1]] = (
                    csum[i0 + after + 1 : i1 + after + 1]
                    - csum[i0 - before : i1 - before]
                ) / period
        df["trend"] = trend
        phase = (
            df[ts_col].to_numpy().astype(np.int64) // width_us
        ) % period
        df["_phase"] = phase
        detr = df[value_col].astype(np.float64) - df["trend"]
        df["_detr"] = detr
        seas = (
            df[df["trend"].notna()]
            .groupby([key_col, "_phase"], sort=False, dropna=False)["_detr"]
            .mean()
            .rename("seasonal")
        )
        df = df.merge(seas, how="left",
                      left_on=[key_col, "_phase"], right_index=True)
        df["remainder"] = (
            df[value_col].astype(np.float64) - df["trend"] - df["seasonal"]
        )
        return df.drop(columns=["_phase", "_detr"])

    return hash_partitioned_map(
        series, [key_col], decomp,
        num_partitions=num_partitions, batch_format="pandas",
    )


def percent_rank(
    rows: ray.data.Dataset,
    key_col: str,
    value_col: str,
    out_col: str = "pct_rank",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SQL ``PERCENT_RANK() OVER (PARTITION BY key ORDER BY value)``:
    (min-rank - 1) / (n - 1) within each key, ties sharing the min rank,
    nulls ranked LAST as one tie group (DuckDB's default NULLS LAST), and
    0.0 for single-row keys (the SQL convention for the 0/0 frame).

    Distributed rank without a global sort: ONE key-hash exchange
    co-locates each key; ranking is a grouped C-level ``rank(method='min',
    na_option='bottom')`` in-partition. The exchange carries only the
    projected columns, so callers should select before ranking.
    """

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df[out_col] = pd.Series([], dtype=np.float64)
            return df
        g = df.groupby(key_col, sort=False, dropna=False)
        r = g[value_col].rank(method="min", na_option="bottom")
        n = g[value_col].transform("size").astype(np.float64)
        pr = (r - 1.0) / (n - 1.0)
        df[out_col] = np.where(n > 1, pr, 0.0)
        return df

    return hash_partitioned_map(
        rows, [key_col], rank,
        num_partitions=num_partitions, batch_format="pandas",
    )


def running_record(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """New-high-watermark detection per key: adds ``prev_max`` (running max
    of all STRICTLY EARLIER rows — SQL ``MAX(v) OVER (... ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)``) and ``is_record`` (value > prev_max;
    each key's first row is a record by convention, matching
    ``COALESCE(v > prev_max, TRUE)``). Null values are never records and
    do not raise the watermark (SQL MAX ignores NULLs).

    Grouped cummax + shift after the one key exchange — the same
    vectorized sweep as merge_intervals.
    """

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        if len(df) == 0:
            df["prev_max"] = pd.Series([], dtype=np.float64)
            df["is_record"] = pd.Series([], dtype=bool)
            return df
        g = df.groupby(key_col, sort=False, dropna=False)
        # cummax leaves NaN AT null rows (they don't poison later values,
        # but they'd leak through shift) — forward-fill within the key so
        # prev_max is the max over all earlier NON-NULL values, like SQL
        cm = g[value_col].cummax()
        tmp = pd.DataFrame({"k": df[key_col], "c": cm})
        gc = tmp.groupby("k", sort=False, dropna=False)["c"]
        df["prev_max"] = gc.ffill().groupby(
            tmp["k"], sort=False, dropna=False).shift(1)
        cmpv = df[value_col] > df["prev_max"]
        df["is_record"] = np.where(
            df["prev_max"].isna(), df[value_col].notna(), cmpv
        )
        return df

    return hash_partitioned_map(
        series, [key_col], flag,
        num_partitions=num_partitions, batch_format="pandas",
    )


def holt_smooth(
    series: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Holt linear (double-exponential) smoothing per key, ordered by
    ``ts_col``: level ``l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})``, trend
    ``b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}``, initialized ``l_1 = x_1,
    b_1 = 0``. Adds ``level``, ``trend`` and ``forecast_next`` (= l + b,
    the one-step-ahead prediction). Null values must be dropped by the
    caller (a rollup count series has none).

    Unlike EWMA (a pure convolution) the coupled level/trend recursion has
    no stable closed form over long series (the eigen-decomposed variant
    under/overflows past ~1e3 steps), so each key runs a plain loop —
    bounded by the compact-series contract (points ∝ keys x buckets), and
    keys parallelize across partitions as everywhere in this module.
    """
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0):
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1, got {alpha}, {beta}")

    def smooth(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable").reset_index(
            drop=True
        )
        n = len(df)
        lvl = np.empty(n, dtype=np.float64)
        trd = np.empty(n, dtype=np.float64)
        if n:
            codes, _ = pd.factorize(df[key_col], sort=False,
                                    use_na_sentinel=False)
            x = df[value_col].to_numpy().astype(np.float64)
            for c in np.unique(codes):  # loop over compact keys
                idx = np.flatnonzero(codes == c)
                l_p = x[idx[0]]
                b_p = 0.0
                lvl[idx[0]], trd[idx[0]] = l_p, b_p
                for i in idx[1:]:  # sequential by construction
                    l_n = alpha * x[i] + (1 - alpha) * (l_p + b_p)
                    b_p = beta * (l_n - l_p) + (1 - beta) * b_p
                    l_p = l_n
                    lvl[i], trd[i] = l_p, b_p
        df["level"] = lvl
        df["trend"] = trd
        df["forecast_next"] = lvl + trd
        return df

    return hash_partitioned_map(
        series, [key_col], smooth,
        num_partitions=num_partitions, batch_format="pandas",
    )


def interarrival_stats(
    events: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    order_col: str,
    qs: tuple = (0.5, 0.95),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key inter-arrival gap statistics: consecutive-event time deltas
    (ordered by ``(ts, order_col)``; SQL ``ts - LAG(ts)``) reduced to
    ``(key, n_gaps, mean_gap_us, q<q>_gap_us ...)``, quantile_disc
    semantics per gap quantile. Keys with < 2 events emit n_gaps = 0 and
    null stats.

    One key exchange of the projected columns; gaps and their order
    statistics are computed in-key (lexsort + diff + np.partition) — the
    arrival-process profile of the north rule's irregular-sampling family
    (the distribution behind gapfill's gaps).
    """

    k_schema = events.schema()
    ktype = _pa_type(dict(zip(k_schema.names, k_schema.types))[key_col])

    def stats(df: pd.DataFrame) -> pa.Table:
        # arrow-typed output (cf. sessionize): a partition holding a null
        # int64 key float-coerces in pandas; emitting with the declared
        # key type keeps per-partition schemas identical
        qcols = [f"q{int(round(q * 100))}_gap_us" for q in qs]

        def typed(keys, ngaps, means, qvals) -> pa.Table:
            cols_t = {
                key_col: pa.array(keys, type=ktype, from_pandas=True),
                "n_gaps": pa.array(ngaps, pa.int64()),
                "mean_gap_us": pa.array(means, pa.float64()),
            }
            for i, qc in enumerate(qcols):
                cols_t[qc] = pa.array(
                    [v[i] for v in qvals], pa.float64()
                )
            return pa.table(cols_t)

        if len(df) == 0:
            return typed([], [], [], [])
        codes, uniques = pd.factorize(df[key_col], sort=False,
                                      use_na_sentinel=False)
        ts = df[ts_col].to_numpy().astype(np.int64)
        ordv = df[order_col].to_numpy()
        order = np.lexsort((ordv, ts, codes))
        cs, tss = codes[order], ts[order]
        keys, ngaps, means, qvals = [], [], [], []
        for c in np.unique(codes):
            g = np.diff(tss[cs == c])  # int64: sum stays exact
            n = len(g)
            keys.append(uniques[c])
            ngaps.append(n)
            # mean as ONE double division of the exact integer sum — a
            # float-accumulated mean differs from SQL AVG in the last ulp,
            # which flips ROUND(x, 6) at 1e9-scale microsecond gaps
            means.append(int(g.sum()) / n if n else None)
            qv = []
            for q in qs:
                if n:
                    # ceil(q*n)-1 with the 1e-9 float-product guard
                    j = max(0, int(np.ceil(q * n - 1e-9)) - 1)
                    qv.append(float(np.partition(g, j)[j]))
                else:
                    qv.append(None)
            qvals.append(qv)
        return typed(keys, ngaps, means, qvals)

    cols = [key_col, ts_col, order_col]
    return hash_partitioned_map(
        events.select_columns(cols), [key_col], stats,
        num_partitions=num_partitions, batch_format="pandas",
    )
