"""asof_join + sliding_window unit tests (pd.merge_asof / rolling oracles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from contest_parsing_ray.stages.window import (
    asof_join,
    rolling_zscore,
    sliding_window,
    time_weighted_avg,
)


def test_asof_join_backward():
    left = pd.DataFrame(
        {"id": [1, 2, 3, 4], "k": ["a", "a", "b", "b"], "ts": [100, 250, 50, 70]}
    )
    right = pd.DataFrame({"k": ["a", "a", "b"], "rts": [90, 200, 60], "v": [7.0, 8.0, 9.0]})
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            key_col="k", left_ts_col="ts", right_ts_col="rts",
            right_value_cols=["v"], num_partitions=4,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", direction="backward",
    ).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "k", "ts", "rts", "v"]], want, check_dtype=False)
    # id=3: ts=50 < first right ts(60) -> unmatched
    assert np.isnan(got.set_index("id").loc[3, "v"])


def test_sliding_window_sum():
    s = pd.DataFrame(
        {"k": ["a"] * 4 + ["b"] * 2, "ts": [1, 2, 3, 4, 1, 2],
         "cnt": [1, 2, 3, 4, 10, 20]}
    )
    got = (
        sliding_window(
            ray.data.from_pandas(s), key_col="k", ts_col="ts",
            value_cols=["cnt"], window=3, num_partitions=4,
        )
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert got["cnt_w3_sum"].tolist() == [1, 3, 6, 9, 10, 30]


def test_rolling_zscore_trailing_baseline():
    # key "a": constant baseline then a spike; key "b": too short for a score
    s = pd.DataFrame(
        {"k": ["a"] * 5 + ["b"] * 2, "ts": [1, 2, 3, 4, 5, 1, 2],
         "v": [10.0, 10.0, 12.0, 10.0, 50.0, 1.0, 2.0]}
    )
    got = (
        rolling_zscore(
            ray.data.from_pandas(s), key_col="k", ts_col="ts", value_col="v",
            window=4, min_periods=3, threshold=2.0, num_partitions=4,
        )
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    a = got[got["k"] == "a"].reset_index(drop=True)
    # rows 0-2: fewer than min_periods baseline points -> undefined
    assert a["v_z"].isna().tolist()[:3] == [True, True, True]
    # row 3: baseline [10,10,12] -> mu=32/3, sd>0; defined but not anomalous
    assert abs(a.loc[3, "v_mu"] - 32.0 / 3.0) < 1e-12
    assert not a.loc[3, "is_anomaly"]
    # row 4: 50 vs baseline [10,10,12,10] -> way out
    base = np.array([10.0, 10.0, 12.0, 10.0])
    z = (50.0 - base.mean()) / base.std(ddof=1)
    assert abs(a.loc[4, "v_z"] - z) < 1e-12 and a.loc[4, "is_anomaly"]
    # short key: never scored, never anomalous
    b = got[got["k"] == "b"]
    assert b["v_z"].isna().all() and (~b["is_anomaly"]).all()


def test_rolling_zscore_zero_variance_baseline():
    s = pd.DataFrame(
        {"k": ["a"] * 5, "ts": [1, 2, 3, 4, 5], "v": [7.0, 7.0, 7.0, 7.0, 99.0]}
    )
    got = (
        rolling_zscore(
            ray.data.from_pandas(s), key_col="k", ts_col="ts", value_col="v",
            window=4, min_periods=3, threshold=2.0, num_partitions=2,
        )
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    # constant baseline: sd=0 -> z undefined, anomaly False (not a crash/inf)
    assert got.loc[4, "v_sd"] == 0.0
    assert np.isnan(got.loc[4, "v_z"]) and not got.loc[4, "is_anomaly"]


def test_time_weighted_avg_basic_and_edges():
    import pyarrow as pa

    W = 100  # bucket width (µs)
    rows = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["a"] + ["b"] * 2 + ["c"],
            # key a bucket 0: samples at 0,10,60 (+90 closes nothing: next
            # bucket); a bucket 100: single sample -> no row
            "ts": [0, 10, 60, 110, 90, 20, 20, 5],
            "v": [1.0, 3.0, 5.0, 9.0, 7.0, 4.0, 8.0, None],
            "id": [1, 2, 3, 4, 5, 6, 7, 8],
        }
    )
    got = (
        time_weighted_avg(
            ray.data.from_arrow(pa.Table.from_pandas(rows)),
            key_col="k", ts_col="ts", value_col="v", width_us=W,
            order_col="id", num_partitions=4,
        )
        .to_pandas().sort_values(["k", "bucket_us"]).reset_index(drop=True)
    )
    a0 = got[(got["k"] == "a") & (got["bucket_us"] == 0)].iloc[0]
    # weights: 1.0 held 10, 3.0 held 50, 5.0 held 30 (to ts=90), 7.0 unclosed
    want = (1.0 * 10 + 3.0 * 50 + 5.0 * 30) / 90.0
    assert abs(a0["twa"] - want) < 1e-12 and a0["n_weighted"] == 3
    # single-sample bucket emits no row
    assert got[(got["k"] == "a") & (got["bucket_us"] == 100)].empty
    # all-ties bucket: total weight 0 -> twa NULL, still counted
    b = got[got["k"] == "b"].iloc[0]
    assert np.isnan(b["twa"]) and b["n_weighted"] == 1
    # null values dropped before pairing: "c" has nothing left
    assert got[got["k"] == "c"].empty


def test_merge_intervals_islands():
    from contest_parsing_ray.stages.window import merge_intervals

    # key a: [0,10] [5,8] (contained) [10,20] (touching -> merges)
    #        [25,30] new island; key b: single; null key: own group
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", None, None],
            "s": [0, 5, 10, 25, 100, 7, 3],
            "e": [10, 8, 20, 30, 110, 9, 5],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        merge_intervals(ds, "k", "s", "e")
        .to_pandas()
        .sort_values(["k", "island_id"], na_position="last")
        .reset_index(drop=True)
    )
    got = list(
        zip(out["k"], out["island_id"], out["start_us"], out["end_us"],
            out["n_merged"])
    )
    assert got[:3] == [("a", 1, 0, 20, 3), ("a", 2, 25, 30, 1),
                       ("b", 1, 100, 110, 1)]
    nulls = [g for g in got if not isinstance(g[0], str)]
    assert len(nulls) == 2 and [n[1:] for n in nulls] == [
        (1, 3, 5, 1), (2, 7, 9, 1)]


def test_merge_intervals_matches_duckdb_gaps_islands():
    import duckdb

    from contest_parsing_ray.stages.window import merge_intervals

    rng = np.random.default_rng(21)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.choice([f"k{i}" for i in range(7)], n),
            "s": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    df["e"] = df["s"] + rng.integers(1, 120, n).astype(np.int64)
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        merge_intervals(ds, "k", "s", "e")
        .to_pandas()
        .sort_values(["k", "island_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("iv", df)
    want = con.execute(
        """
WITH o AS (
  SELECT k, s, e,
         MAX(e) OVER (PARTITION BY k ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
), g AS (
  SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
              AS brk
  FROM o
), i AS (
  SELECT *, SUM(brk) OVER (PARTITION BY k ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM g
)
SELECT k, CAST(island AS BIGINT) AS island_id,
       MIN(s) AS start_us, MAX(e) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM i GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).df()
    pd.testing.assert_frame_equal(
        out.astype({"island_id": np.int64}), want.astype(
            {"island_id": np.int64}), check_dtype=False
    )


def test_rolling_quantile_matches_duckdb_windowed_disc():
    import duckdb

    from contest_parsing_ray.stages.window import rolling_quantile

    rng = np.random.default_rng(31)
    n = 900
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "t": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 50, n).astype(np.float64),
        }
    )
    # sprinkle nulls: window w counts only non-null values
    df.loc[rng.integers(0, n, 25), "v"] = np.nan
    ds = ray.data.from_pandas(df).repartition(5)
    for q, w in ((0.5, 24), (0.9, 9), (0.25, 5), (1.0, 3)):
        out = (
            rolling_quantile(ds, "k", "t", "v", q=q, window=w, out_col="rq")
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("s", df)
        want = con.execute(
            f"""
SELECT k, t, quantile_disc(v, {q}) OVER (
  PARTITION BY k ORDER BY t
  ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS rq
FROM s ORDER BY k, t"""
        ).df()
        got = out["rq"].to_numpy()
        exp = want["rq"].to_numpy()
        both_nan = np.isnan(got) & np.isnan(exp)
        assert (both_nan | (got == exp)).all(), (q, w)


def test_pairwise_corr_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.corr import pairwise_corr

    rng = np.random.default_rng(41)
    buckets = np.arange(400, dtype=np.int64) * 3_600
    rows = []
    base = rng.normal(0, 1, len(buckets))
    for k, beta in (("a", 1.0), ("b", -0.7), ("c", 0.0), ("const", None)):
        for i, t in enumerate(buckets):
            if rng.random() < 0.15:
                continue  # missing buckets: inner-join semantics
            if beta is None:
                v = 5.0
            else:
                v = beta * base[i] + rng.normal(0, 0.3)
            rows.append((k, int(t), float(v)))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    ds = ray.data.from_pandas(df).repartition(6)
    out = pairwise_corr(ds, "k", "t", "v").to_pandas()
    got = {(r.k1, r.k2): (r.n, None if pd.isna(r.r) else round(r.r, 6))
           for r in out.itertuples()}
    con = duckdb.connect()
    con.register("s", df)
    want = {}
    for k1, k2, n, r in con.execute("""
SELECT a.k AS k1, b.k AS k2, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(a.v, b.v), 6) AS r
FROM s a JOIN s b ON a.t = b.t AND a.k < b.k
GROUP BY 1, 2""").fetchall():
        want[(k1, k2)] = (n, r)
    assert got == want
    assert got[("a", "const")][1] is None  # zero variance -> NULL


def test_cusum_matches_sequential_reference():
    from contest_parsing_ray.stages.window import cusum

    rng = np.random.default_rng(51)
    rows = []
    for k in ("stable", "shift"):
        x = rng.normal(10, 1, 300)
        if k == "shift":
            x[200:] += 4.0  # level shift -> must alarm after 200
        for i, v in enumerate(x):
            rows.append((k, i, float(v)))
    rows.append(("lone", 0, 5.0))  # sd undefined -> null stats, False flag
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = (
        cusum(ray.data.from_pandas(df).repartition(4), "k", "t", "v")
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # sequential reference loop per key
    for k in ("stable", "shift"):
        sub = df[df["k"] == k].sort_values("t")
        x = sub["v"].to_numpy()
        mu, sd = x.mean(), x.std(ddof=1)
        kap = 0.5 * sd
        sp = sm = 0.0
        eng = out[out["k"] == k]
        for i in range(len(x)):
            sp = max(0.0, sp + (x[i] - mu) - kap)
            sm = max(0.0, sm + (mu - x[i]) - kap)
            assert abs(eng["v_cusum_pos"].iloc[i] - sp) < 1e-9
            assert abs(eng["v_cusum_neg"].iloc[i] - sm) < 1e-9
    shift = out[out["k"] == "shift"]
    assert shift["is_change"].iloc[220:].all()
    # a stable series may brush the threshold by chance; it must not be
    # persistently alarmed the way the shifted series is
    assert out[out["k"] == "stable"]["is_change"].mean() < 0.05
    lone = out[out["k"] == "lone"]
    assert lone["v_cusum_pos"].isna().all() and not lone["is_change"].any()


def test_asof_join_forward_and_nearest():
    left = pd.DataFrame(
        {"id": [1, 2, 3, 4], "k": ["a", "a", "b", "b"],
         "ts": [100, 250, 50, 70]}
    )
    right = pd.DataFrame(
        {"k": ["a", "a", "b"], "rts": [90, 200, 60], "v": [7.0, 8.0, 9.0]}
    )
    for direction in ("forward", "nearest"):
        got = (
            asof_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                key_col="k", left_ts_col="ts", right_ts_col="rts",
                right_value_cols=["v"], num_partitions=4,
                direction=direction,
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("rts"),
            left_on="ts", right_on="rts", by="k", direction=direction,
        ).sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["id", "k", "ts", "rts", "v"]], want, check_dtype=False
        )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            key_col="k", left_ts_col="ts", right_ts_col="rts",
            right_value_cols=["v"], direction="sideways",
        )


def test_trend_slope_matches_duckdb_regr():
    import duckdb

    from contest_parsing_ray.stages.corr import trend_slope

    rng = np.random.default_rng(61)
    rows = []
    base_us = 1_650_000_000_000_000
    for k, slope_h in (("up", 2.5), ("down", -1.0), ("flat", 0.0)):
        for i in range(300):
            ts = base_us + i * 3_600_000_000
            v = 100 + slope_h * i + rng.normal(0, 3)
            rows.append((k, ts, float(v)))
    rows.append(("lone", base_us, 1.0))          # n=1 -> NULL slope
    rows.append(("k0", base_us, 5.0))            # zero x-variance (dup ts)
    rows.append(("k0", base_us, 9.0))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = trend_slope(
        ray.data.from_pandas(df).repartition(5), "k", "t", "v"
    ).to_pandas().set_index("k")
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute("""
WITH x AS (
  SELECT k, v,
         (t - MIN(t) OVER (PARTITION BY k)) / 3600000000.0 AS xh
  FROM s
)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(regr_slope(v, xh), 6) AS slope,
       ROUND(regr_intercept(v, xh), 6) AS intercept
FROM x GROUP BY k""").df().set_index("k")
    for k in ("up", "down", "flat", "lone", "k0"):
        assert out.loc[k, "n"] == want.loc[k, "n"]
        for c in ("slope", "intercept"):
            g, w = out.loc[k, c], want.loc[k, c]
            if pd.isna(w):
                assert pd.isna(g), (k, c)
            else:
                assert abs(round(g, 6) - w) <= 1e-6, (k, c, g, w)
    assert abs(out.loc["up", "slope"] - 2.5) < 0.1


def test_seasonal_decompose_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.window import seasonal_decompose

    rng = np.random.default_rng(71)
    W = 3_600_000_000
    period = 24
    rows = []
    for k in ("a", "b"):
        phase_amp = 5.0 if k == "a" else 0.0
        buckets = sorted(rng.choice(np.arange(500), 420, replace=False))
        for i in buckets:  # gaps: row-frame semantics must still match SQL
            v = 50 + 0.05 * i + phase_amp * np.sin(2 * np.pi * (i % 24) / 24)
            rows.append((k, int(i) * W, float(v + rng.normal(0, 0.5))))
    rows.append(("tiny", 0, 1.0))  # shorter than period: all-null trend
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = (
        seasonal_decompose(
            ray.data.from_pandas(df).repartition(5), "k", "t", "v",
            period=period, width_us=W,
        )
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute(f"""
WITH w AS (
  SELECT k, t, v,
         CASE WHEN COUNT(*) OVER win = {period}
              THEN AVG(v) OVER win END AS trend
  FROM s
  WINDOW win AS (PARTITION BY k ORDER BY t
                 ROWS BETWEEN {period // 2 - 1} PRECEDING
                          AND {period // 2} FOLLOWING)
), p AS (
  SELECT *, (t // {W}) % {period} AS phase FROM w
), m AS (
  SELECT k, phase, AVG(v - trend) AS seasonal
  FROM p WHERE trend IS NOT NULL GROUP BY 1, 2
)
SELECT p.k, p.t, p.v, p.trend, m.seasonal,
       p.v - p.trend - m.seasonal AS remainder
FROM p LEFT JOIN m USING (k, phase)
ORDER BY k, t""").df()
    for c in ("trend", "seasonal", "remainder"):
        g = out[c].to_numpy()
        w = want[c].to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        assert (both_nan | (np.abs(g - w) < 1e-9)).all(), c
    a = out[out["k"] == "a"]
    # the sinusoidal key's seasonal index must actually capture the cycle
    assert a["seasonal"].abs().max() > 3.0
    assert np.isnan(out[out["k"] == "tiny"]["trend"]).all()


def test_percent_rank_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.window import percent_rank

    rng = np.random.default_rng(81)
    n = 1500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 40, n).astype(np.float64),  # heavy ties
        "rid": np.arange(n, dtype=np.int64),
    })
    df.loc[rng.integers(0, n, 30), "v"] = np.nan
    df = pd.concat(
        [df, pd.DataFrame({"k": ["solo"], "v": [7.0], "rid": [n]})],
        ignore_index=True,
    )
    out = (
        percent_rank(ray.data.from_pandas(df).repartition(6), "k", "v")
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute("""
SELECT rid, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS pr
FROM s ORDER BY rid""").df()
    assert np.allclose(out["pct_rank"], want["pr"], atol=1e-12)
    assert out[out["k"] == "solo"]["pct_rank"].iloc[0] == 0.0


def test_running_record_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.window import running_record

    rng = np.random.default_rng(91)
    n = 800
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "t": np.arange(n, dtype=np.int64),
        "v": rng.normal(0, 10, n),
    })
    df.loc[rng.integers(0, n, 40), "v"] = np.nan  # nulls never records
    out = (
        running_record(ray.data.from_pandas(df).repartition(5), "k", "t", "v")
        .to_pandas().sort_values("t").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute("""
SELECT t,
       MAX(v) OVER (PARTITION BY k ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         AS prev_max,
       CASE WHEN v IS NULL THEN FALSE
            ELSE COALESCE(v > MAX(v) OVER (PARTITION BY k ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)
       END AS is_record
FROM s ORDER BY t""").df()
    pm_g, pm_w = out["prev_max"].to_numpy(), want["prev_max"].to_numpy()
    assert ((np.isnan(pm_g) & np.isnan(pm_w)) | (pm_g == pm_w)).all()
    assert (out["is_record"].to_numpy() == want["is_record"].to_numpy()).all()


def test_holt_matches_duckdb_recursive():
    import duckdb

    from contest_parsing_ray.stages.window import holt_smooth

    rng = np.random.default_rng(101)
    rows = []
    for k in ("a", "b"):
        x = 100 + np.cumsum(rng.normal(0.5, 2, 120))
        for i, v in enumerate(x):
            rows.append((k, i, float(v)))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = (
        holt_smooth(ray.data.from_pandas(df).repartition(4), "k", "t", "v",
                    alpha=0.3, beta=0.2)
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute("""
WITH RECURSIVE r AS (
  SELECT k, t, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS rn
  FROM s
), e AS (
  SELECT k, t, v, rn, CAST(v AS DOUBLE) AS lvl, CAST(0 AS DOUBLE) AS trd
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.k, r.t, r.v, r.rn,
         0.3 * r.v + 0.7 * (e.lvl + e.trd),
         0.2 * ((0.3 * r.v + 0.7 * (e.lvl + e.trd)) - e.lvl) + 0.8 * e.trd
  FROM r JOIN e ON r.k = e.k AND r.rn = e.rn + 1
)
SELECT k, t, lvl, trd FROM e ORDER BY k, t""").df()
    assert np.allclose(out["level"], want["lvl"], atol=1e-9)
    assert np.allclose(out["trend"], want["trd"], atol=1e-9)


def test_interarrival_stats_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.window import interarrival_stats

    rng = np.random.default_rng(111)
    n = 2000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "t": rng.integers(0, 10_000, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64),
    })
    df = pd.concat([df, pd.DataFrame(
        {"k": ["solo"], "t": [5], "rid": [n]})], ignore_index=True)
    out = interarrival_stats(
        ray.data.from_pandas(df).repartition(6), "k", "t", "rid"
    ).to_pandas().set_index("k")
    con = duckdb.connect()
    con.register("s", df)
    want = con.execute("""
WITH g AS (
  SELECT k, t - LAG(t) OVER (PARTITION BY k ORDER BY t, rid) AS gap
  FROM s
)
SELECT k, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       AVG(CAST(gap AS DOUBLE)) AS mean_gap,
       CAST(quantile_disc(gap, 0.5) AS DOUBLE) AS q50,
       CAST(quantile_disc(gap, 0.95) AS DOUBLE) AS q95
FROM g GROUP BY k""").df().set_index("k")
    for k in ("a", "b", "c", "solo"):
        assert out.loc[k, "n_gaps"] == want.loc[k, "n_gaps"]
        for gc, wc in (("mean_gap_us", "mean_gap"), ("q50_gap_us", "q50"),
                       ("q95_gap_us", "q95")):
            g, w = out.loc[k, gc], want.loc[k, wc]
            assert (pd.isna(g) and pd.isna(w)) or abs(g - w) < 1e-9, (k, gc)


def test_autocorr_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.corr import autocorr

    rng = np.random.default_rng(67)
    rows = []
    for k in ("smooth", "noise", "short"):
        m = {"smooth": 300, "noise": 300, "short": 2}[k]
        x = (np.cumsum(rng.normal(0, 1, m)) if k == "smooth"
             else rng.normal(0, 1, m))
        for i, v in enumerate(x):
            rows.append((k, i, float(v)))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    for lag in (1, 3):
        out = autocorr(
            ray.data.from_pandas(df).repartition(5), "k", "t", "v", lag=lag
        ).to_pandas().set_index("k")
        con = duckdb.connect()
        con.register("s", df)
        want = con.execute(f"""
WITH l AS (
  SELECT k, v, LAG(v, {lag}) OVER (PARTITION BY k ORDER BY t) AS prev
  FROM s
)
SELECT k, CAST(COUNT(prev) AS BIGINT) AS n, corr(v, prev) AS acf
FROM l GROUP BY k""").df().set_index("k")
        for k in ("smooth", "noise", "short"):
            assert out.loc[k, "n"] == want.loc[k, "n"], (k, lag)
            g, w = out.loc[k, "acf"], want.loc[k, "acf"]
            assert (pd.isna(g) and pd.isna(w)) or abs(g - w) < 1e-9
    assert out.loc["smooth", "acf"] > 0.8  # random walk: high lag-ACF


def test_interval_join_rejects_column_collision():
    """ADVICE round-3: a same-named interval column must raise loudly, not
    silently keep the event side's values."""
    from contest_parsing_ray.stages.window import interval_join

    ev = pd.DataFrame({"u": ["a"], "ts": [5], "tag": [1]})
    iv = pd.DataFrame({"u": ["a"], "lo": [0], "hi": [10], "tag": [2]})
    with pytest.raises(ValueError, match="collide with event columns"):
        interval_join(
            ray.data.from_pandas(ev), ray.data.from_pandas(iv),
            key_col="u", ts_col="ts", lo_col="lo", hi_col="hi",
            interval_cols=["tag"],
        )


def test_pairwise_corr_rejects_duplicate_buckets():
    """ADVICE round-3: duplicate (key, bucket) rows would be mean-collapsed
    by the pivot while the SQL self-join oracle weights every combination;
    the compact-series contract is now enforced."""
    from contest_parsing_ray.stages.corr import pairwise_corr

    df = pd.DataFrame(
        {"k": ["a", "a", "b"], "t": [1, 1, 1], "v": [1.0, 2.0, 3.0]}
    )
    with pytest.raises(Exception, match="unique per \\(key, bucket\\)"):
        pairwise_corr(ray.data.from_pandas(df), "k", "t", "v")


def test_sliding_window_null_key_is_real_group():
    """Null keys form their own rolling group (module-wide policy, like
    ewma) instead of being silently dropped."""
    from contest_parsing_ray.stages.window import sliding_window

    df = pd.DataFrame({
        "k": ["a", "a", None, None, None],
        "ts": [1, 2, 1, 2, 3],
        "v": [1.0, 2.0, 10.0, 20.0, 30.0],
    })
    out = (sliding_window(ray.data.from_pandas(df), "k", "ts", ["v"],
                          window=2, agg="sum")
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    assert len(out) == 5  # null-key rows retained
    nul = out[out["k"].isna()].sort_values("ts")
    assert nul["v_w2_sum"].tolist() == [10.0, 30.0, 50.0]


def test_asof_join_null_left_ts_kept_with_null_match():
    """SQL LEFT semantics: a left row with null ts matches nothing but is
    kept; output dtypes stay stable (int right values don't float-drift)."""
    from contest_parsing_ray.stages.window import asof_join

    left = pd.DataFrame({
        "k": ["a", "a", "a"],
        "lts": pd.array([10, None, 30], dtype="Int64"),
    })
    right = pd.DataFrame({
        "k": ["a", "a"], "rts": [5, 25], "rv": [100, 200],
    })
    out = (asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     key_col="k", left_ts_col="lts", right_ts_col="rts",
                     right_value_cols=["rv"])
           .to_pandas())
    assert len(out) == 3
    nul = out[out["lts"].isna()]
    assert len(nul) == 1 and nul["rv"].isna().all()
    got = out.dropna(subset=["lts"]).sort_values("lts")
    assert got["rv"].tolist() == [100, 200]
    # arrow-typed output: rv stays integral (nullable), not float64
    sch = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    key_col="k", left_ts_col="lts", right_ts_col="rts",
                    right_value_cols=["rv"]).schema()
    import pyarrow as pa2
    assert dict(zip(sch.names, sch.types))["rv"] == pa2.int64()


def test_rolling_quantile_float_product_guard():
    """q*n landing a hair above an exact integer (0.07*100) must select
    the 7th order statistic, not the 8th."""
    from contest_parsing_ray.stages.window import rolling_quantile

    df = pd.DataFrame({
        "k": ["a"] * 100,
        "ts": np.arange(100, dtype=np.int64),
        "v": np.arange(100, dtype=np.float64),  # sorted: v == index
    })
    out = (rolling_quantile(ray.data.from_pandas(df), "k", "ts", "v",
                            window=100, q=0.07)
           .to_pandas().sort_values("ts"))
    # at the last row the frame is the full 0..99: ceil(0.07*100)-1 = 6
    assert out["v_q7"].iloc[-1] == 6.0
