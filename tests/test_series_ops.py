"""Unit tests for the order-dependent series operators (ohlc_rollup,
sessionize) and the round-2 text ops (RegexRedact, RepetitionScore,
word_topk) — handcrafted oracles + batch-split invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from contest_parsing_ray.stages.ohlc import ohlc_rollup
from contest_parsing_ray.stages.text import RegexRedact, RepetitionScore, word_topk
from contest_parsing_ray.stages.window import sessionize

W = 100  # bucket width (µs) for the toy series


def _ohlc_input():
    # key "a", bucket 0: ts 10,20,30 (tie at 30 broken by order) / bucket 100
    # key "b": single-ts bucket -> rate NULL
    return pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "a", "b"],
            "us": [30, 10, 20, 30, 150, 250],
            "ord": [5, 1, 2, 4, 6, 7],
            "v": [9.0, 2.0, 4.0, 8.0, 5.0, 3.0],
        }
    )


def _run_ohlc(ds):
    return (
        ohlc_rollup(
            ds, key_col="k", ts_col="us", value_col="v", order_col="ord",
            width_us=W, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "bucket_us"])
        .reset_index(drop=True)
    )


def test_ohlc_handcrafted():
    got = _run_ohlc(ray.data.from_pandas(_ohlc_input()))
    a0 = got[(got["k"] == "a") & (got["bucket_us"] == 0)].iloc[0]
    assert a0["open_v"] == 2.0  # earliest ts=10
    # ties at ts=30: ord 4 (v=8) before ord 5 (v=9) -> close is ord 5
    assert a0["close_v"] == 9.0
    assert a0["high_v"] == 9.0 and a0["low_v"] == 2.0 and a0["cnt"] == 4
    assert a0["rate_per_s"] == (9.0 - 2.0) * 1e6 / 20
    a1 = got[(got["k"] == "a") & (got["bucket_us"] == 100)].iloc[0]
    assert a1["open_v"] == a1["close_v"] == 5.0 and a1["cnt"] == 1
    assert np.isnan(a1["rate_per_s"])  # zero elapsed -> null
    b = got[got["k"] == "b"].iloc[0]
    assert b["bucket_us"] == 200 and np.isnan(b["rate_per_s"])


def test_ohlc_partials_merge_across_blocks():
    """The per-batch partial + merge must be invariant to block splits."""
    df = _ohlc_input()
    whole = _run_ohlc(ray.data.from_pandas(df))
    split = _run_ohlc(
        ray.data.from_pandas([df.iloc[:2], df.iloc[2:4], df.iloc[4:]])
    )
    pd.testing.assert_frame_equal(whole, split)


def test_sessionize_gaps_and_ordinals():
    ev = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 2],
            "us": [0, 50, 200, 210, 0, 500],
            "eid": [1, 2, 3, 4, 5, 6],
        }
    )
    got = (
        sessionize(
            ray.data.from_pandas(ev), user_col="u", ts_col="us",
            gap_us=100, order_col="eid", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["u", "session_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "u": [1, 1, 2, 2],
            "session_id": [1, 2, 1, 2],
            "session_start_us": [0, 200, 0, 500],
            "session_end_us": [50, 210, 0, 500],
            "n_events": [2, 2, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_regex_redact():
    t = pa.table({"text": ["spark a spark", "no match", None]})
    out = RegexRedact(pattern=r"\bspark\b", replacement="<X>")(t)
    # null text stays null, matching SQL regexp_replace(NULL, ...)
    assert out["text_redacted"].to_pylist() == ["<X> a <X>", "no match", None]
    assert out["n_redacted"].to_pylist() == [2, 0, None]


def test_repetition_score():
    t = pa.table({"text": ["a b a a", "x y z", ""]})
    out = RepetitionScore()(t)
    assert out["n_words_sep"].to_pylist() == [4, 3, 1]  # "" splits to [""]
    assert out["n_distinct_words"].to_pylist() == [2, 3, 1]
    assert out["dup_word_frac"].to_pylist() == [0.5, 0.0, 0.0]


def test_value_histogram():
    from contest_parsing_ray.stages.histogram import value_histogram

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": [0.0, 9.9, 25.0, -5.0, 99.0],  # -5 clips to bin 0, 99 to 9
        }
    )
    got = (
        value_histogram(
            ray.data.from_pandas(df), key_col="k", value_col="v",
            lo=0.0, hi=50.0, n_bins=10,
        )
        .to_pandas()
        .sort_values(["k", "bin"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b"], "bin": [0, 1, 5, 0, 9],
         "cnt": [1, 1, 1, 1, 1]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ohlc_and_histogram_empty_block():
    """Empty input blocks must keep typed schemas through the exchange."""
    from contest_parsing_ray.stages.histogram import value_histogram

    df = _ohlc_input()
    ds = ray.data.from_pandas([df, df.iloc[:0]])
    got = _run_ohlc(ds)
    pd.testing.assert_frame_equal(got, _run_ohlc(ray.data.from_pandas(df)))
    hdf = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 9.0]})
    hds = ray.data.from_pandas([hdf, hdf.iloc[:0]])
    h = (
        value_histogram(hds, key_col="k", value_col="v", lo=0.0, hi=10.0,
                        n_bins=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(h["bin"]) == [0, 1] and list(h["cnt"]) == [1, 1]


def test_broadcast_semi_and_anti_join():
    from contest_parsing_ray.stages.join import broadcast_semi_join

    big = ray.data.from_pandas(
        pd.DataFrame({"id": [1, 2, 3, 4], "u": ["a", "b", "c", "a"]})
    )
    keys = ray.data.from_pandas(pd.DataFrame({"u": ["a", "c", "a"]}))
    semi = broadcast_semi_join(big, keys, on="u").to_pandas()
    assert sorted(semi["id"]) == [1, 3, 4]
    anti = broadcast_semi_join(big, keys, on="u", anti=True).to_pandas()
    assert sorted(anti["id"]) == [2]
    # numeric keys take the exact (non-hashed) path
    keys_n = ray.data.from_pandas(pd.DataFrame({"id": [2, 4]}))
    semi_n = broadcast_semi_join(big, keys_n, on="id").to_pandas()
    assert sorted(semi_n["id"]) == [2, 4]


def test_interval_join():
    from contest_parsing_ray.stages.window import interval_join

    ev = pd.DataFrame(
        {"eid": [1, 2, 3, 4, 5], "u": ["a", "a", "a", "b", "b"],
         "ts": [5, 10, 20, 10, 99]}
    )
    iv = pd.DataFrame(
        {"u": ["a", "a", "b"], "lo": [5, 9, 0], "hi": [10, 25, 50],
         "tag": [100, 200, 300]}
    )
    got = (
        interval_join(
            ray.data.from_pandas(ev), ray.data.from_pandas(iv),
            key_col="u", ts_col="ts", lo_col="lo", hi_col="hi",
            interval_cols=["tag"], num_partitions=2,
        )
        .to_pandas().sort_values(["eid", "tag"]).reset_index(drop=True)
    )
    # inclusive bounds; eid 1,2 match interval 100; eid 2,3 match 200
    # (overlap fans out eid 2); eid 4 matches 300; eid 5 matches nothing
    assert got[["eid", "tag"]].values.tolist() == [
        [1, 100], [2, 100], [2, 200], [3, 200], [4, 300]
    ]

    # inverted interval (hi < lo) matches nothing instead of crashing
    bad = pd.DataFrame({"u": ["a"], "lo": [50], "hi": [10], "tag": [9]})
    got2 = interval_join(
        ray.data.from_pandas(ev), ray.data.from_pandas(bad),
        key_col="u", ts_col="ts", lo_col="lo", hi_col="hi",
        interval_cols=["tag"], num_partitions=2,
    ).to_pandas()
    assert len(got2) == 0


def test_counter_rate_resets():
    from contest_parsing_ray.stages.ohlc import counter_rate

    # key a, bucket 0: 1 -> 5 -> 2 (reset) -> 4: increase = 4 + 0 + 2 = 6
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "a"],
            "us": [10, 20, 30, 40, 150],
            "id": [1, 2, 3, 4, 5],
            "v": [1.0, 5.0, 2.0, 4.0, 9.0],
        }
    )
    got = (
        counter_rate(ray.data.from_pandas([df.iloc[:2], df.iloc[2:]]),
                     key_col="k", ts_col="us", value_col="v",
                     order_col="id", width_us=100, num_partitions=2)
        .to_pandas().sort_values("bucket_us").reset_index(drop=True)
    )
    assert got["increase"].tolist() == [6.0, 0.0]  # bucket 100: single sample
    assert got["n_samples"].tolist() == [4, 1]


def test_melt_roundtrip():
    from contest_parsing_ray.stages.widen import melt

    t = pd.DataFrame({"k": ["a", "b"], "x": [1.0, 2.0], "y": [3, 4]})
    got = (
        melt(ray.data.from_pandas(t), id_cols=["k"], value_cols=["x", "y"])
        .to_pandas().sort_values(["k", "variable"]).reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["a", "x", 1.0], ["a", "y", 3.0], ["b", "x", 2.0], ["b", "y", 4.0]
    ]


def test_null_keys_and_values():
    """Null keys form their own group (never mislabeled onto a real key);
    null values are dropped; null semi-join probes never match."""
    from contest_parsing_ray.stages.histogram import value_histogram
    from contest_parsing_ray.stages.join import broadcast_semi_join

    # histogram: null key -> its own group, not a crash / not key "b"
    df = pd.DataFrame({"k": ["a", None, "b"], "v": [1.0, 1.0, None]})
    h = (
        value_histogram(ray.data.from_pandas(df), key_col="k", value_col="v",
                        lo=0.0, hi=10.0, n_bins=2)
        .to_pandas()
    )
    assert len(h) == 2 and h["cnt"].sum() == 2  # null v dropped
    assert h["k"].isna().sum() == 1

    # ohlc: null key isolated; null value dropped
    odf = pd.DataFrame(
        {"k": ["a", None, "a"], "us": [10, 10, 20], "ord": [1, 2, 3],
         "v": [5.0, 7.0, None]}
    )
    o = _run_ohlc(ray.data.from_pandas(odf))
    a = o[o["k"] == "a"]
    assert len(a) == 1 and a["cnt"].iloc[0] == 1 and a["open_v"].iloc[0] == 5.0
    assert o["k"].isna().sum() == 1

    # semi-join: null in key set doesn't match "" probes; null probes
    # are dropped by semi and kept by anti (EXISTS semantics)
    big = ray.data.from_pandas(
        pd.DataFrame({"id": [1, 2, 3], "u": ["", None, "x"]})
    )
    keys = ray.data.from_pandas(pd.DataFrame({"u": [None, "x"]}))
    assert sorted(broadcast_semi_join(big, keys, on="u").to_pandas()["id"]) == [3]
    assert sorted(
        broadcast_semi_join(big, keys, on="u", anti=True).to_pandas()["id"]
    ) == [1, 2]


def test_topn_per_key():
    from contest_parsing_ray.stages.window import topn_per_key

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b"],
            "v": [5.0, 9.0, 9.0, 1.0, 2.0],
            "id": [4, 2, 1, 3, 9],
        }
    )
    got = (
        topn_per_key(
            ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]),
            key_col="k", value_col="v", n=2, tiebreak_col="id",
            num_partitions=2,
        )
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    )
    # a: ties at 9.0 -> ids 1 and 2 win (id asc); b: single row
    assert got[["k", "id"]].values.tolist() == [["a", 1], ["a", 2], ["b", 9]]


def test_ewma_recursion():
    from contest_parsing_ray.stages.window import ewma

    s = pd.DataFrame({"k": ["a"] * 3 + ["b"], "ts": [1, 2, 3, 1],
                      "x": [10.0, 20.0, 20.0, 5.0]})
    got = (
        ewma(ray.data.from_pandas(s), key_col="k", ts_col="ts",
             value_col="x", alpha=0.5, num_partitions=2)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert list(got["x_ewma"]) == [10.0, 15.0, 17.5, 5.0]


def test_repetition_score_large_string():
    # large_string text -> split yields large_list (int64 offsets)
    t = pa.table({"text": pa.array(["a b a a", "x y z"], type=pa.large_string())})
    out = RepetitionScore()(t)
    assert out["n_words_sep"].to_pylist() == [4, 3]
    assert out["dup_word_frac"].to_pylist() == [0.5, 0.0]


def test_curate_documents():
    from contest_parsing_ray.pipelines.curation import curate_documents

    long = " ".join(["tok%d" % i for i in range(25)])
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                long,            # keeps (25 distinct words)
                "short doc",     # dropped: < 20 words
                "a " * 24 + "a", # dropped: 25 words but dup frac 24/25
                long,            # exact duplicate of doc 1 -> deduped
            ],
        }
    )
    got = (
        curate_documents(ray.data.from_pandas(docs), min_words=20,
                         max_dup_frac=0.7)
        .to_pandas()
    )
    assert list(got["doc_id"]) == [1]  # first-wins on doc_id
    assert got["n_words"].iloc[0] == 25 and got["dup_word_frac"].iloc[0] == 0.0


def test_word_topk():
    docs = ray.data.from_items(
        [{"text": "b a b"}, {"text": "c b a"}, {"text": "c b"}]
    )
    got = word_topk(docs, k=2).to_pandas()
    assert list(got["word"]) == ["b", "a"]  # b=4; tie a=2/c=2 -> word asc
    assert list(got["cnt"]) == [4, 2]


def _m4_brute(df, width):
    """Reference M4: for each (key, bucket) the distinct points at the
    four lexicographic extremes."""
    rows = set()
    df = df.dropna(subset=["ts_us", "value"])
    df = df.assign(bucket_us=(df["ts_us"] // width) * width)
    for (k, b), g in df.groupby(["key", "bucket_us"]):
        pts = sorted(zip(g["ts_us"], g["value"]))
        by_v = sorted(zip(g["value"], g["ts_us"]))
        rows |= {
            (k, b, *pts[0]), (k, b, *pts[-1]),
            (k, b, by_v[0][1], by_v[0][0]), (k, b, by_v[-1][1], by_v[-1][0]),
        }
    return rows


def test_m4_downsample_matches_bruteforce_and_is_idempotent():
    import numpy as np
    import pandas as pd
    import ray.data

    from contest_parsing_ray.stages.ohlc import m4_downsample

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], n),
            "ts_us": rng.integers(0, 50_000, n).astype("int64"),
            # coarse grid forces duplicate values AND duplicate timestamps,
            # exercising both tie-break orders
            "value": rng.integers(0, 20, n).astype("float64"),
        }
    )
    df.loc[::97, "value"] = np.nan  # dropped, not selected
    got = (
        m4_downsample(
            ray.data.from_pandas(df).repartition(8),
            key_col="key", ts_col="ts_us", value_col="value", width_us=5_000,
        )
        .to_pandas()
    )
    got_set = set(map(tuple, got[["key", "bucket_us", "ts_us", "value"]].values))
    assert got_set == _m4_brute(df, 5_000)
    assert len(got) == len(got_set)  # output itself is deduplicated
    # idempotent: downsampling the downsample returns the same points
    again = (
        m4_downsample(
            ray.data.from_pandas(got), key_col="key", ts_col="ts_us",
            value_col="value", width_us=5_000,
        ).to_pandas()
    )
    assert set(map(tuple, again[["key", "bucket_us", "ts_us", "value"]].values)) == got_set


def test_lttb_spike_endpoints_and_partitioning_invariance():
    import numpy as np
    import pandas as pd
    import ray.data

    from contest_parsing_ray.stages.ohlc import lttb_downsample

    # hand case: one interior bucket, spike must win the triangle
    df = pd.DataFrame(
        {"key": ["k"] * 6, "ts_us": np.arange(6, dtype="int64"),
         "value": [0.0, 0.0, 10.0, 0.0, 0.0, 0.0]}
    )
    got = lttb_downsample(
        ray.data.from_pandas(df), "key", "ts_us", "value", n_out=3
    ).to_pandas().sort_values("ts_us")
    assert got["ts_us"].tolist() == [0, 2, 5]  # first, spike, last

    # invariants on random integer series (integer coords: exact areas)
    rng = np.random.default_rng(9)
    n = 3000
    big = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c", "d"], n),
            "ts_us": rng.integers(0, 1_000_000, n).astype("int64"),
            "value": rng.integers(-50, 50, n).astype("float64"),
        }
    ).drop_duplicates(subset=["key", "ts_us"])
    big.loc[::61, "value"] = np.nan

    def run(frame, parts):
        out = lttb_downsample(
            ray.data.from_pandas(frame).repartition(parts),
            "key", "ts_us", "value", n_out=50,
        ).to_pandas()
        return out.sort_values(["key", "ts_us"]).reset_index(drop=True)

    got = run(big, 8)
    clean = big.dropna(subset=["value"])
    for k, g in clean.groupby("key"):
        sel = got[got["key"] == k]
        assert len(sel) == min(len(g), 50)
        g = g.sort_values("ts_us")
        # endpoints always kept; every output point is a real input point
        assert sel["ts_us"].iloc[0] == g["ts_us"].iloc[0]
        assert sel["ts_us"].iloc[-1] == g["ts_us"].iloc[-1]
        merged = sel.merge(g, on=["key", "ts_us", "value"])
        assert len(merged) == len(sel)
    # deterministic under input order and partitioning
    rev = run(big.iloc[::-1].reset_index(drop=True), 3)
    pd.testing.assert_frame_equal(got, rev)


def test_lttb_short_series_and_bad_n_out():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from contest_parsing_ray.stages.ohlc import _lttb_one, lttb_downsample

    # series shorter than n_out pass through untouched
    df = pd.DataFrame(
        {"key": ["k"] * 4, "ts_us": np.arange(4, dtype="int64"),
         "value": [1.0, 2.0, 3.0, 4.0]}
    )
    got = lttb_downsample(
        ray.data.from_pandas(df), "key", "ts_us", "value", n_out=10
    ).to_pandas()
    assert len(got) == 4
    with pytest.raises(ValueError, match="n_out"):
        _lttb_one(np.arange(5), np.arange(5.0), 2)
