"""asof_join + sliding_window unit tests (pd.merge_asof / rolling oracles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from contest_parsing_ray.stages.window import asof_join, sliding_window


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
