"""pack_offsets (distributed ordered prefix-sum) unit tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from contest_parsing_ray.stages.packing import pack_offsets


def _run(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    out = pack_offsets(
        ray.data.from_pandas(df), id_col="id", count_col="n", cap=cap
    )
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def test_pack_offsets_prefix_sum_and_straddle():
    # shuffled input: the operator owns the ordering
    df = pd.DataFrame({"id": ["d", "a", "c", "b"], "n": [5, 3, 4, 6]})
    got = _run(df, cap=8)
    # order a,b,c,d -> counts 3,6,4,5 -> starts 0,3,9,13
    assert got["start_tok"].tolist() == [0, 3, 9, 13]
    got = got.set_index("id")
    assert got.loc["a", "start_tok"] == 0 and got.loc["a", "pack_id"] == 0
    assert got.loc["b", "start_tok"] == 3 and got.loc["b", "pack_id"] == 0
    # b spans tokens 3..8 -> crosses the cap-8 cut
    assert bool(got.loc["b", "straddles"])
    assert got.loc["c", "start_tok"] == 9 and got.loc["c", "pack_id"] == 1
    # c spans 9..12, inside pack 1
    assert not bool(got.loc["c", "straddles"])
    assert got.loc["d", "start_tok"] == 13 and bool(got.loc["d", "straddles"])


def test_pack_offsets_empty_docs_and_exact_boundary():
    # a ends exactly at the cap; b starts the next pack; e is empty
    df = pd.DataFrame({"id": ["a", "b", "e0"], "n": [8, 2, 0]})
    got = _run(df, cap=8).set_index("id")
    # a occupies 0..7: last token in pack 0, no straddle
    assert got.loc["a", "pack_id"] == 0 and not bool(got.loc["a", "straddles"])
    assert got.loc["b", "start_tok"] == 8 and got.loc["b", "pack_id"] == 1
    # empty doc: zero tokens, pinned to its start pack, never straddles
    assert got.loc["e0", "start_tok"] == 10 and not bool(got.loc["e0", "straddles"])
    assert got.loc["e0", "pack_id"] == 1


def test_pack_offsets_many_blocks_matches_single_scan():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {"id": [f"doc_{i:06d}" for i in range(n)], "n": rng.integers(0, 50, n)}
    )
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = ray.data.from_arrow(pa.Table.from_pandas(shuffled)).repartition(16)
    got = (
        pack_offsets(ds, id_col="id", count_col="n", cap=512)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want_start = np.concatenate(([0], np.cumsum(df["n"].to_numpy()[:-1])))
    assert got["start_tok"].tolist() == want_start.tolist()
    assert (got["pack_id"].to_numpy() == want_start // 512).all()


def test_pack_offsets_bad_cap():
    df = pd.DataFrame({"id": ["a"], "n": [1]})
    with pytest.raises(ValueError, match="cap"):
        pack_offsets(ray.data.from_pandas(df), "id", "n", 0)
