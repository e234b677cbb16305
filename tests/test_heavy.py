"""heavy_hitters: MG-candidates + exact-verify two-pass vs brute force.

The adversarial case for Misra-Gries is a key JUST above threshold amid a
sea of near-threshold decoys — the compress step must never evict a true
heavy hitter (guarantee: undercount <= n/(2k+1) < n/k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from contest_parsing_ray.stages.heavy import _compress, heavy_hitters


def _brute(keys, k):
    keys = [x for x in keys if x is not None]
    n = len(keys)
    from collections import Counter

    c = Counter(keys)
    out = {kk: v for kk, v in c.items() if v * k > n}
    return out


def _run(keys, k, batch_size=23):
    ds = ray.data.from_arrow(pa.table({"u": pa.array(keys)})).repartition(6)
    t = heavy_hitters(ds, "u", k, batch_size=batch_size)
    return dict(zip(t["u"].to_pylist(), t["cnt"].to_pylist()))


def test_compress_keeps_at_most_m():
    w = np.array([10, 9, 8, 1, 1, 1, 1], dtype=np.int64)
    out = _compress(w, 3)
    assert (out > 0).sum() <= 3 and out[0] == 9  # decremented by 4th-largest


def test_matches_brute_force_zipf():
    rng = np.random.default_rng(2)
    keys = [f"u{z}" for z in rng.zipf(1.3, 5000) if z < 10_000]
    for k in (5, 20, 100):
        assert _run(keys, k) == _brute(keys, k)


def test_just_above_threshold_survives_decoys():
    # 1 key at threshold+1 among many decoys one below it, tiny batches so
    # every batch compresses hard
    k = 10
    keys = ["hot"] * 101 + [f"d{i}" for i in range(89) for _ in range(10)] + [
        "filler"] * 9
    n = len(keys)
    assert 101 * k > n >= 100 * k  # hot is the only qualifier
    rng = np.random.default_rng(4)
    keys = list(rng.permutation(keys))
    got = _run(keys, k, batch_size=17)
    assert got == {"hot": 101}


def test_null_keys_ignored_and_int_keys():
    keys = [1, 1, 1, 2, None, None, 3, 1]
    got = _run(keys, 2)  # n=6 non-null, threshold > 3
    assert got == {1: 4}


def test_no_heavy_hitters_empty_result():
    keys = [f"u{i}" for i in range(200)]  # all count 1
    assert _run(keys, 50) == {}
