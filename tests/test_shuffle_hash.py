"""Regression tests for the vectorized string hash (equal values must hash
equally regardless of surrounding nulls/empties — a clipped-reduceat bug
once corrupted the last non-empty segment when trailing nulls existed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from contest_parsing_ray.stages._shuffle import add_hash_partition, hash64_strings


def test_equal_values_equal_hashes_with_trailing_nulls():
    arr = pa.array(["pod-a-1", "pod-a-1", "pod-a-1", None, None], type=pa.string())
    h = hash64_strings(arr)
    assert h[0] == h[1] == h[2]
    assert h[3] == h[4]


def test_empty_string_and_null_distinct_but_stable():
    arr = pa.array(["", None, "", None, "x"], type=pa.string())
    h = hash64_strings(arr)
    assert h[0] == h[2] and h[1] == h[3]


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=40
    )
)
def test_hash_is_value_function(values):
    """hash(x) depends only on x: compare against hashing each value alone."""
    arr = pa.array(values, type=pa.string())
    h = hash64_strings(arr)
    for i, v in enumerate(values):
        solo = hash64_strings(pa.array([v], type=pa.string()))[0]
        assert h[i] == solo, (i, v)


def test_partition_colocation_mixed_nulls():
    t = pa.table(
        {
            "k": ["a", "a", None, "a", None, "b"],
            "ts": [1, 1, 1, 1, 1, 1],
        }
    )
    parts = add_hash_partition(t, ["k", "ts"], 16).column("__part").to_pylist()
    assert parts[0] == parts[1] == parts[3]
    assert parts[2] == parts[4]


def test_blocked_hash_is_block_size_invariant():
    """Cache-blocked hashing must be bit-identical for ANY block size —
    including cuts landing mid-run of empties and single over-long strings
    spanning multiple blocks' worth of bytes."""
    vals = [f"doc-{i:012d}" for i in range(997)]
    vals[3] = ""
    vals[4] = ""
    vals[500] = "x" * 5000  # longer than the smallest block size below
    vals[996] = ""
    arr = pa.array(vals, type=pa.string())
    ref = hash64_strings(arr, block_bytes=1 << 30)  # single block
    for bb in (7, 64, 1024, 16384):
        got = hash64_strings(arr, block_bytes=bb)
        assert (got == ref).all(), f"block_bytes={bb} diverged"


@settings(deadline=None, max_examples=50)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=20)), min_size=0, max_size=40
    ),
    st.integers(min_value=1, max_value=256),
)
def test_blocked_hash_property(values, block_bytes):
    arr = pa.array(values, type=pa.string())
    ref = hash64_strings(arr, block_bytes=1 << 30)
    got = hash64_strings(arr, block_bytes=block_bytes)
    assert (got == ref).all()


def test_default_num_partitions_bytes_floor():
    """Partition count grows with input volume (verdict: auto-size hash
    partitions): the CPU-derived default is only an overhead trade-off; the
    bytes floor keeps one partition under a worker-heap-sized table."""
    from contest_parsing_ray.stages._shuffle import default_num_partitions

    base = default_num_partitions()
    assert 4 <= base <= 64
    # small input: CPU-based default wins
    assert default_num_partitions(input_bytes=1 << 20) == base
    # 10 GiB at 256 MiB target -> at least 40 partitions
    assert default_num_partitions(input_bytes=10 << 30) == max(base, 40)
    # the bytes floor may exceed the CPU cap, clamped at 4096
    assert default_num_partitions(input_bytes=1 << 50) == 4096
    # explicit target honored, exact ceiling division
    assert default_num_partitions(
        input_bytes=(1 << 30) + 1, target_partition_bytes=1 << 30
    ) == max(base, 2)
