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
