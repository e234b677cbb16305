"""Bucketing must replicate Polars dt.round (the reference's grid,
``TracesParser.py:155``): round to NEAREST boundary, ties up."""

from __future__ import annotations

import numpy as np
import polars as pl
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from contest_parsing_ray.config import parse_duration_us
from contest_parsing_ray.functions.bucketing import bucket_us


@pytest.mark.parametrize("spec,us", [("30s", 30_000_000), ("1m", 60_000_000),
                                     ("5m", 300_000_000), ("1h", 3_600_000_000),
                                     ("2d", 2 * 86_400_000_000)])
def test_parse_duration(spec, us):
    assert parse_duration_us(spec) == us


def test_parse_duration_rejects():
    for bad in ["", "5", "m", "5x", "-5m"]:
        with pytest.raises(ValueError):
            parse_duration_us(bad)


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=4_000_000_000_000_000), min_size=1, max_size=50
    ),
    width=st.sampled_from([1_000_000, 30_000_000, 60_000_000, 300_000_000, 3_600_000_000]),
)
def test_matches_polars_dt_round(ts, width):
    ours = bucket_us(np.array(ts, dtype=np.int64), width)
    s = pl.Series("t", ts).cast(pl.Datetime("us"))
    theirs = s.dt.round(f"{width}us").cast(pl.Int64).to_numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_explicit_ties():
    w = 60_000_000
    # [00:00, 00:29.999999, 00:30 (tie->up), 00:59]
    ts = np.array([0, 29_999_999, 30_000_000, 59_000_000], dtype=np.int64)
    np.testing.assert_array_equal(bucket_us(ts, w), [0, 0, w, w])
