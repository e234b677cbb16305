"""Regression tests for compat.patch_hash_shuffle_schema_broadcast.

Round-1 failure: a native ``Dataset.join`` whose input sequence starts with
an EMPTY block (typical for the output of another join / groupby, where most
partitions of a small dataset are empty) lost the schema broadcast inside
Ray's hash shuffle and crashed with ``ArrowInvalid: No match or multiple
matches for key field reference`` during finalize (seen at num_cpus=32,
16 partitions, in the driver's telemetry_join_fixture run).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

import contest_parsing_ray  # noqa: F401  (installs the patch on import)
from contest_parsing_ray.compat import patch_hash_shuffle_schema_broadcast


def _blocks_dataset(tables: list[pa.Table]) -> ray.data.Dataset:
    ds = ray.data.from_arrow(tables)
    assert ds.num_blocks() == len(tables)
    return ds


def test_patch_installs():
    assert patch_hash_shuffle_schema_broadcast() is True


def test_native_join_with_empty_leading_blocks():
    schema_l = pa.schema([("k", pa.string()), ("v", pa.int64())])
    schema_r = pa.schema([("k", pa.string()), ("w", pa.int64())])
    # 15 empty blocks FIRST, then the single data block: without the patch
    # the schema broadcast is dropped and most of the 16 join partitions
    # finalize against a column-less left table. (8 partitions: 8 x 0.25
    # CPU aggregators must fit the 4-CPU test cluster alongside shuffle tasks.)
    left = _blocks_dataset(
        [schema_l.empty_table()] * 15
        + [pa.table({"k": ["a", "b"], "v": [1, 2]}, schema=schema_l)]
    )
    right = _blocks_dataset(
        [schema_r.empty_table()] * 15
        + [pa.table({"k": ["a", "b"], "w": [10, 20]}, schema=schema_r)]
    )
    out = left.join(
        right,
        join_type="inner",
        num_partitions=8,
        on=("k",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    ).to_pandas()
    assert len(out) == 2
    assert sorted(out.columns) == ["k", "v", "w"]
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        pd.DataFrame({"k": ["a", "b"], "v": [1, 2], "w": [10, 20]}),
        check_like=True,
    )


def test_chained_joins_with_empty_blocks():
    """Two chained native joins — the shape that crashed in round 1."""
    from contest_parsing_ray.stages.join import hash_join

    schema_l = pa.schema([("k", pa.string()), ("t", pa.int64())])
    left = _blocks_dataset(
        [schema_l.empty_table()] * 7
        + [pa.table({"k": ["a", "b", "c"], "t": [1, 2, 3]}, schema=schema_l)]
    )
    r1 = ray.data.from_arrow(pa.table({"k": ["a", "b", "c"], "x": [7, 8, 9]}))
    r2 = ray.data.from_arrow(pa.table({"k": ["a", "b", "c"], "y": [4, 5, 6]}))
    j1 = hash_join(left, r1, on=["k"], how="inner", num_partitions=4)
    j2 = hash_join(j1, r2, on=["k"], how="left_outer", num_partitions=4)
    out = j2.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == ["a", "b", "c"]
    assert list(out["x"]) == [7, 8, 9]
    assert list(out["y"]) == [4, 5, 6]
