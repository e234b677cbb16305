"""LSH-bucketed near-dup: precision is 1.0 by construction (exact cosine
verify); recall is measured here against the exact block-pair path on the
real sf0.001 embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from contest_parsing_ray.stages.ann import lsh_bucket_neardup
from contest_parsing_ray.stages.neardup import embedding_neardup_pairs

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.35


@pytest.fixture(scope="module")
def pair_sets():
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = embedding_neardup_pairs(
        ds, threshold=THRESHOLD, target_block_rows=128
    ).to_pandas()
    lsh = lsh_bucket_neardup(ds, dim=64, threshold=THRESHOLD).to_pandas()
    to_set = lambda df: set(map(tuple, df[["id_a", "id_b"]].itertuples(index=False)))
    return to_set(exact), to_set(lsh)


def test_lsh_subset_of_exact(pair_sets):
    exact, lsh = pair_sets
    assert lsh <= exact  # exact-verified cosine => no false positives


def test_lsh_recall(pair_sets):
    exact, lsh = pair_sets
    assert len(exact) > 0
    recall = len(lsh & exact) / len(exact)
    # plan_lsh targets recall 0.8 (measured 0.856 on this table); assert a
    # floor with margin so regressions (bucket truncation, plane-count
    # bugs) are caught
    print(f"lsh_bucket_neardup recall vs exact @{THRESHOLD}: {recall:.3f} "
          f"({len(lsh & exact)}/{len(exact)})")
    assert recall >= 0.7
