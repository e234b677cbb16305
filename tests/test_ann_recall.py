"""LSH-bucketed near-dup: precision is 1.0 by construction (exact cosine
verify); recall is measured here against the exact block-pair path on the
real sf0.001 embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from contest_parsing_ray.stages.ann import (
    brute_force_topk,
    ivf_topk_cosine,
    lsh_bucket_neardup,
)
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


def _topk_frames(n_cells, n_probe):
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = ds.filter(expr="vec_id < 5").to_pandas()
    q = np.stack(qdf["embedding"].to_numpy())
    qi = qdf["vec_id"].to_numpy()
    brute = brute_force_topk(ds, q, qi, k=10).to_pandas()
    ivf = ivf_topk_cosine(
        ds, q, qi, k=10, n_cells=n_cells, n_probe=n_probe
    ).to_pandas()
    return brute, ivf


def test_ivf_full_probe_equals_brute():
    """n_probe == n_cells scans every cell — IVF must equal the exact path
    row-for-row (same partial-top-k + merge machinery, same tie-breaks)."""
    brute, ivf = _topk_frames(n_cells=8, n_probe=8)
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, ivf[key].itertuples(index=False))) == sorted(
        map(tuple, brute[key].itertuples(index=False))
    )


def test_ivf_partial_probe_recall():
    """The approximate config (probe 1/4 of cells) must keep most of the
    true top-10 per query — floor with margin to catch assignment or
    inverted-probe-list bugs."""
    brute, ivf = _topk_frames(n_cells=16, n_probe=4)
    to_set = lambda df: set(map(tuple, df[["query_id", "vec_id"]].itertuples(index=False)))
    exact, approx = to_set(brute), to_set(ivf)
    assert len(exact) == 50  # 5 queries x k=10
    recall = len(exact & approx) / len(exact)
    print(f"ivf recall @ n_probe=4/16: {recall:.3f}")
    assert recall >= 0.5


def test_pq_adc_recall_and_determinism():
    """PQ-ADC at 8 subspaces x 256 codes must keep most of the true
    top-10 (codes are a 32x-compressed view; exactness is not expected),
    and the seeded train must make the output run-to-run identical."""
    from contest_parsing_ray.stages.ann import pq_topk_cosine

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = (
        ds.filter(expr="vec_id < 5")
        .select_columns(["vec_id", "embedding"]).to_pandas()
    )
    q = np.stack(qdf["embedding"].to_numpy())
    qi = qdf["vec_id"].to_numpy()
    brute = brute_force_topk(ds, q, qi, k=10).to_pandas()
    pq1 = pq_topk_cosine(ds, q, qi, k=10, m_subspaces=8, n_codes=256).to_pandas()
    pq2 = pq_topk_cosine(ds, q, qi, k=10, m_subspaces=8, n_codes=256).to_pandas()
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, pq1[key].itertuples(index=False))) == sorted(
        map(tuple, pq2[key].itertuples(index=False))
    )
    to_set = lambda df: set(
        map(tuple, df[["query_id", "vec_id"]].itertuples(index=False))
    )
    exact, approx = to_set(brute), to_set(pq1)
    recall = len(exact & approx) / len(exact)
    print(f"pq-adc recall @ m=8, 256 codes: {recall:.3f}")
    assert recall >= 0.6
    # the query vector itself must be its own top hit even through codes
    top1 = pq1[pq1["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()


def test_pq_bad_params():
    from contest_parsing_ray.stages.ann import pq_topk_cosine

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="m_subspaces"):
        pq_topk_cosine(ds, np.zeros((1, 64)), np.array([0]), m_subspaces=0)
    with pytest.raises(ValueError, match="> dim"):
        pq_topk_cosine(ds, np.zeros((1, 64)), np.array([0]), m_subspaces=65)
