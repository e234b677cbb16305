"""Deletion-vector (merge-on-read) dedup: equivalence with rewrite mode.

The two materialization modes must be interchangeable: identical rollup
tiers (bit-for-bit), identical token checksums, and the merge-on-read
payload view must equal the physically rewritten deduped table row-for-row
(the token-array-equality invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest
import ray.data

from contest_parsing_ray.config import PipelineConfig
from contest_parsing_ray.pipelines.rollup_pipeline import run_rollup_pipeline
from contest_parsing_ray.stages.deletion_vector import (
    build_deduped_dv,
    dv_manifest_file,
    load_deletion_vectors,
    read_deduped_dv,
    read_sidecar,
)


def _tier_frame(out_dir: str, tier: str) -> pd.DataFrame:
    t = pads.dataset(
        os.path.join(out_dir, "rollup", "data", f"tier={tier}"),
        partitioning="hive",
    ).to_table().to_pandas()
    t = t[sorted(t.columns)]
    return t.sort_values(["source", "bucket_us"], kind="stable").reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def both_modes(sequences_dir, tmp_path_factory):
    outs = {}
    for mode in ("deletion_vector", "rewrite"):
        out = str(tmp_path_factory.mktemp(f"dv_{mode}"))
        cfg = PipelineConfig(out_dir=out, dedup_materialize=mode)
        run_rollup_pipeline(sequences_dir, cfg, resume=False)
        outs[mode] = out
    return outs


def test_tiers_bit_identical_across_modes(both_modes):
    for tier in ("1m", "5m", "1h"):
        a = _tier_frame(both_modes["deletion_vector"], tier)
        b = _tier_frame(both_modes["rewrite"], tier)
        pd.testing.assert_frame_equal(a, b)


def test_token_checksums_identical_across_modes(both_modes):
    cks = {}
    for mode, out in both_modes.items():
        with open(os.path.join(out, "manifests", "1m.json")) as f:
            cks[mode] = json.load(f)["token_checksums"]
    assert cks["deletion_vector"] == cks["rewrite"]
    assert len(cks["deletion_vector"]) == 8


def test_merge_on_read_payload_equals_rewrite(both_modes):
    """Token-array equality: the DV view yields exactly the rewrite-mode
    deduped table (same doc_ids, byte-identical token arrays)."""
    dv = read_deduped_dv(
        os.path.join(both_modes["deletion_vector"], "deduped")
    ).to_pandas()
    rw = ray.data.read_parquet(
        os.path.join(both_modes["rewrite"], "deduped", "data")
    ).to_pandas()
    assert len(dv) == len(rw)
    for df in (dv, rw):
        df["tok_bytes"] = df["tokens"].map(
            lambda a: np.asarray(a, dtype=np.int32).tobytes()
        )
    a = dv[["doc_id", "n_tok", "tok_bytes"]].sort_values("doc_id").reset_index(
        drop=True
    )
    b = rw[["doc_id", "n_tok", "tok_bytes"]].sort_values("doc_id").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b)


def test_dv_keep_none_drops_all_copies(sequences_dir, tmp_path):
    out = str(tmp_path / "dv_none")
    m = build_deduped_dv(sequences_dir, out, keep="none")
    # every flagged TRUE duplicate is deleted under keep='none'
    raw = ray.data.read_parquet(sequences_dir).to_pandas()
    dup_keys = raw["doc_id"].value_counts()
    n_dup_rows = int(dup_keys[dup_keys > 1].sum())
    assert m["n_deleted"] == n_dup_rows > 0
    survivors = read_deduped_dv(out).to_pandas()
    assert len(survivors) == len(raw) - n_dup_rows
    assert survivors["doc_id"].is_unique
    # sidecar row count matches the survivor count
    assert read_sidecar(out).count() == len(survivors)


def test_dv_keep_first_deterministic(sequences_dir, tmp_path):
    """keep='first' keeps exactly one copy per key — the minimum
    (file_idx, pos) — and two builds produce identical vectors."""
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = build_deduped_dv(sequences_dir, out1, keep="first")
    m2 = build_deduped_dv(sequences_dir, out2, keep="first")
    assert m1["n_deleted"] == m2["n_deleted"] > 0
    dv1, dv2 = load_deletion_vectors(out1), load_deletion_vectors(out2)
    assert dv1.keys() == dv2.keys()
    for k in dv1:
        np.testing.assert_array_equal(dv1[k], dv2[k])
    survivors = read_deduped_dv(out1).to_pandas()
    assert survivors["doc_id"].is_unique
    raw = ray.data.read_parquet(sequences_dir).to_pandas()
    assert len(survivors) == raw["doc_id"].nunique()


def test_dv_distributed_decision_matches_local(sequences_dir, tmp_path):
    """local_threshold=0 forces the distributed winner decision — the
    deletion vectors must be identical to the driver-side decision."""
    out_l, out_d = str(tmp_path / "local"), str(tmp_path / "dist")
    build_deduped_dv(sequences_dir, out_l, keep="first")
    build_deduped_dv(sequences_dir, out_d, keep="first", local_threshold=0)
    dv_l, dv_d = load_deletion_vectors(out_l), load_deletion_vectors(out_d)
    assert dv_l.keys() == dv_d.keys()
    for k in dv_l:
        np.testing.assert_array_equal(dv_l[k], dv_d[k])
    # sidecar contents agree too (same survivor multiset)
    a = read_sidecar(out_l).to_pandas().sort_values(
        ["source", "event_time_us", "token_ck", "n_tok"]
    ).reset_index(drop=True)
    b = read_sidecar(out_d).to_pandas().sort_values(
        ["source", "event_time_us", "token_ck", "n_tok"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dv_no_duplicates_input(tmp_path):
    """An input with zero duplicate keys produces empty vectors and a
    sidecar covering every row."""
    from contest_parsing_ray.sources.synthetic import write_sequences_parquet

    d = write_sequences_parquet(
        str(tmp_path / "seq"), n_rows=2_000, seed=7, num_files=2,
        dup_fraction=0.0,
    )
    out = str(tmp_path / "out")
    m = build_deduped_dv(d, out)
    assert m["n_deleted"] == 0
    assert load_deletion_vectors(out) == {}
    assert read_sidecar(out).count() == 2_000
    with open(dv_manifest_file(out)) as f:
        assert json.load(f)["completed"]


def test_dv_resume_skips_rebuild(sequences_dir, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out)
    m1 = run_rollup_pipeline(sequences_dir, cfg)
    assert m1["tiers"]
    m2 = run_rollup_pipeline(sequences_dir, cfg)
    assert sorted(m2["tiers_skipped_by_resume"]) == ["1h", "1m", "5m"]
    assert m2["total_seconds"] < m1["total_seconds"] / 5


def test_fused_partials_written_and_equal_to_sidecar_path(
    sequences_dir, tmp_path
):
    """The scan-fused partials (clean per-file shards + decide winners
    shards) must merge to the same tier points as recomputing partials
    from the sidecar (salt='auto' disables fusion, so it exercises the
    sidecar path on the same input)."""
    out_f = str(tmp_path / "fused")
    run_rollup_pipeline(
        sequences_dir, PipelineConfig(out_dir=out_f), resume=False
    )
    # fused artifacts exist and the manifest records their fingerprint
    from contest_parsing_ray.stages.deletion_vector import fused_partials_dir

    pdir = fused_partials_dir(os.path.join(out_f, "deduped"))
    assert any(f.startswith("clean-") for f in os.listdir(pdir))
    with open(dv_manifest_file(os.path.join(out_f, "deduped"))) as f:
        assert json.load(f)["partials_fingerprint"]

    out_s = str(tmp_path / "sidecar")
    run_rollup_pipeline(
        sequences_dir, PipelineConfig(out_dir=out_s, salt="auto"),
        resume=False,
    )
    for tier in ("1m", "5m", "1h"):
        pd.testing.assert_frame_equal(
            _tier_frame(out_f, tier), _tier_frame(out_s, tier)
        )


def test_fused_partials_stale_config_falls_back(sequences_dir, tmp_path):
    """Changing the tier spec invalidates the fused partials (fingerprint
    mismatch) — the pipeline recomputes from the sidecar and matches a
    from-scratch build with the same spec."""
    out = str(tmp_path / "out")
    cfg1 = PipelineConfig(out_dir=out)
    run_rollup_pipeline(sequences_dir, cfg1, resume=False)
    # same out_dir, different tiers: dedup manifest still matches (resume
    # keeps it) but the fused partials were built for the old tier set
    cfg2 = PipelineConfig(out_dir=out, tiers=("2m",))
    m = run_rollup_pipeline(sequences_dir, cfg2)
    assert m["tiers"].get("2m", {}).get("points", 0) > 0
    fresh = str(tmp_path / "fresh")
    run_rollup_pipeline(
        sequences_dir,
        PipelineConfig(out_dir=fresh, tiers=("2m",)),
        resume=False,
    )
    pd.testing.assert_frame_equal(_tier_frame(out, "2m"), _tier_frame(fresh, "2m"))


def test_dv_manifest_io_accepts_file_uri(tmp_path):
    """A file:// out_dir must write the manifest AT the resolved path —
    a raw open() would create a literal './file:/...' directory relative
    to the cwd (the round-3 stray artifact this guards against)."""
    import json
    import os

    from contest_parsing_ray.stages.deletion_vector import (
        _read_dv_manifest,
        _write_dv_manifest,
        dv_manifest_file,
    )

    out = str(tmp_path / "dv_out")
    uri = "file://" + out
    _write_dv_manifest(uri, {"files": [], "policy": "first"})
    # the manifest exists at the RESOLVED local path
    assert os.path.exists(dv_manifest_file(out))
    assert not os.path.exists("file:")  # no literal URI-named dir in cwd
    m = _read_dv_manifest(uri)
    assert m["policy"] == "first"
    assert _read_dv_manifest(out) == m  # plain-path read sees the same file
