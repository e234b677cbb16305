"""Flagship pipeline end-to-end + resume tests."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from contest_parsing_ray.config import PipelineConfig
from contest_parsing_ray.pipelines.rollup_pipeline import run_rollup_pipeline


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def test_pipeline_end_to_end_and_resume(sequences_dir, out_dir):
    # rewrite mode: the physical deduped-table layout (the default
    # deletion_vector layout is covered by tests/test_deletion_vector.py)
    cfg = PipelineConfig(
        tiers=("1m", "1h"), out_dir=out_dir, dedup_materialize="rewrite"
    )
    m1 = run_rollup_pipeline(sequences_dir, cfg)
    assert set(m1["tiers"]) == {"1m", "1h"}
    # deduped table written with token checksums in tier manifests
    assert os.path.isdir(os.path.join(out_dir, "deduped", "data"))
    import json
    man = json.load(open(os.path.join(out_dir, "manifests", "1m.json")))
    assert len(man.get("token_checksums", {})) == 8
    assert m1["tiers"]["1m"]["points"] > m1["tiers"]["1h"]["points"] > 0

    # outputs exist, partitioned by (tier, source), with manifests
    for tier in ("1m", "1h"):
        tdir = os.path.join(out_dir, "rollup", "data", f"tier={tier}")
        assert os.path.exists(os.path.join(out_dir, "manifests", f"{tier}.json"))
        subdirs = [d for d in os.listdir(tdir) if d.startswith("source=")]
        assert len(subdirs) == 8
        assert os.path.isdir(os.path.join(out_dir, "chunks", f"tier={tier}"))

    # gap-filled: the 1m tier carries the filled flag and a complete grid
    t = pads.dataset(os.path.join(out_dir, "rollup", "data", "tier=1m")).to_table().to_pandas()
    assert "filled" in t.columns and t["filled"].any()

    # resume: second run skips everything
    m2 = run_rollup_pipeline(sequences_dir, cfg)
    assert sorted(m2["tiers_skipped_by_resume"]) == ["1h", "1m"]
    assert m2["tiers"] == {}
    assert m2["total_seconds"] < m1["total_seconds"] / 5

    # changed config -> rebuild
    cfg2 = PipelineConfig(tiers=("1m", "1h"), out_dir=out_dir, gapfill_mode="linear")
    m3 = run_rollup_pipeline(sequences_dir, cfg2)
    assert m3["tiers"] != {}


def test_pipeline_partial_resume(sequences_dir, out_dir):
    cfg = PipelineConfig(tiers=("5m",), out_dir=out_dir)
    run_rollup_pipeline(sequences_dir, cfg)
    # simulate a killed run: delete one tier's manifest, add another tier
    cfg2 = PipelineConfig(tiers=("5m", "1h"), out_dir=out_dir)
    m = run_rollup_pipeline(sequences_dir, cfg2)
    # 5m was built under a different config fingerprint -> rebuilt; the point
    # is that resume decisions are per tier
    assert "1h" in m["tiers"]


def test_retention_expiry(sequences_dir, out_dir):
    """Retention policy: old buckets dropped per tier, manifest updated."""
    from contest_parsing_ray.stages.retention import (
        apply_retention,
        read_tier_manifest,
        tier_data_dir,
    )
    import pyarrow.dataset as pads

    cfg = PipelineConfig(tiers=("1m",), out_dir=out_dir)
    run_rollup_pipeline(sequences_dir, cfg, with_compression=False)
    tdir = tier_data_dir(out_dir, "1m")
    before = pads.dataset(tdir, partitioning="hive").to_table()
    buckets = sorted(set(before.column("bucket_us").to_pylist()))
    # keep only the last hour of buckets relative to the max bucket
    now = buckets[-1] + 60_000_000
    res = apply_retention(out_dir, "1m", keep_us=3_600_000_000, now_us=now)
    after = pads.dataset(tdir, partitioning="hive").to_table()
    assert res["dropped"] > 0
    assert res["kept"] == after.num_rows
    assert min(after.column("bucket_us").to_pylist()) >= now - 3_600_000_000
    man = read_tier_manifest(out_dir, "1m")
    assert man["retention"][0]["dropped"] == res["dropped"]
    assert man["total_rows"] == res["kept"]


def test_skew_histogram_and_salt(sequences_dir):
    from contest_parsing_ray.sources.ingest import read_sequences
    from contest_parsing_ray.stages._shuffle import choose_salt, key_histogram

    ds = read_sequences(sequences_dir, with_tokens=False)
    hist = key_histogram(ds, "source")
    # the generator makes web-crawl ~80% of rows (FIXTURES F1)
    assert hist.iloc[0]["source"] == "web-crawl"
    assert 0.7 < hist.iloc[0]["share"] < 0.9
    salt = choose_salt(hist, num_partitions=16)
    assert salt >= 12  # hot key split across most partitions
    # uniform histogram -> no salting
    import pandas as pd

    uni = pd.DataFrame({"source": ["a", "b"], "cnt": [5, 5], "share": [0.5, 0.5]})
    assert choose_salt(uni, num_partitions=2) == 1


def test_pipeline_auto_salt_matches_unsalted(sequences_dir, tmp_path):
    """salt='auto' measures the skewed fixture (web-crawl ~80% of rows),
    picks a factor, and still produces the identical rollup output."""
    import pyarrow.dataset as pads

    from contest_parsing_ray.config import PipelineConfig
    from contest_parsing_ray.pipelines.rollup_pipeline import run_rollup_pipeline

    outs = {}
    for label, salt in (("auto", "auto"), ("unsalted", 1)):
        cfg = PipelineConfig(
            out_dir=str(tmp_path / label), tiers=("1h",), salt=salt,
            ingest_tokens=False,
        )
        m = run_rollup_pipeline(
            sequences_dir, cfg, with_gapfill=False, with_compression=False,
            resume=False,
        )
        if label == "auto":
            assert m["salt"] >= 1  # measured, recorded in metrics
        outs[label] = (
            pads.dataset(str(tmp_path / label / "rollup" / "data"),
                         partitioning="hive")
            .to_table()
            .to_pandas()
            .sort_values(["source", "bucket_us"])
            .reset_index(drop=True)
        )
    a, b = outs["auto"], outs["unsalted"]
    assert (a["cnt"] == b["cnt"]).all()
    np.testing.assert_allclose(a["sum_v"], b["sum_v"])
    np.testing.assert_allclose(a["p95_v"], b["p95_v"], rtol=1e-9)


def test_bad_salt_spec():
    from contest_parsing_ray.config import PipelineConfig

    with pytest.raises(ValueError, match="salt"):
        PipelineConfig(salt=0)
    with pytest.raises(ValueError, match="salt"):
        PipelineConfig(salt="lots")


def test_csv_sink_roundtrip(sequences_dir, tmp_path):
    """S6: rollup points exported via the native CSV sink read back
    row-identical (engine intermediates stay Parquet by design — CSV is an
    export-only surface; reference analog DataFrameHandler.py save_csv)."""
    import glob

    from contest_parsing_ray.sources.ingest import read_sequences
    from contest_parsing_ray.stages.rollup import rollup_tiers

    r = rollup_tiers(
        read_sequences(sequences_dir, with_tokens=False),
        {"1h": 3_600_000_000}, value_col="n_tok",
    )["1h"]
    expect = r.to_pandas().sort_values(["source", "bucket_us"]).reset_index(drop=True)
    out = str(tmp_path / "csv_out")
    r.write_csv(out)
    files = sorted(glob.glob(f"{out}/*.csv"))
    assert files, "no CSV files written"
    got = (
        pd.concat([pd.read_csv(f) for f in files], ignore_index=True)
        .sort_values(["source", "bucket_us"])
        .reset_index(drop=True)[expect.columns.tolist()]
    )
    assert got["cnt"].tolist() == expect["cnt"].tolist()
    np.testing.assert_allclose(got["sum_v"], expect["sum_v"])
    np.testing.assert_allclose(got["p95_v"], expect["p95_v"], rtol=1e-12)
