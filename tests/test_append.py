"""Incremental rollup on append (continuous aggregates).

Appending new parquet shards must (a) process only the delta, (b) merge
into the stored tier state, (c) produce points identical to a from-scratch
rebuild (exactly, while merged value counts stay under quantile_cap — the
fixture uses a high cap so every group is exact; above the cap both paths
are deterministic compactions that may differ in p95's last digits, which
the module docstring documents), and (d) dedup new rows against OLD
occurrences (keep='first': prior winners stay, new copies lose).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from contest_parsing_ray.config import PipelineConfig
from contest_parsing_ray.pipelines.rollup_pipeline import run_rollup_pipeline
from contest_parsing_ray.sources.synthetic import (
    make_sequences_table,
    write_sequences_parquet,
)


def _tier(out_dir: str, tier: str) -> pd.DataFrame:
    t = pads.dataset(
        os.path.join(out_dir, "rollup", "data", f"tier={tier}"),
        partitioning="hive",
    ).to_table().to_pandas()
    t = t[sorted(t.columns)]
    return t.sort_values(["source", "bucket_us"], kind="stable").reset_index(
        drop=True
    )


@pytest.fixture()
def corpus(tmp_path):
    d = str(tmp_path / "seq")
    write_sequences_parquet(d, n_rows=8_000, seed=42, num_files=4)
    return d


CAP = 65536  # every merged group stays exact -> bit-identical paths


def test_append_matches_from_scratch(corpus, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out, quantile_cap=CAP)
    m1 = run_rollup_pipeline(corpus, cfg)
    assert m1["tiers"]

    # delta: fresh rows (seed 7) PLUS exact copies of existing rows — the
    # copies must lose to the prior occurrences (keep='first')
    extra = make_sequences_table(2_000, seed=7)
    base0 = pq.read_table(os.path.join(corpus, "part-0000.parquet"))
    dup_slice = base0.slice(0, 100)
    pq.write_table(extra, os.path.join(corpus, "part-9000.parquet"))
    pq.write_table(dup_slice, os.path.join(corpus, "part-9001.parquet"))

    m2 = run_rollup_pipeline(corpus, cfg)
    assert m2.get("incremental_append") is True
    assert sorted(m2["appended_input_files"]) == [
        os.path.join(corpus, "part-9000.parquet"),
        os.path.join(corpus, "part-9001.parquet"),
    ]

    out2 = str(tmp_path / "scratch")
    run_rollup_pipeline(corpus, PipelineConfig(out_dir=out2, quantile_cap=CAP),
                        resume=False)
    for tier in ("1m", "5m", "1h"):
        pd.testing.assert_frame_equal(_tier(out, tier), _tier(out2, tier))

    # token checksums merged exactly
    ma = json.load(open(os.path.join(out, "manifests", "1m.json")))
    mb = json.load(open(os.path.join(out2, "manifests", "1m.json")))
    assert ma["token_checksums"] == mb["token_checksums"]
    assert ma["appends"], "append recorded in lineage"

    # cross-file dedup: the 100 copied rows all lost; sidecar row counts
    # match the from-scratch survivor count
    from contest_parsing_ray.stages.deletion_vector import (
        dv_manifest_file,
        read_sidecar,
    )

    man = json.load(open(dv_manifest_file(os.path.join(out, "deduped"))))
    assert man["appends"][-1]["n_deleted_new"] >= 100
    assert (
        read_sidecar(os.path.join(out, "deduped")).count()
        == read_sidecar(os.path.join(out2, "deduped")).count()
    )

    # a third run with nothing new is a plain resume no-op
    m3 = run_rollup_pipeline(corpus, cfg)
    assert sorted(m3["tiers_skipped_by_resume"]) == ["1h", "1m", "5m"]


def test_append_keep_none_falls_back_to_rebuild(corpus, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out, dedup_keep="none", quantile_cap=CAP)
    run_rollup_pipeline(corpus, cfg)
    pq.write_table(
        make_sequences_table(1_000, seed=5),
        os.path.join(corpus, "part-9000.parquet"),
    )
    m = run_rollup_pipeline(corpus, cfg)
    assert not m.get("incremental_append")  # retroactive policy -> rebuild
    out2 = str(tmp_path / "scratch")
    run_rollup_pipeline(
        corpus,
        PipelineConfig(out_dir=out2, dedup_keep="none", quantile_cap=CAP),
        resume=False,
    )
    for tier in ("1m", "5m", "1h"):
        pd.testing.assert_frame_equal(_tier(out, tier), _tier(out2, tier))


def test_append_modified_prior_file_rebuilds(corpus, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out, quantile_cap=CAP)
    run_rollup_pipeline(corpus, cfg)
    # rewrite a prior file in place (content change) -> full rebuild
    p = os.path.join(corpus, "part-0000.parquet")
    t = pq.read_table(p)
    shutil.copy(p, p + ".bak")
    pq.write_table(t.slice(0, len(t) - 10), p)
    m = run_rollup_pipeline(corpus, cfg)
    assert not m.get("incremental_append")
    assert m["tiers"], "rebuilt"


def test_distributed_stats_match_driver(corpus, tmp_path):
    """_partition_stats_from_disk: the per-partition Ray-task branch
    (threshold=0) produces the identical manifest stats as the driver
    read (verdict: distributed tier stats)."""
    from contest_parsing_ray.stages.retention import (
        _partition_stats_from_disk,
        tier_data_dir,
    )

    out = str(tmp_path / "out")
    run_rollup_pipeline(corpus, PipelineConfig(out_dir=out))
    tdir = tier_data_dir(out, "1m")
    a = _partition_stats_from_disk(tdir, "source")
    b = _partition_stats_from_disk(tdir, "source", distributed_threshold_bytes=0)
    assert a == b and len(a) == 8


def test_distributed_retention_many_partitions(tmp_path):
    """apply_retention's Ray-task branch (>16 files) matches per-file
    semantics and also expires the mergeable state."""
    from contest_parsing_ray.stages.retention import (
        apply_retention,
        tier_data_dir,
        tier_state_dir,
    )

    out = str(tmp_path / "out")
    tdir = tier_data_dir(out, "1m")
    sdir = tier_state_dir(out, "1m")
    import pyarrow as pa

    # 20 source partitions x (data + state) = 40 files -> distributed branch
    for i in range(20):
        for root in (tdir, sdir):
            pdir = os.path.join(root, f"source=s{i:02d}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "bucket_us": pa.array(
                            [0, 1_000_000, 2_000_000], type=pa.int64()
                        ),
                        "cnt": pa.array([1, 1, 1], type=pa.int64()),
                    }
                ),
                os.path.join(pdir, "part-0000.parquet"),
            )
    # cutoff 1.5e6: buckets 0 and 1e6 drop, 2e6 stays (per data file)
    res = apply_retention(out, "1m", keep_us=1_000_000, now_us=2_500_000)
    assert res["dropped"] == 40 and res["kept"] == 20
    for root in (tdir, sdir):
        t = pads.dataset(os.path.join(root, "source=s00")).to_table()
        assert min(t["bucket_us"].to_pylist()) >= 1_500_000


def test_append_late_events_update_finalized_buckets_and_chunks(
    corpus, tmp_path
):
    """LATE-DATA CONTRACT (round-5 task #8): appending a shard whose
    events land in already-finalized buckets must (a) take the
    incremental path, (b) merge the deltas into those old buckets
    exactly (tiers == from-scratch rebuild), and (c) leave the
    compressed chunks (exec-5 output) consistent — chunks are a pure
    function of the tier data and are regenerated on append, so the
    incremental run's chunks must equal a from-scratch rebuild's
    byte-for-byte."""
    import pyarrow as pa

    out = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out, quantile_cap=CAP)
    m1 = run_rollup_pipeline(corpus, cfg)
    assert m1["tiers"]
    before = _tier(out, "1h")

    # late shard: rows re-pinned to the corpus's EARLIEST minute (buckets
    # finalized long ago), with fresh seq/doc ids so dedup keeps them
    base0 = pq.read_table(os.path.join(corpus, "part-0000.parquet"))
    ids = base0["doc_id"].to_pylist()
    min_minute = min(int(i.split("/")[1]) for i in ids)
    late = base0.slice(0, 200)
    new_ids = [
        f"{i.split('/')[0]}/{min_minute:012d}/{900000 + k:06d}"
        for k, i in enumerate(late["doc_id"].to_pylist())
    ]
    late = late.set_column(
        late.schema.get_field_index("doc_id"), "doc_id",
        pa.array(new_ids, pa.string()),
    )
    pq.write_table(late, os.path.join(corpus, "part-9100.parquet"))

    m2 = run_rollup_pipeline(corpus, cfg)
    assert m2.get("incremental_append") is True

    # the earliest (long-finalized) 1h bucket gained the late counts
    after = _tier(out, "1h")
    b0 = before.groupby("bucket_us")["cnt"].sum()
    a0 = after.groupby("bucket_us")["cnt"].sum()
    first_bucket = a0.index.min()
    assert a0[first_bucket] == b0.get(first_bucket, 0) + 200

    # tiers: incremental == from-scratch
    out2 = str(tmp_path / "scratch")
    run_rollup_pipeline(
        corpus, PipelineConfig(out_dir=out2, quantile_cap=CAP), resume=False
    )
    for tier in ("1m", "5m", "1h"):
        pd.testing.assert_frame_equal(_tier(out, tier), _tier(out2, tier))

    # chunks: regenerated on append, equal to the rebuild's byte-for-byte
    for tier in ("1m", "5m", "1h"):
        ca = pads.dataset(
            os.path.join(out, "chunks", f"tier={tier}")
        ).to_table().to_pandas()
        cb = pads.dataset(
            os.path.join(out2, "chunks", f"tier={tier}")
        ).to_table().to_pandas()
        key = ["source", "chunk_id"]
        ca = ca.sort_values(key, kind="stable").reset_index(drop=True)
        cb = cb.sort_values(key, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(ca[sorted(ca.columns)],
                                      cb[sorted(cb.columns)])
