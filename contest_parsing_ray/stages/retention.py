"""Tiered Parquet retention writer with lineage manifests.

Layout (resumable, partitioned — never one giant file):

    out/rollup=<tier>/source=<source>/*.parquet   + manifest.json per tier
    out/chunks=<tier>/...                          (compressed segments)

Reference analog: the per-stage Parquet sinks (``MetricsParser.py:139-143``
etc.) + output clearing (``JoinManager.py:189-195``), upgraded with the
atomicity/lineage design from SURVEY §4 (idempotent writes, per-partition
manifest, skip-completed-on-resume).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from ..state.manifest import (
    clear_dir,
    fingerprint_config,
    fingerprint_input,
    tier_is_complete,
    write_manifest,
)


def _partition_stats(rollup: ray.data.Dataset, key_col: str) -> dict:
    """rows + order-insensitive value checksum per partition, computed as a
    distributed aggregate (the rollup is never collected whole)."""
    import pyarrow as pa

    def stats_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        num = df.select_dtypes(include=[np.number])
        cksum = np.abs(np.nan_to_num(num.to_numpy(dtype=np.float64))).sum(axis=1)
        part = pd.DataFrame({"k": df[key_col].astype(str), "ck": cksum})
        agg = part.groupby("k", sort=False).agg(rows=("ck", "size"), ck=("ck", "sum"))
        return pa.table(
            {
                "k": pa.array(agg.index.to_numpy()),
                "rows": pa.array(agg["rows"].to_numpy(), type=pa.int64()),
                "ck": pa.array(agg["ck"].to_numpy(), type=pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = rollup.map_batches(stats_batch, batch_format="pyarrow")
    final = partials.groupby("k").aggregate(Sum("rows", alias_name="rows"), Sum("ck", alias_name="ck")).to_pandas()
    return {
        str(r["k"]): {"rows": int(r["rows"]), "checksum": int(abs(r["ck"]) * 1000) & 0xFFFFFFFFFFFF}
        for _, r in final.iterrows()
    }


def write_tier(
    rollup: ray.data.Dataset,
    out_dir: str,
    tier: str,
    input_fp: str,
    config_fp: str,
    key_col: str = "source",
    resume: bool = True,
) -> dict:
    """Write one tier partitioned by source; returns the manifest written.
    If ``resume`` and a matching complete manifest exists, skips the write
    entirely (the caller should not even compute the Dataset — use
    :func:`tier_needs_build` first to keep the pipeline lazy)."""
    tier_dir = os.path.join(out_dir, f"rollup={tier}")
    if resume and tier_is_complete(tier_dir, input_fp, config_fp):
        from ..state.manifest import read_manifest

        return read_manifest(tier_dir)

    clear_dir(tier_dir)
    # write once, reuse for stats: rollup datasets are orders of magnitude
    # smaller than events but can still be large — keep it distributed.
    # Data goes under data/ so the manifest never mixes into the parquet dir.
    rollup = rollup.materialize()
    rollup.write_parquet(os.path.join(tier_dir, "data"), partition_cols=[key_col])
    stats = _partition_stats(rollup, key_col)
    manifest = {
        "tier": tier,
        "input_fingerprint": input_fp,
        "config_fingerprint": config_fp,
        "partitions": stats,
        "total_rows": int(sum(p["rows"] for p in stats.values())),
        "completed": True,
    }
    write_manifest(tier_dir, manifest)
    return manifest


def tier_needs_build(out_dir: str, tier: str, input_fp: str, config_fp: str) -> bool:
    return not tier_is_complete(os.path.join(out_dir, f"rollup={tier}"), input_fp, config_fp)


def read_tier(out_dir: str, tier: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(out_dir, f"rollup={tier}", "data"))


__all__ = [
    "write_tier",
    "tier_needs_build",
    "read_tier",
    "fingerprint_input",
    "fingerprint_config",
]
