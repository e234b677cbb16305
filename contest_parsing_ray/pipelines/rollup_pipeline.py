"""Flagship pipeline: sequences → dedup → tiered rollups → gap-fill →
compressed chunks → tiered Parquet with lineage manifests.

The Ray-Data re-expression of the reference's ``JoinManager().process()``
lifecycle (``JoinManager.py:32-57``): discovery → parse/normalize → bucket →
join/aggregate per (entity, bucket) → feature tail → outputs, but lazy and
streaming end to end (SURVEY §3.4). Stages:

  read_parquet(sequences)                       [streaming read, pruned cols]
    → derive event_time (pure fn of doc_id)     [stateless map_batches]
    → exact dedup on doc_id                     [hash shuffle, D1 semantics]
    → partial rollup per batch                  [stateless map_batches]
    → per-tier merge over partials              [small hash shuffles]
    → gap-fill per source                       [per-key map_groups]
    → write rollup=<tier>/source=<s>/ + manifest [resumable sink]
    → Gorilla/delta-of-delta chunks per tier    [sorted per-key encode]

Resume: tiers whose manifest matches the (input, config) fingerprints are
skipped without recomputation.
"""

from __future__ import annotations

import os
import time

import ray.data

from ..config import PipelineConfig
from ..sources.ingest import read_sequences
from ..stages.compress import compress_series
from ..stages.dedup import dedup
from ..stages.gapfill import gapfill
from ..stages.retention import tier_needs_build, write_tier
from ..stages.rollup import rollup_tiers
from ..state.manifest import fingerprint_config, fingerprint_input


def run_rollup_pipeline(
    input_path: str,
    cfg: PipelineConfig | None = None,
    with_gapfill: bool = True,
    with_compression: bool = True,
    resume: bool = True,
) -> dict:
    """Run the flagship pipeline; returns a metrics dict (rows ingested,
    points per tier, wall-clock per stage — the engine's analog of the
    reference's @timer prints, ``util/timedecorator.py:1-16``)."""
    cfg = cfg or PipelineConfig()
    t_start = time.perf_counter()
    metrics: dict = {"input": input_path, "tiers": {}, "stage_seconds": {}}

    input_fp = fingerprint_input(input_path)
    config_fp = fingerprint_config(
        {
            "tiers": cfg.tiers,
            "dedup_keep": cfg.dedup_keep,
            "quantile_cap": cfg.quantile_cap,
            "gapfill_mode": cfg.gapfill_mode if with_gapfill else None,
            "chunk_points": cfg.chunk_points if with_compression else None,
        }
    )

    tiers = dict(zip(cfg.tiers, cfg.tier_widths_us))
    todo = {
        name: w
        for name, w in tiers.items()
        if not resume or tier_needs_build(cfg.out_dir, name, input_fp, config_fp)
    }
    metrics["tiers_skipped_by_resume"] = sorted(set(tiers) - set(todo))
    if not todo:
        metrics["total_seconds"] = time.perf_counter() - t_start
        return metrics

    t0 = time.perf_counter()
    events = read_sequences(input_path, with_tokens=False)
    events = dedup(events, key="doc_id", keep=cfg.dedup_keep)
    rollups = rollup_tiers(
        events,
        todo,
        value_col="n_tok",
        quantile_cap=cfg.quantile_cap,
        salt=cfg.salt,
    )
    metrics["stage_seconds"]["plan"] = time.perf_counter() - t0

    for name in todo:
        t0 = time.perf_counter()
        tier_ds = rollups[name]
        if with_gapfill:
            tier_ds = gapfill(tier_ds, todo[name], mode=cfg.gapfill_mode)
        manifest = write_tier(
            tier_ds, cfg.out_dir, name, input_fp, config_fp, resume=resume
        )
        metrics["tiers"][name] = {
            "points": manifest["total_rows"],
            "partitions": len(manifest["partitions"]),
        }
        if with_compression:
            from ..stages.retention import read_tier

            chunks = compress_series(
                read_tier(cfg.out_dir, name),
                value_col="sum_v",
                chunk_points=cfg.chunk_points,
            )
            chunk_dir = os.path.join(cfg.out_dir, f"chunks={name}")
            from ..state.manifest import clear_dir

            clear_dir(chunk_dir)
            chunks.write_parquet(chunk_dir)
        metrics["stage_seconds"][f"tier_{name}"] = time.perf_counter() - t0

    metrics["total_seconds"] = time.perf_counter() - t_start
    return metrics
