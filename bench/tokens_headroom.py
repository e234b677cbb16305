"""Scale-headroom check for the tokens-axis operators (VERDICT r3 item #9).

Runs the three token-payload operators that were previously benched only at
1M rows — vocab_histogram, dup_ngram_stats, source_token_richness — over a
deterministic synthetic sequences corpus large enough that the in-memory
Arrow token payload EXCEEDS the Ray object store (100M rows ~= 70 GB raw
int32 tokens vs the ~38 GB default store on this 128 GB host), so the
streaming executor's spill + backpressure path is what's actually measured.

The corpus is the engine's own generator (sources/synthetic.py, seed 42) —
same distribution as the flagship bench, written once under /tmp and
reused.  Usage:

    python bench/tokens_headroom.py --rows 100000000 --cpus 32 \
        [--queries vocab_hist,dup_ngram_frac,richness]

Prints one JSON line and appends it to bench/tokens_headroom_r4.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--queries", default="vocab_hist,dup_ngram_frac,richness"
    )
    ap.add_argument("--num-files", type=int, default=128)
    ap.add_argument("--max-hot-spans", type=int, default=1_000_000)
    ap.add_argument("--slice-bytes", type=int, default=8 << 30)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False
        )

    # Cap the streaming executor's object-store budget. Without it the
    # fast parquet read races ~40 GB ahead of the compute-bound bincount
    # partials and the raylet spills until it hits the 95%-disk floor
    # (this VM's ONE 252 GB disk stands in for N per-node disks, so spill
    # headroom does not scale the way a real cluster's would). A bounded
    # budget turns that read-ahead into backpressure — the designed
    # streaming behavior — instead of unbounded spill.
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.execution_options.resource_limits = ray.data.ExecutionResources(
        object_store_memory=16 * 1024**3
    )

    from contest_parsing_ray.sources.synthetic import write_sequences_parquet

    d = write_sequences_parquet(
        f"/tmp/graft_seqs_{args.rows}",
        n_rows=args.rows,
        seed=42,
        num_files=args.num_files,
    )

    import ray.data

    from contest_parsing_ray.stages.sampling import hash_split
    from contest_parsing_ray.stages.tokens import (
        cross_doc_span_stats,
        dup_ngram_stats,
        source_token_richness,
        strip_cross_doc_spans,
        vocab_histogram,
    )

    def _seqs():
        return ray.data.read_parquet(d)

    runs: dict[str, dict] = {}
    for q in args.queries.split(","):
        t0 = time.time()
        if q == "vocab_hist":
            ds = _seqs()
            out = vocab_histogram(ds, raw_shard_paths=ds.input_files())
            n_out = out.count()
        elif q == "dup_ngram_frac":
            out = dup_ngram_stats(_seqs(), n=8)
            n_out = out.count()
        elif q == "richness":
            ds = _seqs()
            out = source_token_richness(ds, raw_shard_paths=ds.input_files())
            n_out = out.count()
        elif q == "cross_doc_spans":
            # the 100-TB configuration: bounded-driver hot set, per-shard
            # fused read+pair combiner (no payload at the boundary), and
            # hash-domain slicing bounding the materialized exchange
            ds = _seqs()
            out = cross_doc_span_stats(
                ds, n=8, min_docs=2, max_hot_spans=args.max_hot_spans,
                raw_shard_paths=ds.input_files(),
                slice_bytes=args.slice_bytes,
            )
            n_out = out.count()
        elif q == "strip_spans":
            ds = _seqs()
            out = strip_cross_doc_spans(
                ds, n=8, min_docs=2, max_hot_spans=args.max_hot_spans,
                raw_shard_paths=ds.input_files(),
                slice_bytes=args.slice_bytes,
            )
            # consume via an aggregate over the cleaned lengths so the
            # full payload is produced but not collected
            n_out = out.select_columns(["n_tok"]).count()
        elif q == "split":
            out = hash_split(
                _seqs().select_columns(["doc_id"]), "doc_id",
                {"train": 0.9, "val": 0.05, "test": 0.05},
            )
            n_out = out.count()
        else:
            raise SystemExit(f"unknown query {q!r}")
        wall = time.time() - t0
        runs[q] = {
            "sec": round(wall, 2),
            "out_rows": int(n_out),
            "rows_per_sec": round(args.rows / wall),
        }
        print(f"## {q}: {wall:.1f}s, {n_out} out rows", flush=True)

    rec = {
        "metric": "tokens-axis scale headroom",
        "rows": args.rows,
        "num_cpus": args.cpus,
        "input_dir": d,
        "queries": runs,
    }
    line = json.dumps(rec)
    print(line)
    out_path = os.path.join(os.path.dirname(__file__), "tokens_headroom_r4.jsonl")
    with open(out_path, "a") as f:
        f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
