"""Per-trace tree reconstruction + depth statistics.

Reference analog: ``TreeBuilder.py:29-56`` + the bundled ``contest_tree``
wheel (``contest_tree/model/Node.py:42-59``, ``Tree.py:16-36``): roots are
spans with a null parent pointer, children of X are rows with
``childSpanID == X.spanID``, and every node emits
``(self_depth, max_depth, min_depth, mean_depth)`` where the depth stats
are over the LEAF depths of the node's subtree. The reference rebuilds the
tree with an O(spans^2) filter-per-node recursive descent; here each group
builds an O(n) parent→children index.

Execution: hash-partition by trace id (all spans of a trace co-locate),
then ONE call per partition that loops traces locally — Python per trace,
but traces are small (10s-100s of spans) and partitions process thousands
of traces per task without Ray per-group overhead.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import ray.data

from ._shuffle import hash_partitioned_map


def _trace_depth_stats(
    span_ids: np.ndarray, parent_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Depth stats for one trace. Returns (self_depth, max_d, min_d, mean_d)
    per span, in input order. Orphan parents (pointer to a span outside the
    trace) are treated as roots, like the reference's null-ref case."""
    n = len(span_ids)
    index = {s: i for i, s in enumerate(span_ids)}
    children: dict[int, list[int]] = defaultdict(list)
    roots: list[int] = []
    for i in range(n):
        p = parent_ids[i]
        if p is None or p not in index or index[p] == i:
            roots.append(i)
        else:
            children[index[p]].append(i)

    self_depth = np.zeros(n, dtype=np.int64)
    # iterative DFS for depths (reference recurses, TreeBuilder.py:29-47)
    stack = [(r, 0) for r in roots]
    seen = set()
    while stack:
        i, d = stack.pop()
        if i in seen:  # cycle guard (malformed refs)
            continue
        seen.add(i)
        self_depth[i] = d
        for c in children[i]:
            stack.append((c, d + 1))

    # leaf depths per subtree via post-order accumulation
    max_d = np.full(n, -1, dtype=np.int64)
    min_d = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    sum_d = np.zeros(n, dtype=np.int64)
    cnt_d = np.zeros(n, dtype=np.int64)
    order = np.argsort(self_depth, kind="stable")[::-1]  # deepest first
    for i in order:
        if i not in seen:
            continue
        kids = [c for c in children[i] if c in seen]
        if not kids:  # leaf: its own depth is the only leaf depth
            max_d[i] = min_d[i] = self_depth[i]
            sum_d[i] = self_depth[i]
            cnt_d[i] = 1
        else:  # internal: combine children's leaf stats (already computed)
            max_d[i] = max(max_d[c] for c in kids)
            min_d[i] = min(min_d[c] for c in kids)
            sum_d[i] = sum(sum_d[c] for c in kids)
            cnt_d[i] = sum(cnt_d[c] for c in kids)
    mean_d = np.where(cnt_d > 0, sum_d / np.maximum(cnt_d, 1), np.nan)
    min_d = np.where(cnt_d > 0, min_d, -1)
    return self_depth, max_d, min_d, mean_d


def tree_depth_stats(
    spans: ray.data.Dataset,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """spans(trace, span, parent, ...) → (trace, span, self_depth,
    max_depth, min_depth, mean_depth). Computed without a join-back: depths
    are derived inside the per-trace group (SURVEY §2.9 G1/G2 → J6 avoided).
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for tid, g in df.groupby(trace_col, sort=False):
            sd, mx, mn, me = _trace_depth_stats(
                g[span_col].to_numpy(), g[parent_col].to_numpy()
            )
            outs.append(
                pd.DataFrame(
                    {
                        trace_col: tid,
                        span_col: g[span_col].to_numpy(),
                        "self_depth": sd,
                        "max_depth": mx,
                        "min_depth": mn,
                        "mean_depth": me,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            columns=[trace_col, span_col, "self_depth", "max_depth", "min_depth", "mean_depth"]
        )

    return hash_partitioned_map(
        spans, [trace_col], per_partition, num_partitions=num_partitions,
        batch_format="pandas",
    )
