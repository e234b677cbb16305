"""Approximate-nearest-neighbor search over an embedding column.

Build-brief operator family. Two paths:

- ``brute_force_topk``: exact cosine top-k — the query matrix (small side)
  is normalized once and broadcast via ``ray.put``; each batch does one
  numpy matmul. This is the correctness baseline and is oracle-checkable
  against DuckDB ``list_cosine_similarity``.
- ``lsh_bucket_neardup``: random-hyperplane LSH (Charikar 2002) with
  FIXED seeded planes: vectors land in sign-pattern buckets; only
  within-bucket pairs are compared — the scale path (no all-pairs matmul,
  shuffle on bucket id). Recall < 1 by construction; measured in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ._shuffle import hash_partitioned_map


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """For each query vector: exact top-k by cosine (ties broken by smaller
    vec_id). Output (query_id, vec_id, rank), rank 1-based.

    Per-batch partial top-k (k best per batch per query) then a final
    merge — the batches never ship full similarity matrices.
    """
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids), qmat))

    class PartialTopK:
        def __init__(self):
            self.qids, self.q = ray.get(q_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            ids = batch[id_col].to_numpy()
            sims = self.q @ mat.T  # (nq, nb)
            nb = sims.shape[1]
            kk = min(k, nb)
            # per query: k best in this batch
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(self.qids, kk),
                id_col: ids[part.ravel()],
                "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
            }
            return pd.DataFrame(rows)

    partials = embeddings.map_batches(
        PartialTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for qid, g in df.groupby("query_id", sort=False):
            g = g.sort_values(
                ["cosine", id_col], ascending=[False, True], kind="stable"
            ).head(k)
            g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
            outs.append(g[["query_id", id_col, "rank"]])
        return pd.concat(outs, ignore_index=True)

    return hash_partitioned_map(
        partials, ["query_id"], merge, num_partitions=16, batch_format="pandas"
    )


def lsh_bucket_neardup(
    embeddings: ray.data.Dataset,
    dim: int,
    num_planes: int = 12,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    num_tables: int = 4,
) -> ray.data.Dataset:
    """Near-dup pairs via random-hyperplane LSH buckets (scale path).
    Only pairs sharing a bucket in ANY of ``num_tables`` tables are
    verified with exact cosine. Output (id_a, id_b, cosine)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    planes_ref = ray.put(planes)

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            ids = batch[id_col].to_numpy()
            outs = []
            for t in range(len(self.planes)):
                signs = (mat @ self.planes[t].T) > 0  # (n, planes)
                bucket = signs @ (1 << np.arange(signs.shape[1], dtype=np.int64))
                outs.append(
                    pd.DataFrame(
                        {
                            id_col: ids,
                            "table": np.int64(t),
                            "bucket": bucket.astype(np.int64),
                            vec_col: list(mat),
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)

    bucketed = embeddings.map_batches(
        Bucketize, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_, _), g in df.groupby(["table", "bucket"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates(subset=id_col).sort_values(id_col)
            m = np.stack(g[vec_col].to_numpy())
            ids = g[id_col].to_numpy()
            sims = m @ m.T
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            for a, b in zip(ia, ib):
                rows.append((ids[a], ids[b], sims[a, b]))
        if not rows:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"]).astype(
                {"cosine": np.float64}
            )
        out = pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])
        return out

    cand = hash_partitioned_map(
        bucketed, ["table", "bucket"], pairs, batch_format="pandas"
    )
    # dedup pairs found in several tables
    return hash_partitioned_map(
        cand,
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_partitions=16,
        batch_format="pandas",
    )
