"""Exact deduplication on a key column — both reference policies.

Reference analogs:
- ``keep='none'``: ``pl.read_parquet(dir/*).unique(keep='none')`` — rows whose
  key appears more than once are dropped ENTIRELY (all copies); motivated by
  traces appearing in multiple services' exports (reference
  ``FileConcat.py:22-23``, ``meta/wiki/old/insights-experience.md:32-34``).
- ``keep='first'``: ``joined.unique("spanID")`` after each metric join
  (reference ``Joiner.py:104,160,209``). The reference's keep is UNORDERED
  (nondeterministic); here "first" is made deterministic: the kept row is
  the minimum under ``tiebreak_cols`` ordering (SURVEY §2.7 D2 note).

Scale design: a naive ``groupby(key).map_groups(head(1))`` makes one Python
call per distinct key — millions of calls. Instead we hash-partition:
``part = hash64(key) % num_partitions`` (vectorized), one shuffle on the
small int key, then ONE vectorized pandas ``drop_duplicates`` /
``groupby.filter`` per partition. Key-hash is uniform, so the hot-source
skew of the input does not skew partitions. Heavy payload columns (tokens)
ride the shuffle untouched — the per-row token-array-equality invariant is
exactly that they come out byte-identical (checked in tests via the
checksum from ``sources.ingest.token_checksum``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ._shuffle import hash_partitioned_map


def dedup(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    keep: str = "first",
    tiebreak_cols: tuple[str, ...] = (),
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exact dedup on ``key``. keep='first' (deterministic min-tiebreak) or
    keep='none' (drop every copy of a duplicated key)."""
    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")

    def dedup_partition(t: pa.Table) -> pa.Table:
        # compute kept-row indices on the scalar key/tiebreak columns only,
        # then pa.Table.take so payload columns (tokens) pass through
        # byte-identical (the token-array-equality invariant)
        kdf = t.select([key, *tiebreak_cols]).to_pandas()
        if keep == "none":
            sizes = kdf.groupby(key, sort=False)[key].transform("size").to_numpy()
            idx = np.flatnonzero(sizes == 1)
        else:
            ordered = kdf.sort_values([key, *tiebreak_cols], kind="stable")
            firsts = ordered.drop_duplicates(subset=key, keep="first").index.to_numpy()
            idx = np.sort(firsts)
        return t.take(idx)

    return hash_partitioned_map(
        ds, [key], dedup_partition, num_partitions=num_partitions, batch_format="pyarrow"
    )
