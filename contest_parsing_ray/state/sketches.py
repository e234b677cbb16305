"""Mergeable quantile summary for distributed p95.

min/max/sum/count compose across partial aggregates and across tiers;
quantiles don't (SURVEY §7.6). Partials therefore carry a *value summary*:

- EXACT mode (n <= cap): the raw float64 values. Merging concatenates.
  Finalize = numpy linear-interpolated quantile — identical to DuckDB's
  ``quantile_cont`` — so at test scale (sf0.01 groups are far below the
  cap) the result matches the SQL oracle bit-for-bit.
- COMPACT mode (n > cap): deterministic weighted compaction: sort, then
  keep every k-th value with weight k (a single-level KLL-style compactor,
  cf. Karnin-Lang-Liberty 2016). Approximate, bounded memory, still
  mergeable and deterministic (no randomness → reproducible across runs
  and cluster sizes).

Serialized as a binary blob (numpy tobytes) so it rides through Arrow
``binary`` columns between the partial and final aggregation stages.
"""

from __future__ import annotations

import numpy as np

_HDR = np.dtype(np.int64).itemsize


class QuantileSummary:
    __slots__ = ("values", "weights")

    def __init__(self, values: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.values = np.asarray(values, dtype=np.float64) if values is not None else np.empty(0)
        if weights is None:
            self.weights = np.ones(len(self.values), dtype=np.float64)
        else:
            self.weights = np.asarray(weights, dtype=np.float64)

    # -- construction ------------------------------------------------------
    @classmethod
    def of(cls, values: np.ndarray, cap: int = 4096) -> "QuantileSummary":
        s = cls(np.asarray(values, dtype=np.float64))
        return s.compact(cap)

    def compact(self, cap: int) -> "QuantileSummary":
        if len(self.values) <= cap:
            return self
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        k = int(np.ceil(len(v) / (cap // 2)))
        # group consecutive sorted values into runs of k; keep the weighted
        # mean of each run with the run's total weight (deterministic)
        n_runs = int(np.ceil(len(v) / k))
        pad = n_runs * k - len(v)
        vw = np.concatenate([v * w, np.zeros(pad)])
        ww = np.concatenate([w, np.zeros(pad)])
        run_w = ww.reshape(n_runs, k).sum(axis=1)
        run_v = vw.reshape(n_runs, k).sum(axis=1) / np.maximum(run_w, 1e-300)
        return QuantileSummary(run_v, run_w)

    # -- merge -------------------------------------------------------------
    @classmethod
    def merge_all(cls, summaries: list["QuantileSummary"], cap: int = 4096) -> "QuantileSummary":
        if not summaries:
            return cls()
        v = np.concatenate([s.values for s in summaries])
        w = np.concatenate([s.weights for s in summaries])
        return cls(v, w).compact(cap)

    # -- finalize ----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if len(self.values) == 0:
            return float("nan")
        if np.all(self.weights == 1.0):
            # exact path: matches numpy 'linear' == DuckDB quantile_cont
            return float(np.quantile(self.values, q))
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cw = np.cumsum(w)
        # weighted linear interpolation on the cumulative-weight midpoints
        target = q * (cw[-1] - 1) + 1 if cw[-1] >= 1 else q * cw[-1]
        idx = np.searchsorted(cw, target, side="left")
        idx = min(idx, len(v) - 1)
        return float(v[idx])

    # -- serialization (binary blob for Arrow binary columns) --------------
    def to_bytes(self) -> bytes:
        n = np.int64(len(self.values))
        exact = np.all(self.weights == 1.0)
        flag = np.int64(1 if exact else 0)
        parts = [n.tobytes(), flag.tobytes(), self.values.tobytes()]
        if not exact:
            parts.append(self.weights.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "QuantileSummary":
        n = int(np.frombuffer(blob[:_HDR], dtype=np.int64)[0])
        exact = int(np.frombuffer(blob[_HDR : 2 * _HDR], dtype=np.int64)[0]) == 1
        off = 2 * _HDR
        values = np.frombuffer(blob[off : off + 8 * n], dtype=np.float64).copy()
        if exact:
            return cls(values)
        off += 8 * n
        weights = np.frombuffer(blob[off : off + 8 * n], dtype=np.float64).copy()
        return cls(values, weights)
