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
    def compact_exact(cls, values: np.ndarray, cap: int) -> "QuantileSummary":
        """``QuantileSummary(values).compact(cap)`` specialized to unit
        weights — bit-identical output (``x * 1.0 == x`` exactly, and the
        all-ones run-weight sums equal the computed run lengths), without
        allocating the per-value weights array. The merge stage calls this
        per above-cap group; the weights allocation there measured as large
        as the values themselves."""
        values = np.asarray(values, dtype=np.float64)
        if len(values) <= cap:
            return cls(values)
        v = np.sort(values, kind="stable")
        k = int(np.ceil(len(v) / (cap // 2)))
        n_runs = int(np.ceil(len(v) / k))
        pad = n_runs * k - len(v)
        vw = np.concatenate([v, np.zeros(pad)])
        run_w = np.full(n_runs, float(k))
        if pad:
            run_w[-1] = float(k - pad)
        run_v = vw.reshape(n_runs, k).sum(axis=1) / np.maximum(run_w, 1e-300)
        return cls(run_v, run_w)

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


class HyperLogLog:
    """Mergeable approximate-distinct sketch (Flajolet et al. 2007, the
    public HLL algorithm). 2^p byte registers; standard error ~1.04/sqrt(2^p)
    (p=12 -> 4096 B, ~1.6%).

    The scale path for running/global distinct counts: the exact
    first-occurrence plan in ``stages/cumulative.py`` shuffles one row per
    (key, value) pair — at 100 TB the distinct sets themselves become the
    shuffle; per-key HLL partials make the exchange O(keys x 2^p) bytes.
    Deterministic (hash-driven, no RNG): same inputs -> same registers on
    any cluster shape.
    """

    __slots__ = ("p", "m", "reg")

    def __init__(self, p: int = 12, reg: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.reg = (
            np.zeros(self.m, dtype=np.uint8) if reg is None else
            np.asarray(reg, dtype=np.uint8)
        )

    @staticmethod
    def index_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
        """(register index, rank) per hash — the vectorized HLL kernel,
        exposed so callers can bulk-update many registers at once
        (``np.maximum.at(regs2d, (group, idx), rank)``)."""
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        with np.errstate(over="ignore"):
            w = h << np.uint64(p)  # low 64-p bits, left-aligned
        rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
        nz = w != 0
        if nz.any():
            wf = w[nz].astype(np.float64)
            # float64 rounding can overshoot the true MSB by one binade
            # (never more): clip the w≈2^64 → log2==64.0 case to 63 FIRST
            # (1<<64 is an undefined C shift), then correct the remaining
            # exact-power overshoot with a defined shift
            msb = np.minimum(np.floor(np.log2(wf)).astype(np.int64), 63)
            too_big = (np.uint64(1) << msb.astype(np.uint64)) > w[nz]
            msb -= too_big
            rank[nz] = np.minimum(63 - msb, 64 - p) + 1
        return idx, rank

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx, rank = self.index_rank(h, self.p)
        np.maximum.at(self.reg, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / float(np.sum(np.exp2(-self.reg.astype(np.float64))))
        zeros = int(np.count_nonzero(self.reg == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return e

    def to_bytes(self) -> bytes:
        return self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        reg = np.frombuffer(b, dtype=np.uint8)
        p = int(np.log2(len(reg)))
        return cls(p=p, reg=reg.copy())


class CountMinSketch:
    """Mergeable approximate frequency sketch (Cormode & Muthukrishnan
    2005). Estimates overcount by at most eps*N with probability 1-delta
    (width = ceil(e/eps), depth = ceil(ln(1/delta))); merge = elementwise
    add. Deterministic row seeds (no RNG)."""

    __slots__ = ("width", "depth", "table")

    _ROW_SEEDS = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD],
        dtype=np.uint64,
    )

    def __init__(self, width: int = 2048, depth: int = 4,
                 table: np.ndarray | None = None):
        if depth > len(self._ROW_SEEDS):
            raise ValueError(f"depth <= {len(self._ROW_SEEDS)}")
        self.width = width
        self.depth = depth
        self.table = (
            np.zeros((depth, width), dtype=np.int64) if table is None else
            np.asarray(table, dtype=np.int64).reshape(depth, width)
        )

    def _slots(self, h: np.ndarray) -> np.ndarray:
        from ..stages._shuffle import _splitmix64

        h = np.asarray(h, dtype=np.uint64)
        with np.errstate(over="ignore"):
            mixed = _splitmix64(h[None, :] ^ self._ROW_SEEDS[: self.depth, None])
        return (mixed % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        if len(h) == 0:
            return self
        slots = self._slots(h)
        c = np.ones(len(h), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], slots[d], c)
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.empty(0, dtype=np.int64)
        slots = self._slots(h)
        ests = np.stack([self.table[d][slots[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CMS of different shapes")
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        # self-describing: (width, depth) header so from_bytes can never
        # silently reinterpret a differently-shaped sketch
        hdr = np.array([self.width, self.depth], dtype=np.int64)
        return hdr.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        hdr = np.frombuffer(b[:16], dtype=np.int64)
        width, depth = int(hdr[0]), int(hdr[1])
        t = np.frombuffer(b[16:], dtype=np.int64).copy()
        if len(t) != width * depth:
            raise ValueError(
                f"CMS blob size {len(t)} != width*depth {width * depth}"
            )
        return cls(width=width, depth=depth, table=t)
