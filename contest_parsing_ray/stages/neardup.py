"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the training-data dedup family (build-brief operators;
the reference only has exact dedup, ``FileConcat.py:22``).

Pipeline shapes (all deterministic, no RNG at query time — hash seeds are
fixed constants):

- MinHash+LSH: shingle (char n-grams) → K minhashes per doc (vectorized
  per batch) → B bands of R rows → explode to (band, band_hash, doc_id) →
  hash-shuffle on band_hash → candidate pairs within buckets → verify
  exact n-gram Jaccard on the pair (docs carried through the bucket rows).
- SimHash: 64-bit weighted-feature hash; near-dups share all but a few
  bits; bucket on rotated prefixes.
- Embedding cosine: blocked matmul against a broadcast matrix (exact,
  the baseline) — the LSH-bucketed variant lives in ``ann.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ._shuffle import _splitmix64, hash64_strings

_SEEDS = np.arange(1, 129, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)


def _char_shingles(text: str, n: int = 5) -> np.ndarray:
    """Hashed char n-gram shingle set of one document (uint64, unique)."""
    if len(text) < n:
        data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(data) == 0:
            return np.array([np.uint64(0)], dtype=np.uint64)
        return _splitmix64(data.astype(np.uint64)).astype(np.uint64)
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    if len(b) < n:
        return _splitmix64(b)
    # rolling polynomial over windows, vectorized via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(b, n)
    with np.errstate(over="ignore"):
        h = np.zeros(len(win), dtype=np.uint64)
        for i in range(n):
            h = h * np.uint64(1099511628211) + win[:, i]
        h = _splitmix64(h)
    return np.unique(h)


def minhash_signature(text: str, num_hashes: int = 128, shingle_n: int = 5) -> np.ndarray:
    sh = _char_shingles(text, shingle_n)
    with np.errstate(over="ignore"):
        # affine rehash per seed; min over shingles
        m = sh[None, :] * _SEEDS[:num_hashes, None] + np.uint64(0xDEADBEEFCAFE)
        m ^= m >> np.uint64(31)
    return m.min(axis=1)


def jaccard_ngrams(a: str, b: str, n: int = 5) -> float:
    sa, sb = _char_shingles(a, n), _char_shingles(b, n)
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


class MinHashBands:
    """Per-batch: signature + band hashes, exploded to one row per band."""

    def __init__(self, text_col="text", id_col="doc_id", num_hashes=128, bands=32,
                 shingle_n=5, carry_text=True):
        assert num_hashes % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands, self.shingle_n = num_hashes, bands, shingle_n
        self.rows = num_hashes // bands
        self.carry_text = carry_text

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes, texts = [], [], [], []
        for did, text in zip(
            batch[self.id_col].to_numpy(), batch[self.text_col].to_numpy()
        ):
            sig = minhash_signature(text, self.num_hashes, self.shingle_n)
            bh = sig.reshape(self.bands, self.rows)
            with np.errstate(over="ignore"):
                h = np.zeros(self.bands, dtype=np.uint64)
                for r in range(self.rows):
                    h = h * np.uint64(0x100000001B3) + bh[:, r]
            ids.extend([did] * self.bands)
            band_ids.extend(range(self.bands))
            band_hashes.extend(h.view(np.int64))
            if self.carry_text:
                texts.extend([text] * self.bands)
        out = {
            self.id_col: ids,
            "band_id": np.asarray(band_ids, dtype=np.int64),
            "band_hash": np.asarray(band_hashes, dtype=np.int64),
        }
        if self.carry_text:
            out[self.text_col] = texts
        return pd.DataFrame(out)


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """→ (id_a, id_b, jaccard) pairs with verified n-gram Jaccard >= τ.
    id_a < id_b; deduplicated across bands."""
    banded = docs.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n,
        ),
        batch_format="pandas",
        concurrency=(1, concurrency),
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_, _), g in df.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates(subset=id_col).sort_values(id_col)
            recs = list(g[[id_col, text_col]].itertuples(index=False))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    a, b = recs[i], recs[j]
                    rows.append((a[0], b[0], a[1], b[1]))
        if not rows:
            return pd.DataFrame(columns=["id_a", "id_b", "text_a", "text_b"])
        return pd.DataFrame(rows, columns=["id_a", "id_b", "text_a", "text_b"])

    from ._shuffle import hash_partitioned_map

    candidates = hash_partitioned_map(
        banded, ["band_id", "band_hash"], bucket_pairs, batch_format="pandas"
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # dedup candidate pairs found in multiple bands, then exact verify
        df = df.drop_duplicates(subset=["id_a", "id_b"])
        jac = [
            jaccard_ngrams(a, b, shingle_n)
            for a, b in zip(df["text_a"], df["text_b"])
        ]
        df = df.assign(jaccard=np.asarray(jac, dtype=np.float64))
        df = df[df["jaccard"] >= jaccard_threshold]
        return df[["id_a", "id_b", "jaccard"]]

    return hash_partitioned_map(
        candidates, ["id_a", "id_b"], verify, batch_format="pandas"
    )


class SimHash:
    """64-bit SimHash over hashed word features (Charikar 2002).

    Vectorized per batch: ONE buffer-level hash over all words of all docs,
    then segmented bit votes with reduceat — no per-document Python loop."""

    def __init__(self, text_col="text"):
        import re

        self.text_col = text_col
        self.word = re.compile(r"[A-Za-z0-9_]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words_per_doc = (
            batch[self.text_col].fillna("").str.lower().str.findall(self.word)
        )
        lengths = words_per_doc.str.len().to_numpy(dtype=np.int64)
        flat: list[str] = [w for ws in words_per_doc for w in ws]
        n_docs = len(lengths)
        if not flat:
            batch["simhash"] = np.zeros(n_docs, dtype=np.int64)
            return batch
        hs = hash64_strings(pa.array(flat, type=pa.string()))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        # sentinel row so trailing empty docs keep reduceat in range
        bits = np.vstack([bits, np.zeros((1, 64), dtype=np.int64)])
        votes = np.add.reduceat(bits, offsets[:-1], axis=0)
        votes = np.where(lengths[:, None] == 0, 0, votes)
        majority = (votes * 2 - lengths[:, None]) > 0
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        with np.errstate(over="ignore"):
            sim = (majority.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        batch["simhash"] = sim.view(np.int64)
        return batch


def simhash_docs(
    docs: ray.data.Dataset, text_col: str = "text", concurrency: int = 4
) -> ray.data.Dataset:
    return docs.map_batches(
        SimHash, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=(1, concurrency),
    )


def embedding_neardup_pairs(
    embeddings: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> ray.data.Dataset:
    """Exact all-pairs cosine >= τ via blocked matmul against a broadcast
    normalized matrix (the brute-force baseline; the LSH-bucketed scale
    path is ``ann.lsh_bucket_neardup``). Output (id_a, id_b) with a < b."""
    all_pdf = embeddings.select_columns([id_col, vec_col]).to_pandas()
    ids = all_pdf[id_col].to_numpy()
    mat = np.stack(all_pdf[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    class Block:
        def __init__(self):
            self.ids, self.mat = ray.get(mat_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            q = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = q @ self.mat.T
            qa, qb = np.nonzero(sims >= threshold)
            a_ids = batch[id_col].to_numpy()[qa]
            b_ids = self.ids[qb]
            keep = a_ids < b_ids
            return pd.DataFrame(
                {
                    "id_a": a_ids[keep],
                    "id_b": b_ids[keep],
                    "cosine": sims[qa, qb][keep].astype(np.float64),
                }
            )

    return embeddings.map_batches(
        Block, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )
