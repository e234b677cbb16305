"""Token-payload operators (stages/tokens.py) vs brute force."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from contest_parsing_ray.stages.tokens import token_ngram_topk, vocab_histogram


def _seq_table(n_rows=300, vocab=37, seed=3):
    rng = np.random.default_rng(seed)
    toks = [
        rng.integers(0, vocab, rng.integers(0, 30)).astype(np.int32)
        for _ in range(n_rows)
    ]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
        }
    ), toks


def test_vocab_histogram_matches_bruteforce():
    t, toks = _seq_table()
    want = Counter(int(x) for seq in toks for x in seq)
    got = (
        vocab_histogram(ray.data.from_arrow(t).repartition(7))
        .to_pandas().sort_values("token_id").reset_index(drop=True)
    )
    assert dict(zip(got["token_id"], got["cnt"])) == dict(want)
    assert int(got["cnt"].sum()) == sum(len(s) for s in toks)


def test_token_ngram_topk_matches_bruteforce():
    t, toks = _seq_table(n_rows=200, vocab=9, seed=11)  # small vocab: real ties
    want = Counter(
        tuple(int(x) for x in seq[i : i + 2])
        for seq in toks
        for i in range(len(seq) - 1)
    )
    got = token_ngram_topk(
        ray.data.from_arrow(t).repartition(5), n=2, k=15
    ).to_pandas()
    got_pairs = [tuple(g) for g in got["ngram"]]
    got_counts = got["cnt"].tolist()
    # counts are the true top-15 counts (desc)
    true_sorted = sorted(want.values(), reverse=True)[:15]
    assert got_counts == true_sorted
    # each reported ngram's count is exact
    for g, c in zip(got_pairs, got_counts):
        assert want[g] == c
    with pytest.raises(ValueError, match="n must"):
        token_ngram_topk(ray.data.from_arrow(t), n=0)


def test_vocab_histogram_empty_and_negative():
    t = pa.table(
        {"doc_id": pa.array(["a"]), "tokens": pa.array([[]], pa.list_(pa.int32()))}
    )
    got = vocab_histogram(ray.data.from_arrow(t)).to_pandas()
    assert len(got) == 0
    bad = pa.table(
        {"doc_id": pa.array(["a"]), "tokens": pa.array([[-1]], pa.list_(pa.int32()))}
    )
    with pytest.raises(Exception, match="negative token id"):
        vocab_histogram(ray.data.from_arrow(bad)).to_pandas()


def test_source_word_stats_bruteforce_and_empty():
    from contest_parsing_ray.stages.text import source_word_stats

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b", "c"],
            "text": ["x y x", "y z", "w w w w", None, ""],
        }
    )
    got = (
        source_word_stats(ray.data.from_pandas(df).repartition(3))
        .to_pandas().set_index("source")
    )
    # a: x:2 y:2 z:1 -> n=5, d=3; b: w:4 -> entropy 0; c: no words -> absent
    assert got.loc["a", "n_words"] == 5 and got.loc["a", "n_distinct"] == 3
    p = np.array([2, 2, 1]) / 5.0
    assert abs(got.loc["a", "entropy"] - (-(p * np.log(p)).sum())) < 1e-12
    assert got.loc["b", "n_words"] == 4 and got.loc["b", "entropy"] == 0.0
    assert "c" not in got.index


def test_value_drift_psi_detects_shift():
    from contest_parsing_ray.stages.histogram import value_drift_psi

    rng = np.random.default_rng(2)
    n = 4000
    # key "stable": same distribution both halves; "shifted": mean moves
    ts = np.arange(n, dtype="int64")
    split = int(n // 2)
    stable = rng.normal(50, 10, n)
    shifted = np.where(ts < split, rng.normal(30, 5, n), rng.normal(70, 5, n))
    df = pd.DataFrame(
        {
            "key": ["stable"] * n + ["shifted"] * n,
            "ts_us": np.concatenate([ts, ts]),
            "value": np.concatenate([stable, shifted]),
        }
    )
    got = (
        value_drift_psi(
            ray.data.from_pandas(df).repartition(6),
            key_col="key", ts_col="ts_us", value_col="value",
            lo=0.0, hi=100.0, split_us=split, n_bins=20,
        )
        .to_pandas().set_index("key")
    )
    assert got.loc["stable", "n_a"] == split and got.loc["stable", "n_b"] == split
    assert got.loc["stable", "psi"] < 0.05
    assert got.loc["shifted", "psi"] > 1.0
    # hand case: exact PSI over two bins
    small = pd.DataFrame(
        {
            "key": ["k"] * 8,
            "ts_us": [0, 0, 0, 0, 10, 10, 10, 10],
            # period a: 3 low 1 high; period b: 1 low 3 high (2-bin grid)
            "value": [0.0, 0.0, 0.0, 5.0, 0.0, 5.0, 5.0, 5.0],
        }
    )
    got2 = value_drift_psi(
        ray.data.from_pandas(small), "key", "ts_us", "value",
        lo=0.0, hi=10.0, split_us=5, n_bins=2,
    ).to_pandas()
    # add-half smoothing, 2 bins: p=(3.5/5,1.5/5), q=(1.5/5,3.5/5)
    want = 2 * (0.4 * np.log(3.5 / 1.5))
    assert abs(got2["psi"].iloc[0] - want) < 1e-12
    # one-sided key -> psi 0
    one = pd.DataFrame({"key": ["x"] * 3, "ts_us": [0, 1, 2], "value": [1.0] * 3})
    got3 = value_drift_psi(
        ray.data.from_pandas(one), "key", "ts_us", "value",
        lo=0.0, hi=10.0, split_us=5, n_bins=2,
    ).to_pandas()
    assert got3["psi"].iloc[0] == 0.0 and got3["n_b"].iloc[0] == 0


def test_null_key_guards():
    import pytest

    from contest_parsing_ray.stages.histogram import value_drift_psi
    from contest_parsing_ray.stages.text import source_word_stats

    df = pd.DataFrame(
        {"source": ["a", None], "text": ["x y", "z"],
         "ts_us": [0, 1], "value": [1.0, 2.0]}
    )
    with pytest.raises(Exception, match="null values in key column"):
        source_word_stats(ray.data.from_pandas(df)).to_pandas()
    with pytest.raises(Exception, match="null values in key column"):
        value_drift_psi(
            ray.data.from_pandas(df), "source", "ts_us", "value",
            lo=0.0, hi=10.0, split_us=1, n_bins=2,
        ).to_pandas()


def test_dup_ngram_stats_exact_vs_duckdb_unnest():
    import duckdb

    from contest_parsing_ray.stages.tokens import dup_ngram_stats

    rng = np.random.default_rng(17)
    docs, toks = [], []
    for i in range(80):
        L = int(rng.integers(0, 40))
        # tiny vocab so duplicate grams actually occur
        toks.append(rng.integers(0, 4, L).astype(np.int32).tolist())
        docs.append(f"d{i}")
    docs.append("short")
    toks.append([1, 2, 3])  # < n tokens: n_grams 0, dup_frac null
    t = pa.table({
        "doc_id": pa.array(docs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
    })
    n = 5
    out = (
        dup_ngram_stats(ray.data.from_arrow(t).repartition(4), n=n)
        .to_pandas().set_index("doc_id").sort_index()
    )
    con = duckdb.connect()
    con.register("seqs", t)
    want = con.execute(f"""
WITH ix AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, len(tokens) - {n - 1})) AS i
  FROM seqs
), g AS (
  SELECT doc_id, tokens[i:i+{n - 1}] AS gram FROM ix
), s AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
  FROM g GROUP BY doc_id
)
SELECT q.doc_id, COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.n_distinct, 0) AS n_distinct,
       1.0 - s.n_distinct / s.n_grams AS dup_frac
FROM (SELECT DISTINCT doc_id FROM seqs) q LEFT JOIN s USING (doc_id)
""").df().set_index("doc_id").sort_index()
    assert (out["n_grams"] == want["n_grams"]).all()
    assert (out["n_distinct"] == want["n_distinct"]).all()
    both_nan = out["dup_frac"].isna() & want["dup_frac"].isna()
    assert (both_nan | (out["dup_frac"] == want["dup_frac"])).all()


def test_dup_ngram_stats_handcrafted():
    from contest_parsing_ray.stages.tokens import dup_ngram_stats

    t = pa.table({
        "doc_id": pa.array(["rep", "uniq", "empty"]),
        "tokens": pa.array(
            [[1, 2, 1, 2, 1, 2], [1, 2, 3, 4, 5], []],
            pa.large_list(pa.int32()),
        ),
    })
    out = dup_ngram_stats(
        ray.data.from_arrow(t), n=2).to_pandas().set_index("doc_id")
    # rep: grams (1,2)(2,1)(1,2)(2,1)(1,2) -> 5 total, 2 distinct
    assert out.loc["rep", "n_grams"] == 5 and out.loc["rep", "n_distinct"] == 2
    assert out.loc["rep", "dup_frac"] == 1.0 - 2.0 / 5.0
    assert out.loc["uniq", "dup_frac"] == 0.0
    assert out.loc["empty", "n_grams"] == 0 and np.isnan(
        out.loc["empty", "dup_frac"])


def test_source_vocab_jaccard_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.tokens import source_vocab_jaccard

    rng = np.random.default_rng(27)
    rows_src, rows_tok = [], []
    pools = {"a": np.arange(0, 60), "b": np.arange(30, 90),
             "c": np.arange(200, 230), "empty": np.arange(0)}
    for s, pool in pools.items():
        for _ in range(40):
            L = int(rng.integers(0, 12))
            toks = (rng.choice(pool, L).astype(np.int32).tolist()
                    if len(pool) and L else [])
            rows_src.append(s)
            rows_tok.append(toks)
    t = pa.table({
        "source": pa.array(rows_src),
        "tokens": pa.array(rows_tok, pa.large_list(pa.int32())),
    })
    out = source_vocab_jaccard(
        ray.data.from_arrow(t).repartition(6))
    got = {(r["s1"], r["s2"]): (r["n_inter"], r["n_union"],
                                None if r["jaccard"] is None
                                else round(r["jaccard"], 9))
           for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("seqs", t)
    want = {}
    for s1, s2, ninter, nunion, j in con.execute("""
WITH st AS (SELECT DISTINCT source, unnest(tokens) AS tok FROM seqs),
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
ks AS (SELECT DISTINCT source FROM seqs),
pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM ks a JOIN ks b ON a.source < b.source
),
i AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.s1, p.s2, COALESCE(i.n_inter, 0) AS n_inter,
       COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - COALESCE(i.n_inter, 0)
         AS n_union,
       CASE WHEN COALESCE(ca.n, 0) + COALESCE(cb.n, 0)
                 - COALESCE(i.n_inter, 0) = 0 THEN NULL
            ELSE ROUND(COALESCE(i.n_inter, 0) * 1.0 /
              (COALESCE(ca.n,0)+COALESCE(cb.n,0)-COALESCE(i.n_inter,0)), 9)
       END AS j
FROM pairs p
LEFT JOIN i ON i.s1 = p.s1 AND i.s2 = p.s2
LEFT JOIN c ca ON ca.source = p.s1
LEFT JOIN c cb ON cb.source = p.s2
""").fetchall():
        want[(s1, s2)] = (ninter, nunion, j)
    # the engine only emits keys that produced at least one token; "empty"
    # has no vocabulary at all — the SQL cross-pair includes it with union 0
    want_nonempty = {k: v for k, v in want.items()
                     if "empty" not in k or v[1] > 0}
    got_vs_want = {k: got[k] for k in got}
    assert got_vs_want == {k: want[k] for k in got}
    # pools a=0..59 and b=30..89 overlap on ~30 ids (minus sampling misses)
    assert ("a", "b") in got and 20 < got[("a", "b")][0] <= 30


def test_source_vocab_containment():
    from contest_parsing_ray.stages.tokens import source_vocab_jaccard

    t = pa.table({
        "source": pa.array(["big"] * 3 + ["sub"] * 2),
        "tokens": pa.array(
            [[0, 1, 2, 3], [4, 5], [6, 7], [0, 1], [2, 3]],
            pa.large_list(pa.int32()),
        ),
    })
    out = source_vocab_jaccard(
        ray.data.from_arrow(t), containment=True).to_pylist()
    r = out[0]
    # sub's vocab {0,1,2,3} is fully inside big's {0..7}
    assert (r["s1"], r["s2"]) == ("big", "sub")
    assert r["n_inter"] == 4 and r["n_union"] == 8
    assert r["c_s2_in_s1"] == 4 / 8  # |A∩B| / |big|
    assert r["c_s1_in_s2"] == 4 / 4 == 1.0  # fully contained in sub-dir


def test_source_token_richness_matches_duckdb():
    import duckdb

    from contest_parsing_ray.stages.tokens import source_token_richness

    rng = np.random.default_rng(73)
    srcs, toks = [], []
    for s, vocab in (("rich", 500), ("poor", 5)):
        for _ in range(60):
            L = int(rng.integers(0, 25))
            srcs.append(s)
            toks.append(rng.integers(0, vocab, L).astype(np.int32).tolist())
    srcs.append(None)
    toks.append([1, 2, 3])  # null key dropped
    t = pa.table({
        "source": pa.array(srcs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
    })
    out = source_token_richness(
        ray.data.from_arrow(t).repartition(5)
    ).to_pandas().set_index("k").sort_index()
    con = duckdb.connect()
    con.register("seqs", t)
    want = con.execute("""
WITH u AS (
  SELECT source, unnest(tokens) AS tok FROM seqs WHERE source IS NOT NULL
), c AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY 1, 2
)
SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       COUNT(*) * 1.0 / SUM(cnt) AS ttr
FROM c GROUP BY source ORDER BY source""").df().set_index("source")
    for k in ("rich", "poor"):
        for a, b in (("n_tokens", "n_tokens"), ("vocab_size", "vocab_size"),
                     ("n_hapax", "n_hapax"), ("type_token_ratio", "ttr")):
            assert abs(out.loc[k, a] - want.loc[k, b]) < 1e-12, (k, a)
    assert len(out) == 2  # null key dropped
    assert out.loc["rich", "type_token_ratio"] > out.loc[
        "poor", "type_token_ratio"]


def test_psi_extreme_values_clip_to_edge_bins():
    """ADVICE round-3: +inf / int64-overflowing floats must land in the TOP
    bin (clip-then-cast), not wrap to bin 0 — a mass move toward huge
    values is exactly the drift PSI must not read as zero."""
    from contest_parsing_ray.stages.histogram import value_drift_psi

    df = pd.DataFrame(
        {
            "key": ["k"] * 4,
            "ts_us": [0, 0, 10, 10],
            "value": [1.0, 2.0, np.inf, 1e300],
        }
    )
    got = value_drift_psi(
        ray.data.from_pandas(df), "key", "ts_us", "value",
        lo=0.0, hi=10.0, split_us=5, n_bins=2,
    ).to_pandas()
    # a=(2,0), b=(0,2); add-half smoothing -> psi = (4/3) ln 5
    want = (4.0 / 3.0) * np.log(5.0)
    assert abs(got["psi"].iloc[0] - want) < 1e-12
    # under the pre-fix wrap both halves read (2,0) and psi collapsed to 0
    assert got["psi"].iloc[0] > 1.0


def test_token_ops_reject_null_token_rows():
    """ADVICE round-3: a null tokens entry makes flatten() and the raw
    offsets buffer disagree — every offset-window kernel must refuse."""
    import pytest

    from contest_parsing_ray.stages.tokens import (
        dup_ngram_stats,
        source_token_richness,
        source_vocab_jaccard,
        token_ngram_topk,
    )

    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array([[1, 2, 3], None, [4, 5]],
                               pa.list_(pa.int32())),
            "source": ["s1", "s2", "s1"],
        }
    )
    ds = ray.data.from_arrow(t)
    for op in (
        lambda: token_ngram_topk(ds, n=2, k=5).to_pandas(),
        lambda: dup_ngram_stats(ds, n=2).to_pandas(),
        lambda: source_vocab_jaccard(ds, key_col="source").to_pandas(),
        lambda: source_token_richness(ds, key_col="source").to_pandas(),
    ):
        with pytest.raises(Exception, match="null entries in the tokens"):
            op()


def test_source_token_richness_per_file_combiner_matches_generic(tmp_path):
    """The input_files fast path (one streamed partial per parquet shard —
    the corpus-scale recipe that removes the read/compute spill race seen
    at 100M rows) must agree exactly with the generic map_batches path."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import source_token_richness

    rng = np.random.default_rng(99)
    paths = []
    for i in range(4):
        srcs, toks = [], []
        for _ in range(200):
            s = ["a", "b", "c"][int(rng.integers(0, 3))]
            L = int(rng.integers(0, 40))
            srcs.append(s)
            toks.append(rng.integers(0, 300, L).astype(np.int32).tolist())
        t = pa.table({
            "source": pa.array(srcs),
            "tokens": pa.array(toks, pa.large_list(pa.int32())),
        })
        p = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    ds = ray.data.read_parquet(paths)
    a = (source_token_richness(ds).to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (source_token_richness(ds, raw_shard_paths=paths).to_pandas()
         .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert set(a["k"]) == {"a", "b", "c"}


def test_vocab_histogram_per_file_combiner_matches_generic(tmp_path):
    """vocab_histogram's input_files path (one bincount per shard) must
    agree exactly with the generic per-batch-partial path."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import vocab_histogram

    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        toks = [rng.integers(0, 500, int(rng.integers(0, 50)))
                .astype(np.int32).tolist() for _ in range(300)]
        t = pa.table({"tokens": pa.array(toks, pa.large_list(pa.int32()))})
        p = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    ds = ray.data.read_parquet(paths)
    a = (vocab_histogram(ds).to_pandas()
         .sort_values("token_id").reset_index(drop=True))
    b = (vocab_histogram(ds, raw_shard_paths=paths).to_pandas()
         .sort_values("token_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["cnt"].sum() > 0


def _cross_doc_oracle_sql(n: int, min_docs: int) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, n_tok, i, tokens[i:i+{n - 1}] AS gram
  FROM seqs, LATERAL (SELECT unnest(range(1, n_tok - {n - 2})) AS i) t
),
df AS (SELECT gram, COUNT(DISTINCT doc_id) AS c FROM g GROUP BY 1),
hot AS (SELECT gram FROM df WHERE c >= {min_docs}),
hotwin AS (SELECT g.doc_id, g.i FROM g JOIN hot USING (gram)),
nh AS (SELECT doc_id, COUNT(*) AS n_hot FROM hotwin GROUP BY 1),
pos AS (
  SELECT DISTINCT w.doc_id, w.i + s.j AS p
  FROM hotwin w, LATERAL (SELECT unnest(range(0, {n})) AS j) s
),
cov AS (SELECT doc_id, COUNT(*) AS n_covered FROM pos GROUP BY 1)
SELECT s.doc_id, s.n_tok,
       GREATEST(s.n_tok - {n - 1}, 0) AS n_windows,
       COALESCE(nh.n_hot, 0) AS n_hot_windows,
       COALESCE(c.n_covered, 0) AS n_covered
FROM seqs s
LEFT JOIN nh USING (doc_id) LEFT JOIN cov c USING (doc_id)
ORDER BY s.doc_id"""


def test_cross_doc_span_stats_matches_duckdb():
    """Engine vs an independent DuckDB formulation (content-exact grams —
    a hash collision in the engine would show up here) on a corpus with
    planted cross-doc spans, unique filler, and a too-short doc."""
    import duckdb

    from contest_parsing_ray.stages.tokens import cross_doc_span_stats

    rng = np.random.default_rng(31)
    shared_a = rng.integers(0, 1000, 20).astype(np.int32).tolist()
    shared_b = rng.integers(0, 1000, 12).astype(np.int32).tolist()
    docs, toks = [], []
    for i in range(40):
        body = rng.integers(1000, 50_000, int(rng.integers(5, 60)))
        body = body.astype(np.int32).tolist()  # filler: ids disjoint
        if i % 4 == 0:
            body = shared_a + body  # span in 10 docs
        if i % 5 == 0:
            body = body + shared_b  # span in 8 docs
        docs.append(f"d{i:03d}")
        toks.append(body)
    docs.append("tiny")
    toks.append([1, 2, 3])
    docs.append("empty")
    toks.append([])  # realistic corpus dirt: empty token arrays
    t = pa.table({
        "doc_id": pa.array(docs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
        "n_tok": pa.array([len(x) for x in toks], pa.int32()),
    })
    n, min_docs = 8, 2
    out = (cross_doc_span_stats(
        ray.data.from_arrow(t).repartition(7), n=n, min_docs=min_docs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("seqs", t)
    want = con.execute(_cross_doc_oracle_sql(n, min_docs)).df()
    for c in ("n_tok", "n_windows", "n_hot_windows", "n_covered"):
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c
    # frac: NULL exactly where the doc is shorter than n (no windows)
    short = out["n_windows"] == 0
    assert short.loc[out.doc_id == "tiny"].all()
    assert np.isnan(out.loc[short, "dup_span_frac"]).all()
    full = out[~short]
    assert np.allclose(
        full["dup_span_frac"],
        full["n_covered"] / full["n_tok"],
    )
    # the planted spans must actually register
    assert out["n_hot_windows"].sum() > 0


def test_cross_doc_span_stats_duplicate_doc_ids_not_hot():
    """Exact-duplicate rows share a doc_id; COUNT(DISTINCT doc_id)
    semantics means a doc duplicated twice does NOT make its grams hot."""
    from contest_parsing_ray.stages.tokens import cross_doc_span_stats

    toks = [list(range(100, 120)), list(range(100, 120)),
            list(range(500, 540))]
    t = pa.table({
        "doc_id": pa.array(["same", "same", "other"]),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
    })
    out = (cross_doc_span_stats(ray.data.from_arrow(t), n=8, min_docs=2)
           .to_pandas())
    assert (out["n_hot_windows"] == 0).all()
    assert (out["n_covered"] == 0).all()


def test_cross_doc_span_stats_rejects_null_doc_id():
    from contest_parsing_ray.stages.tokens import cross_doc_span_stats

    t = pa.table({
        "doc_id": pa.array(["a", None]),
        "tokens": pa.array([[1] * 10, [2] * 10], pa.large_list(pa.int32())),
    })
    with pytest.raises(Exception, match="null doc_id"):
        cross_doc_span_stats(ray.data.from_arrow(t), n=8).to_pandas()


def test_strip_cross_doc_spans_matches_duckdb():
    """Cleaned token arrays vs an independent DuckDB formulation that
    anti-joins covered positions (content-exact grams), plus invariants:
    pass-through columns untouched, n_tok updated, short docs unchanged,
    strip output consistent with the detector's n_covered."""
    import duckdb

    from contest_parsing_ray.stages.tokens import (
        cross_doc_span_stats,
        strip_cross_doc_spans,
    )

    rng = np.random.default_rng(61)
    shared = rng.integers(0, 500, 15).astype(np.int32).tolist()
    docs, toks, srcs = [], [], []
    for i in range(30):
        body = rng.integers(1000, 30_000, int(rng.integers(4, 40)))
        body = body.astype(np.int32).tolist()
        if i % 3 == 0:
            body = body[: len(body) // 2] + shared + body[len(body) // 2:]
        docs.append(f"d{i:03d}")
        toks.append(body)
        srcs.append("s" + str(i % 2))
    t = pa.table({
        "doc_id": pa.array(docs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
        "n_tok": pa.array([len(x) for x in toks], pa.int32()),
        "source": pa.array(srcs),
    })
    n, min_docs = 8, 2
    out = (strip_cross_doc_spans(
        ray.data.from_arrow(t).repartition(5), n=n, min_docs=min_docs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("seqs", t)
    want = con.execute(f"""
WITH g AS (
  SELECT doc_id, n_tok, i, tokens[i:i+{n - 1}] AS gram
  FROM seqs, LATERAL (SELECT unnest(range(1, n_tok - {n - 2})) AS i) t
),
df AS (SELECT gram, COUNT(DISTINCT doc_id) AS c FROM g GROUP BY 1),
hot AS (SELECT gram FROM df WHERE c >= {min_docs}),
pos AS (
  SELECT DISTINCT g.doc_id, g.i + s.j AS p
  FROM g JOIN hot USING (gram),
       LATERAL (SELECT unnest(range(0, {n})) AS j) s
),
tok AS (
  SELECT s.doc_id, s.tokens[i] AS tok, i
  FROM seqs s, LATERAL (SELECT unnest(range(1, n_tok + 1)) AS i) t
),
kept AS (
  SELECT tok.doc_id,
         COALESCE(list(tok.tok ORDER BY tok.i), []) AS tokens_clean
  FROM tok LEFT JOIN pos ON tok.doc_id = pos.doc_id AND tok.i = pos.p
  WHERE pos.p IS NULL GROUP BY tok.doc_id
)
SELECT s.doc_id, COALESCE(k.tokens_clean, []) AS tokens_clean
FROM seqs s LEFT JOIN kept k USING (doc_id) ORDER BY s.doc_id""").df()
    for i in range(len(out)):
        got = list(out.loc[i, "tokens"])
        exp = list(want.loc[i, "tokens_clean"])
        assert got == exp, (out.loc[i, "doc_id"], got[:10], exp[:10])
    assert (out["n_tok"].to_numpy()
            == np.array([len(x) for x in out["tokens"]])).all()
    assert list(out["source"]) == sorted(
        srcs, key=lambda _: 0
    ) or set(out["source"]) == {"s0", "s1"}  # pass-through preserved
    # consistency with the detector: removed == n_covered
    det = (cross_doc_span_stats(
        ray.data.from_arrow(t), n=n, min_docs=min_docs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    orig_len = np.array([len(x) for x in toks])
    assert (orig_len - out["n_tok"].to_numpy()
            == det["n_covered"].to_numpy()).all()
    assert det["n_covered"].sum() > 0  # the planted span actually stripped


def test_reference_contamination_matches_duckdb():
    """Contamination coverage vs a content-exact DuckDB formulation:
    corpus docs embedding reference spans are flagged with the exact
    covered-token counts; clean docs report zero; asymmetry holds (the
    reference side is never scored)."""
    import duckdb

    from contest_parsing_ray.stages.tokens import (
        reference_contamination_stats,
    )

    rng = np.random.default_rng(83)
    bench = [rng.integers(0, 800, 30).astype(np.int32).tolist()
             for _ in range(5)]
    ref = pa.table({
        "doc_id": pa.array([f"ref{i}" for i in range(5)]),
        "tokens": pa.array(bench, pa.large_list(pa.int32())),
    })
    docs, toks = [], []
    for i in range(25):
        body = rng.integers(1000, 20_000, int(rng.integers(4, 50)))
        body = body.astype(np.int32).tolist()
        if i % 5 == 0:  # plant a reference excerpt mid-doc
            ex = bench[i % 5][3:15]
            body = body[:2] + ex + body[2:]
        docs.append(f"d{i:03d}")
        toks.append(body)
    corpus = pa.table({
        "doc_id": pa.array(docs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
        "n_tok": pa.array([len(x) for x in toks], pa.int32()),
    })
    n = 8
    out = (reference_contamination_stats(
        ray.data.from_arrow(corpus).repartition(4), ref, n=n)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("corpus", corpus)
    con.register("ref", ref)
    want = con.execute(f"""
WITH rg AS (
  SELECT DISTINCT tokens[i:i+{n - 1}] AS gram
  FROM ref, LATERAL (SELECT unnest(range(1, len(tokens) - {n - 2})) AS i) t
),
cg AS (
  SELECT doc_id, i, tokens[i:i+{n - 1}] AS gram
  FROM corpus, LATERAL (SELECT unnest(range(1, n_tok - {n - 2})) AS i) t
),
hotwin AS (SELECT cg.doc_id, cg.i FROM cg JOIN rg USING (gram)),
nh AS (SELECT doc_id, COUNT(*) AS n_hot FROM hotwin GROUP BY 1),
pos AS (
  SELECT DISTINCT w.doc_id, w.i + s.j AS p
  FROM hotwin w, LATERAL (SELECT unnest(range(0, {n})) AS j) s
),
cov AS (SELECT doc_id, COUNT(*) AS n_covered FROM pos GROUP BY 1)
SELECT c.doc_id, COALESCE(nh.n_hot, 0) AS n_hot,
       COALESCE(cov.n_covered, 0) AS n_covered
FROM corpus c LEFT JOIN nh USING (doc_id) LEFT JOIN cov USING (doc_id)
ORDER BY c.doc_id""").df()
    assert (out["n_hot_windows"].to_numpy() == want["n_hot"].to_numpy()).all()
    assert (out["n_covered"].to_numpy() == want["n_covered"].to_numpy()).all()
    planted = out[out.doc_id.isin([f"d{i:03d}" for i in range(0, 25, 5)])]
    assert (planted["n_covered"] >= 12).all()  # the 12-token excerpt
    clean = out[~out.doc_id.isin(planted.doc_id)]
    assert (clean["n_covered"] == 0).all()
    # accepts a Dataset reference too, same result
    out2 = (reference_contamination_stats(
        ray.data.from_arrow(corpus), ray.data.from_arrow(ref), n=n)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (out2["n_covered"].to_numpy() == out["n_covered"].to_numpy()).all()


def test_span_corrupt_roundtrip_and_stats():
    """T5-style span corruption: (input, target) must reconstruct the
    original tokens exactly (lossless), spans obey the length bound and
    expected rate, short docs pass through unmasked, and the mask is a
    pure function of (seed, doc_id) — repartition-invariant, seed-
    sensitive."""
    from contest_parsing_ray.stages.tokens import span_corrupt

    rng = np.random.default_rng(5)
    docs, toks = [], []
    for i in range(60):
        L = int(rng.integers(0, 400))
        docs.append(f"d{i:03d}")
        toks.append(rng.integers(0, 50_000, L).astype(np.int32).tolist())
    t = pa.table({
        "doc_id": pa.array(docs),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
    })
    SENT = 50_257
    out = (span_corrupt(ray.data.from_arrow(t).repartition(6),
                        mask_rate=0.15, mean_span=3, seed=7)
           .to_pandas().set_index("doc_id").sort_index())
    orig = {d: x for d, x in zip(docs, toks)}
    n_masked_total = n_tok_long = 0
    for d, row in out.iterrows():
        inp = list(row["input_tokens"])
        tgt = list(row["target_tokens"])
        # parse target into {sentinel: span tokens}
        spans, cur = {}, None
        for v in tgt:
            if v >= SENT:
                cur = v
                spans[cur] = []
            else:
                spans[cur].append(v)
        # sentinels appear in increasing order from SENT
        assert sorted(spans) == list(range(SENT, SENT + len(spans)))
        assert row["n_spans"] == len(spans)
        assert row["n_masked"] == sum(len(v) for v in spans.values())
        # span length bound: 1..2*mean-1
        assert all(1 <= len(v) <= 5 for v in spans.values())
        # reconstruct
        rec = []
        for v in inp:
            rec.extend(spans[v] if v >= SENT else [v])
        assert rec == orig[d], d
        L = len(orig[d])
        if L < 20:  # shorter than one grid block: untouched
            assert row["n_masked"] == 0 and inp == orig[d] and tgt == []
        else:
            n_masked_total += row["n_masked"]
            n_tok_long += L
    # expected rate on the long docs: mean_span per 20-token block
    rate = n_masked_total / n_tok_long
    assert 0.08 < rate < 0.22, rate
    # determinism + repartition invariance
    out2 = (span_corrupt(ray.data.from_arrow(t).repartition(2),
                         mask_rate=0.15, mean_span=3, seed=7)
            .to_pandas().set_index("doc_id").sort_index())
    for d in out.index:
        assert list(out.loc[d, "input_tokens"]) == list(out2.loc[d, "input_tokens"])
        assert list(out.loc[d, "target_tokens"]) == list(out2.loc[d, "target_tokens"])
    # seed sensitivity
    out3 = (span_corrupt(ray.data.from_arrow(t), mask_rate=0.15,
                         mean_span=3, seed=8)
            .to_pandas().set_index("doc_id").sort_index())
    diff = sum(
        list(out.loc[d, "input_tokens"]) != list(out3.loc[d, "input_tokens"])
        for d in out.index if len(orig[d]) >= 20
    )
    assert diff > 10
    # null doc_id raises
    bad = pa.table({
        "doc_id": pa.array(["a", None]),
        "tokens": pa.array([[1] * 40, [2] * 40], pa.large_list(pa.int32())),
    })
    with pytest.raises(Exception, match="null doc_id"):
        span_corrupt(ray.data.from_arrow(bad)).to_pandas()


def test_span_corrupt_rejects_unrealizable_rate():
    from contest_parsing_ray.stages.tokens import span_corrupt

    t = pa.table({
        "doc_id": pa.array(["a"]),
        "tokens": pa.array([[1] * 100], pa.large_list(pa.int32())),
    })
    with pytest.raises(ValueError, match=r"\(0, 0.5\]"):
        span_corrupt(ray.data.from_arrow(t), mask_rate=0.7)


def test_flat_with_offsets_rebases_sliced_arrays():
    """A sliced non-zero-offset list Array must yield 0-based offsets that
    index the (rebased) flattened values directly (ADVICE round-4 #3)."""
    from contest_parsing_ray.stages.tokens import _flat_with_offsets

    arr = pa.array([[1, 2], [3, 4, 5], [6], [7, 8]], pa.large_list(pa.int32()))
    sl = arr.slice(1, 2)  # [[3,4,5],[6]] with parent offsets buffer
    _col, flat, offs = _flat_with_offsets(sl)
    assert offs[0] == 0
    np.testing.assert_array_equal(offs, [0, 3, 4])
    np.testing.assert_array_equal(flat, [3, 4, 5, 6])
    # windows derived from offsets index flat correctly
    np.testing.assert_array_equal(flat[offs[0]:offs[1]], [3, 4, 5])


def test_richness_rejects_out_of_contract_token_ids():
    """Token ids >= 2^31 would silently merge counts across (key, token)
    pairs in the composite int64 exchange — must raise (ADVICE #1)."""
    from contest_parsing_ray.stages.tokens import source_token_richness

    t = pa.table({
        "source": pa.array(["a"]),
        "tokens": pa.array([[1, 2, 1 << 31]], pa.large_list(pa.int64())),
    })
    with pytest.raises(Exception, match="2\\^31"):
        source_token_richness(ray.data.from_arrow(t)).to_pandas()


def test_raw_shard_paths_mismatch_raises(tmp_path):
    """Passing shard paths that are not the dataset's own input files must
    fail loudly — the fast path re-reads the shards (ADVICE #2)."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import (
        source_token_richness,
        vocab_histogram,
    )

    t = pa.table({
        "source": pa.array(["a", "b"]),
        "tokens": pa.array([[1, 2], [3]], pa.large_list(pa.int32())),
    })
    p1 = str(tmp_path / "s1.parquet")
    p2 = str(tmp_path / "s2.parquet")
    pq.write_table(t, p1)
    pq.write_table(t, p2)
    ds = ray.data.read_parquet([p1])
    with pytest.raises(ValueError, match="raw_shard_paths"):
        vocab_histogram(ds, raw_shard_paths=[p2])
    with pytest.raises(ValueError, match="raw_shard_paths"):
        source_token_richness(ds, raw_shard_paths=[p1, p2])


def test_reference_contamination_hash_cap(tmp_path):
    """An oversized reference must fail loudly at max_ref_hashes instead
    of as a driver OOM (ADVICE #4)."""
    from contest_parsing_ray.stages.tokens import reference_contamination_stats

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a"]),
        "tokens": pa.array([[1, 2, 3, 4, 5, 6, 7, 8]],
                           pa.large_list(pa.int32())),
    }))
    # 200 distinct 8-gram windows > cap of 100
    ref = pa.table({
        "tokens": pa.array([list(range(207))], pa.large_list(pa.int32())),
    })
    with pytest.raises(ValueError, match="max_ref_hashes"):
        reference_contamination_stats(corpus, ref, n=8, max_ref_hashes=100)


def test_raw_shard_paths_rejects_transformed_dataset(tmp_path):
    """A transformed dataset has no input_files lineage on this Ray — the
    fast path must refuse it rather than silently ignore the transform."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import vocab_histogram

    t = pa.table({
        "tokens": pa.array([[1, 2], [3]], pa.large_list(pa.int32())),
    })
    p = str(tmp_path / "s.parquet")
    pq.write_table(t, p)
    ds = ray.data.read_parquet([p]).map_batches(lambda b: b,
                                                batch_format="pyarrow")
    with pytest.raises(ValueError, match="input_files lineage"):
        vocab_histogram(ds, raw_shard_paths=[p])


def test_max_hot_spans_bounded_driver_set_on_boilerplate_corpus():
    """The 100-TB hot-span path: a boilerplate-heavy corpus (50% of docs
    share a template) with min_docs=2 has an unbounded hot set; with
    ``max_hot_spans=K`` the driver set is bounded at K and contains
    exactly the K most-duplicated spans (brute-force oracle), recall
    degrades from the weakest spans first, and the strip actuator still
    removes the template. cap >= |hot| reproduces the exact path."""
    from collections import defaultdict

    from contest_parsing_ray.stages.tokens import (
        _hot_span_hashes,
        _window_hashes,
        cross_doc_span_stats,
        strip_cross_doc_spans,
    )

    n = 8
    rng = np.random.default_rng(123)
    template = rng.integers(1000, 2000, 30).astype(np.int32).tolist()
    mid = [rng.integers(2000, 3000, 12).astype(np.int32).tolist()
           for _ in range(10)]  # shared by varying subsets of docs
    docs, ids = [], []
    for i in range(200):
        body = rng.integers(10_000, 50_000, 40).astype(np.int32).tolist()
        toks = list(body)
        if i % 2 == 0:
            toks = template + toks          # 50% share the template
        if i % 3 == 0:
            toks += mid[i % 10]             # mid-frequency spans
        docs.append(toks)
        ids.append(f"doc-{i:04d}")
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(docs, pa.large_list(pa.int32())),
    })
    ds = ray.data.from_arrow(t)

    # brute-force oracle: distinct-doc count per window hash
    by_hash = defaultdict(set)
    for did, toks in zip(ids, docs):
        arr = np.asarray(toks, np.int32)
        offs = np.array([0, len(arr)], np.int64)
        hs, _nw, _ok, _rel = _window_hashes(arr, offs, n)
        for h in np.unique(hs.view(np.int64)):
            by_hash[int(h)].add(did)
    exact_hot = {h for h, d in by_hash.items() if len(d) >= 2}
    order = sorted(exact_hot, key=lambda h: (-len(by_hash[h]), h))

    got_exact = _hot_span_hashes(ds, n=n, min_docs=2, tokens_col="tokens",
                                 id_col="doc_id", num_partitions=4)
    assert set(got_exact.tolist()) == exact_hot
    assert len(exact_hot) > 60  # genuinely boilerplate-heavy

    K = 40
    got_cap = _hot_span_hashes(ds, n=n, min_docs=2, tokens_col="tokens",
                               id_col="doc_id", num_partitions=4,
                               max_hot_spans=K)
    assert len(got_cap) == K  # bounded driver set
    assert set(got_cap.tolist()) == set(order[:K])  # exact top-K
    recall = len(set(got_cap.tolist()) & exact_hot) / len(exact_hot)
    assert abs(recall - K / len(exact_hot)) < 1e-9  # weakest dropped first

    # the template's windows are the most-shared spans -> all in top-K
    tmpl = np.asarray(template, np.int32)
    th, _, _, _ = _window_hashes(
        tmpl, np.array([0, len(tmpl)], np.int64), n)
    assert set(th.view(np.int64).tolist()) <= set(got_cap.tolist())

    # capped strip still removes the template from every doc
    cleaned = strip_cross_doc_spans(
        ds, n=n, min_docs=2, max_hot_spans=K, num_partitions=4
    ).to_pandas().set_index("doc_id")
    tset = set()
    for i in range(len(template) - n + 1):
        tset.add(tuple(template[i:i + n]))
    for did, toks in zip(ids, docs):
        row = cleaned.loc[did, "tokens"]
        grams = {tuple(row[i:i + n]) for i in range(len(row) - n + 1)}
        assert not (grams & tset), f"template survived in {did}"

    # cap >= |hot| == exact path, for detector and strip
    big = len(exact_hot) + 10
    a = (cross_doc_span_stats(ds, n=n, min_docs=2, num_partitions=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (cross_doc_span_stats(ds, n=n, min_docs=2, num_partitions=4,
                              max_hot_spans=big)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hot_span_hash_slicing_matches_single_pass():
    """Hash-domain slicing (the bounded-disk exchange mode) must be
    exactly equivalent to the single-pass exchange — every hash lives in
    one slice, so the union of per-slice hot sets is the hot set."""
    from contest_parsing_ray.stages.tokens import (
        _hot_span_hashes,
        cross_doc_span_stats,
    )

    rng = np.random.default_rng(77)
    shared = rng.integers(0, 500, 25).astype(np.int32).tolist()
    ids, toks = [], []
    for i in range(120):
        body = rng.integers(1000, 30_000, int(rng.integers(0, 50)))
        body = body.astype(np.int32).tolist()
        if i % 3 == 0:
            body = shared + body
        ids.append(f"d{i:03d}")
        toks.append(body)
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(toks, pa.large_list(pa.int32())),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    one = _hot_span_hashes(ds, n=8, min_docs=2, tokens_col="tokens",
                           id_col="doc_id", num_partitions=4, num_slices=1)
    sliced = _hot_span_hashes(ds, n=8, min_docs=2, tokens_col="tokens",
                              id_col="doc_id", num_partitions=4,
                              num_slices=5)
    np.testing.assert_array_equal(one, sliced)
    assert len(one) > 0
    # and through the public detector, capped + sliced together
    a = (cross_doc_span_stats(ds, n=8, min_docs=2, num_partitions=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (cross_doc_span_stats(ds, n=8, min_docs=2, num_partitions=4,
                              num_slices=3, max_hot_spans=10_000)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hot_span_per_shard_combiner_matches_generic(tmp_path):
    """The raw_shard_paths fused read+pair path (the corpus-scale recipe
    that keeps the token payload out of the all-to-all boundary) must
    agree exactly with the generic map_batches path, sliced or not."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import cross_doc_span_stats

    rng = np.random.default_rng(55)
    shared = rng.integers(0, 400, 20).astype(np.int32).tolist()
    paths = []
    k = 0
    for i in range(4):
        ids, toks = [], []
        for _ in range(60):
            body = rng.integers(1000, 30_000, int(rng.integers(0, 40)))
            body = body.astype(np.int32).tolist()
            if k % 3 == 0:
                body = shared + body
            ids.append(f"d{k:04d}")
            toks.append(body)
            k += 1
        t = pa.table({
            "doc_id": pa.array(ids),
            "tokens": pa.array(toks, pa.large_list(pa.int32())),
        })
        p = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    ds = ray.data.read_parquet(paths)
    a = (cross_doc_span_stats(ds, n=8, min_docs=2, num_partitions=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (cross_doc_span_stats(ds, n=8, min_docs=2, num_partitions=4,
                              raw_shard_paths=paths, num_slices=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_hot_windows"] > 0).any()


def test_reference_contamination_cap_counts_global_distinct():
    """The max_ref_hashes cap must judge the GLOBAL distinct gram set,
    not the sum of per-batch distincts — a boilerplate-heavy reference
    (same template repeated across many batches) is legal as long as its
    distinct grams fit (review round-5 finding #1)."""
    from contest_parsing_ray.stages.tokens import reference_contamination_stats

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a"]),
        "tokens": pa.array([[1, 2, 3, 4, 5, 6, 7, 8]],
                           pa.large_list(pa.int32())),
    }))
    shared = list(range(20))  # 13 distinct 8-grams, repeated in every row
    ref = ray.data.from_arrow(pa.table({
        "tokens": pa.array([shared] * 500, pa.large_list(pa.int32())),
    })).repartition(10)
    out = reference_contamination_stats(
        corpus, ref, n=8, max_ref_hashes=50).to_pandas()
    assert len(out) == 1  # 500 * 13 per-batch distincts, 13 global: OK


def test_raw_shard_paths_duplicates_raise(tmp_path):
    """A duplicated shard path would be read twice and double its counts
    — the set-compare guard alone missed it (review round-5 finding #3)."""
    import pyarrow.parquet as pq

    from contest_parsing_ray.stages.tokens import vocab_histogram

    p = str(tmp_path / "s.parquet")
    pq.write_table(
        pa.table({"tokens": pa.array([[1, 2]], pa.large_list(pa.int32()))}),
        p,
    )
    ds = ray.data.read_parquet([p])
    with pytest.raises(ValueError, match="duplicate"):
        vocab_histogram(ds, raw_shard_paths=[p, p])
