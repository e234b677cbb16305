"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

These are the large-scale-training-data operators layered on the engine
(per the build brief) — the reference's closest analog is the log
template-mining stage (``LogsParser.py:21-37``): a stateful text parser run
per file; here each scorer is a stateless/actor ``map_batches`` with
regexes compiled ONCE per actor in ``__init__``.

All operators are deterministic, vectorized via pandas ``.str`` /
re over batches, and schema-stable.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WORD_RE = r"[A-Za-z0-9_]+"

# Seed corpora for the char-trigram language profiles (authored here; the
# classifier is the standard n-gram log-likelihood ratio — Cavnar & Trenkle
# 1994 — with fixed profiles, no runtime training).
_LANG_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs back "
        "to the house because there is nothing better to do in the evening "
        "when all of the work has been finished and the children are sleeping "
        "we should always remember that every good thing takes time and effort"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und laeuft "
        "dann zurueck zum haus weil es am abend nichts besseres zu tun gibt "
        "wenn die ganze arbeit erledigt ist und die kinder schlafen sollten "
        "wir immer daran denken dass jede gute sache zeit und muehe braucht"
    ),
    "fr": (
        "le renard brun et rapide saute par dessus le chien paresseux puis il "
        "retourne vers la maison parce qu il n y a rien de mieux a faire le "
        "soir quand tout le travail est termine et que les enfants dorment "
        "nous devrions toujours nous rappeler que toute bonne chose prend du temps"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego vuelve "
        "a la casa porque no hay nada mejor que hacer por la noche cuando "
        "todo el trabajo esta terminado y los ninos duermen debemos recordar "
        "siempre que toda cosa buena requiere tiempo y esfuerzo"
    ),
}


class TokenCount:
    """Whitespace/word-regex token counting (BPE-ish proxy). Regex compiled
    once per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(_WORD_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_words"] = s.str.count(_WORD_RE).astype(np.int64)
        batch["n_ws_tokens"] = s.str.split().str.len().fillna(0).astype(np.int64)
        return batch


class QualityScore:
    """Length / punctuation / character-class ratios (C4/Gopher-style
    heuristics, public rules)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len().astype(np.int64)
        n_alpha = s.str.count(r"[A-Za-z]").astype(np.int64)
        n_digit = s.str.count(r"[0-9]").astype(np.int64)
        n_punct = s.str.count(r"[\.,;:!\?]").astype(np.int64)
        n_words = s.str.count(_WORD_RE).astype(np.int64)
        denom = n_chars.replace(0, 1).astype(np.float64)
        batch["n_chars_text"] = n_chars
        batch["alpha_ratio"] = (n_alpha / denom).astype(np.float64)
        batch["digit_ratio"] = (n_digit / denom).astype(np.float64)
        batch["punct_ratio"] = (n_punct / denom).astype(np.float64)
        batch["mean_word_len"] = (
            n_alpha / n_words.replace(0, 1).astype(np.float64)
        ).astype(np.float64)
        return batch


class LangId:
    """Char-trigram log-likelihood language ID (Cavnar & Trenkle style).

    Model build happens ONCE per actor in ``__init__`` (the stateful-stage
    pattern a real fastText-style model would use): per-language trigram
    log-probs over the seed corpora, laid out as a sorted hash table +
    (n_trigrams, n_langs) weight matrix. Per batch: ONE buffer-level
    trigram-hash pass over all docs, ``searchsorted`` lookup, segmented
    sum via ``reduceat`` — no per-document Python loop."""

    def __init__(self, text_col: str = "text", max_chars: int = 1000):
        from .neardup import _batch_shingles

        self.text_col = text_col
        self.max_chars = max_chars
        self._shingles = _batch_shingles
        self.langs = sorted(_LANG_SEEDS)
        counts: dict[int, np.ndarray] = {}
        totals = np.zeros(len(self.langs), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            flat, _ = _batch_shingles(
                pa.array([_LANG_SEEDS[lang]], type=pa.string()), n=3
            )
            totals[li] = len(flat)
            uniq, c = np.unique(flat, return_counts=True)
            for h, n in zip(uniq, c):
                counts.setdefault(int(h), np.zeros(len(self.langs)))[li] = n
        vocab = len(counts)
        self.known = np.array(sorted(counts), dtype=np.uint64)
        mat = np.stack([counts[int(h)] for h in self.known])
        # add-one smoothed log-probs; OOV trigram -> per-language floor
        self.weights = np.log((mat + 1.0) / (totals + vocab)[None, :])
        self.oov = np.log(1.0 / (totals + vocab))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").str.lower().str.slice(0, self.max_chars)
        flat, offsets = self._shingles(pa.array(texts, type=pa.string()), n=3)
        idx = np.searchsorted(self.known, flat)
        idx_c = np.minimum(idx, len(self.known) - 1)
        matched = self.known[idx_c] == flat
        w = np.where(matched[:, None], self.weights[idx_c], self.oov[None, :])
        # sentinel row keeps reduceat happy for the trailing segment
        w = np.vstack([w, np.zeros((1, len(self.langs)))])
        sums = np.add.reduceat(w, offsets[:-1], axis=0)
        lens = np.diff(offsets)
        mean_ll = sums / np.maximum(lens, 1)[:, None]
        # reduceat on an EMPTY segment (doc with <3 chars) returns the next
        # segment's first row — batch-split-dependent. Pin empty docs to the
        # per-language OOV floor so prediction/score are batching-invariant.
        empty = lens == 0
        if empty.any():
            mean_ll[empty] = self.oov[None, :]
        best = np.argmax(mean_ll, axis=1)
        batch["lang_pred"] = np.array(self.langs, dtype=object)[best]
        # margin of the winner over the runner-up mean log-likelihood,
        # quantized to 1e-9: reduceat's pairwise-summation grouping depends
        # on segment alignment, so raw scores carry ~1e-15 batching noise
        # that would break byte-exact golden/driver compares
        part = np.partition(mean_ll, -2, axis=1)
        batch["lang_score"] = np.round(
            (part[:, -1] - part[:, -2]).astype(np.float64), 9
        )
        return batch


class RegexRedact:
    """Regex redaction (PII-scrub shape): replace every match of
    ``pattern`` with ``replacement`` and count the redactions per doc.

    The kernel is RE2 via ``pyarrow.compute`` (same dialect DuckDB uses,
    so SQL oracles compare byte-exact); zero Python per row. Real PII
    passes plug in email/phone/SSN patterns; compile cost is once per
    actor (``__init__``), per the stateful-stage rule.
    """

    def __init__(
        self,
        pattern: str,
        replacement: str = "<REDACTED>",
        text_col: str = "text",
        out_col: str = "text_redacted",
    ):
        self.pattern = pattern
        self.replacement = replacement
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[self.text_col]
        # null text stays null (SQL regexp_replace(NULL, ...) semantics)
        batch = batch.append_column(
            self.out_col,
            pc.replace_substring_regex(
                col, pattern=self.pattern, replacement=self.replacement
            ),
        )
        return batch.append_column(
            "n_redacted",
            pc.count_substring_regex(col, pattern=self.pattern).cast(pa.int64()),
        )


class RepetitionScore:
    """Within-document repetition (Gopher-style quality rule): fraction of
    word occurrences that are repeats of an earlier word in the same doc
    (``1 - distinct_words / n_words``).

    Vectorized end-to-end: one Arrow split to a list column, one
    buffer-level hash over the flattened words, one lexsort to count
    distinct (doc, word) pairs — no per-document Python loop.

    Null text is treated as the empty document (n_words_sep=1 — the empty
    string splits to [""] — dup_word_frac=0), NOT dropped; callers that
    need SQL's NULL-row-absent semantics should filter nulls first.
    """

    def __init__(self, text_col: str = "text", sep: str = " "):
        self.text_col = text_col
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ._shuffle import hash64_strings

        col = pc.fill_null(batch[self.text_col], "")
        words = pc.split_pattern(col, pattern=self.sep).combine_chunks()
        flat = words.flatten()
        # list<...> carries int32 offsets, large_list<...> int64 (when the
        # input column is large_string)
        off_dtype = np.int64 if pa.types.is_large_list(words.type) else np.int32
        offsets = np.frombuffer(words.buffers()[1], dtype=off_dtype)[
            words.offset : words.offset + len(words) + 1
        ].astype(np.int64)
        n_words = np.diff(offsets)
        if len(flat):
            h = hash64_strings(flat)
            parent = np.repeat(
                np.arange(len(words), dtype=np.int64), n_words
            )
            order = np.lexsort((h, parent))
            hp, pp = h[order], parent[order]
            first = np.empty(len(hp), dtype=bool)
            first[0] = True
            first[1:] = (pp[1:] != pp[:-1]) | (hp[1:] != hp[:-1])
            n_distinct = np.bincount(pp[first], minlength=len(words))
        else:
            n_distinct = np.zeros(len(words), dtype=np.int64)
        denom = np.maximum(n_words, 1).astype(np.float64)
        rep = 1.0 - n_distinct / denom
        batch = batch.append_column(
            "n_words_sep", pa.array(n_words, type=pa.int64())
        )
        batch = batch.append_column(
            "n_distinct_words", pa.array(n_distinct, type=pa.int64())
        )
        return batch.append_column(
            "dup_word_frac", pa.array(rep, type=pa.float64())
        )


def word_topk(
    docs: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
    sep: str = " ",
) -> ray.data.Dataset:
    """Corpus-wide top-k word frequencies → ``(word, cnt)``.

    Per-batch partial ``value_counts`` collapse the stream to ~vocabulary
    size before the groupby shuffle (the partial-before-shuffle rule), so
    the exchange moves O(vocab × batches) tiny rows, never the corpus.
    Ties broken deterministically: cnt desc, word asc.
    """
    import pyarrow.compute as pc

    from ._shuffle import partial_value_counts

    def to_words(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col], "")
        flat = pc.list_flatten(pc.split_pattern(col, pattern=sep))
        return pa.table({"word": flat.cast(pa.string())})

    words = docs.select_columns([text_col]).map_batches(
        to_words, batch_format="pyarrow"
    )
    return (
        partial_value_counts(words, "word")
        .sort(["cnt", "word"], descending=[True, False])
        .limit(k)
    )


class Fingerprint:
    """64-bit polynomial rolling-hash document fingerprint (Rabin-Karp
    style over UTF-8 bytes) — vectorized over the Arrow buffer."""

    BASE = np.uint64(1099511628211)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ._shuffle import hash64_strings

        fp = hash64_strings(batch[self.text_col])
        return batch.append_column(
            "fingerprint", pa.array(fp.view(np.int64), type=pa.int64())
        )


def analyze_text(
    docs: ray.data.Dataset, text_col: str = "text", concurrency: int = 4
) -> ray.data.Dataset:
    """Full text-analysis pass: token counts + quality + language ID +
    fingerprint in one actor-pool pipeline."""
    out = docs.map_batches(
        TokenCount, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=(1, concurrency),
    )
    out = out.map_batches(
        QualityScore, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=(1, concurrency),
    )
    out = out.map_batches(
        LangId, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=(1, concurrency),
    )
    out = out.map_batches(
        Fingerprint, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=(1, concurrency),
    )
    return out
