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

# Tiny stopword sets for n-gram-free language ID (heuristic; deterministic).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
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
    """Stopword-vote language ID (deterministic heuristic; a real model
    would load here once per actor — same plumbing)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(_WORD_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        scores = []
        for t in batch[self.text_col].fillna(""):
            words = set(w.lower() for w in self.word.findall(t)[:200])
            best, best_n = "unknown", 0
            for lang, sw in _STOPWORDS.items():
                n = len(words & sw)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
            scores.append(best_n)
        batch["lang_pred"] = langs
        batch["lang_score"] = np.asarray(scores, dtype=np.int64)
        return batch


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
