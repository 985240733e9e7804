"""JS divergence / Cohen's kappa edges."""

import numpy as np
import pandas as pd


def test_js_divergence_identical_source_is_near_zero(ray_session,
                                                     tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # one source IS the corpus -> JS = 0; a disjoint-vocab source is
    # bounded by ln 2
    pd.DataFrame({"doc_id": range(4),
                  "source": ["a", "a", "b", "b"],
                  "text": ["x y z", "x y z", "q r s", "q r s"],
                  "lang": ["en"] * 4, "n_chars": [5] * 4}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = Q.q_js_divergence_sources(str(tmp_path)).set_index("source")
    # both sources hold half the mass with disjoint vocab:
    # present-term p=1/3 q=1/6 each (3 tokens), plus absent mass ln2/2
    assert 0 < out.loc["a", "js_div"] <= np.round(np.log(2), 6)
    assert out.loc["a", "js_div"] == out.loc["b", "js_div"]
    # single-source corpus -> p == q -> JS exactly 0
    pd.DataFrame({"doc_id": [0], "source": ["solo"],
                  "text": ["x y z"], "lang": ["en"], "n_chars": [5]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out2 = Q.q_js_divergence_sources(str(tmp_path))
    assert out2.loc[0, "js_div"] == 0.0


def test_cohen_kappa_perfect_agreement(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # texts built from each language's stopwords -> lang_id nails them
    texts = {"en": "the and is of to in", "de": "der und ist das ein",
             "es": "el la de que en los", "fr": "le la et les des un"}
    rows = []
    for lang, t in texts.items():
        for i in range(3):
            rows.append((len(rows), t, lang))
    pd.DataFrame({"doc_id": [r[0] for r in rows],
                  "text": [r[1] for r in rows],
                  "lang": [r[2] for r in rows],
                  "source": ["s"] * len(rows),
                  "n_chars": [len(r[1]) for r in rows]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = Q.q_cohen_kappa_lang(str(tmp_path))
    if out.loc[0, "p_observed"] == 1.0:
        assert out.loc[0, "kappa"] == 1.0
    # kappa is always <= 1 and > -1
    assert -1.0 < out.loc[0, "kappa"] <= 1.0
