"""PII redaction (pipelines/pii.py) and train/eval n-gram decontamination
(pipelines/decontaminate.py): kernel correctness vs naive references, and
the broadcast-vs-distributed plan equality the scale fallback relies on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.pipelines.decontaminate import (
    batch_ngram_hashes, decontaminate, _positional_multipliers)
from forecastframe_ray.pipelines.pii import PII_PATTERNS, redact_pii_batch


def test_redact_pii_batch_counts_and_output():
    df = pd.DataFrame({"text": [
        "write to a.b-c_d%e@sub.example.co.uk today",
        "server at 10.0.255.3, backup 192.168.1.1.",
        "call +1 (555) 010-4477 or +44 20 7946 0958 now",
        "clean text, no pii at all",
        "mix: x@y.io from 8.8.8.8 tel +33 1 23 45 67 89",
    ]})
    out = redact_pii_batch(df.copy(), "text")
    assert out["n_emails"].tolist() == [1, 0, 0, 0, 1]
    assert out["n_ips"].tolist() == [0, 2, 0, 0, 1]
    assert out["n_phones"].tolist() == [0, 0, 2, 0, 1]
    red = out["text_redacted"]
    assert red[0] == "write to <EMAIL> today"
    assert red[1] == "server at <IP>, backup <IP>."
    assert red[2] == "call <PHONE> or <PHONE> now"
    assert red[3] == "clean text, no pii at all"
    assert red[4] == "mix: <EMAIL> from <IP> tel <PHONE>"


def test_redact_pii_placeholders_never_rematch():
    # placeholders contain no digits/@ so later passes can't re-match them;
    # a second full application must be a no-op (idempotent redaction)
    df = pd.DataFrame({"text": ["a@b.co 1.2.3.4 +1234567890 a@b.co"]})
    once = redact_pii_batch(df.copy(), "text")["text_redacted"]
    twice = redact_pii_batch(pd.DataFrame({"text": once}), "text")
    assert twice["text_redacted"].tolist() == once.tolist()
    assert (twice[["n_emails", "n_ips", "n_phones"]].to_numpy() == 0).all()


def test_batch_ngram_hashes_matches_naive():
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, size=int(k)))
             for k in rng.integers(0, 15, size=40)]
    texts += ["", "a b c", "  leading  and   multi   space  x y z w q r s t"]
    n = 5
    doc_idx, g = batch_ngram_hashes(pd.Series(texts), n)
    mult = _positional_multipliers(n)
    ref = []
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) < n:
            continue
        th = pd.util.hash_array(np.array(toks, dtype=object))
        with np.errstate(over="ignore"):
            for j in range(len(toks) - n + 1):
                h = np.uint64(0)
                for k in range(n):
                    h = h + mult[k] * th[j + k]
                ref.append((i, int(h)))
    assert sorted(zip(doc_idx.tolist(),
                      g.astype("uint64").tolist())) == sorted(ref)


def _corpus():
    # eval docs plant known 8-grams; train docs 2 and 5 copy them
    gram_a = "alpha beta gamma delta epsilon zeta eta theta"
    gram_b = "one two three four five six seven eight"
    rows = [
        (10, f"eval doc starts {gram_a} and ends here"),          # eval
        (20, f"another eval {gram_b} tail words go on"),          # eval
        (1, "clean train doc with nothing shared at all ok"),
        (2, f"contaminated: {gram_a} copied verbatim"),
        (3, "short"),
        (4, ""),
        (5, f"{gram_a} also {gram_b} double hit here"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.mark.parametrize("threshold", [10**9, 0])
def test_decontaminate_both_paths(threshold):
    df = _corpus()
    train = ray.data.from_pandas(df[df.doc_id % 10 != 0])
    evald = ray.data.from_pandas(df[df.doc_id % 10 == 0])
    out = (decontaminate(train, evald, n=8, broadcast_threshold=threshold,
                         num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert out["contaminated"].astype(bool).tolist() == [
        False, True, False, False, True]
    # doc 2 shares exactly the 1 planted 8-gram; doc 5 shares both
    assert out.loc[out.doc_id == 2, "n_overlap"].item() == 1
    assert out.loc[out.doc_id == 5, "n_overlap"].item() == 2
    assert out["n_overlap"].dtype == np.int64


def test_decontaminate_empty_eval_side():
    df = _corpus()
    train = ray.data.from_pandas(df[df.doc_id % 10 != 0])
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")}))
    out = decontaminate(train, empty, n=8).to_pandas()
    assert (out["n_overlap"] == 0).all()
    assert (~out["contaminated"]).all()


def test_repetition_batch_matches_naive():
    from forecastframe_ray.pipelines.textstats import repetition_batch

    texts = [
        "x y x y x y",                      # heavy 2-gram repetition
        "a b c d e a b c d e a b c d e",    # dup 5-grams
        "all unique words here now",
        "",
        "one\ntwo\none\nthree\ntwo\none",   # dup lines
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = repetition_batch(df.copy(), "text")
    raw = repetition_batch(df.copy(), "text", raw_counts=True)

    for i, t in enumerate(texts):
        nchar = len(t)
        lines = [l for l in t.split("\n") if l != ""]
        from collections import Counter
        lc = Counter(lines)
        exp_dlf = 1 - len(lc) / len(lines) if lines else 0.0
        tot = sum(len(l) * c for l, c in lc.items())
        dup = sum(len(l) * c for l, c in lc.items() if c > 1)
        assert out.loc[i, "n_lines"] == len(lines)
        assert out.loc[i, "dup_line_frac"] == pytest.approx(exp_dlf)
        assert out.loc[i, "dup_line_char_frac"] == pytest.approx(
            dup / tot if tot else 0.0)

        toks = t.split()
        for n, col, red in ((2, "top_2gram_char_frac", "top"),
                            (5, "dup_5gram_char_frac", "dup")):
            grams = Counter(" ".join(toks[j:j + n])
                            for j in range(len(toks) - n + 1))
            if red == "top":
                val = max((c * len(g) for g, c in grams.items()),
                          default=0)
            else:
                val = sum(c * len(g) for g, c in grams.items() if c > 1)
            assert out.loc[i, col] == pytest.approx(
                val / max(nchar, 1) if grams else 0.0)

    # raw counts are the exact numerators of the fractions
    m = raw["tot_line_chars"] > 0
    assert np.allclose(out.loc[m, "dup_line_char_frac"],
                       raw.loc[m, "dup_line_chars"]
                       / raw.loc[m, "tot_line_chars"])


def test_decontaminate_distributed_partial_counts_summed():
    # regression: a doc whose matched grams scatter over MANY gram-hash
    # partitions must still get ONE row with the full count (the per-
    # partition partial counts are summed before the join-back)
    eval_text = " ".join(f"ev{i}" for i in range(64))  # 57 distinct 8-grams
    rows = [(10, eval_text),                       # eval doc
            (1, eval_text + " trailing unique tokens here now"),
            (2, "completely clean document with no overlap at all")]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    train = ray.data.from_pandas(df[df.doc_id % 10 != 0])
    evald = ray.data.from_pandas(df[df.doc_id % 10 == 0])
    out = (decontaminate(train, evald, n=8, broadcast_threshold=0,
                         num_partitions=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    assert out.loc[out.doc_id == 1, "n_overlap"].item() == 57
    assert out.loc[out.doc_id == 2, "n_overlap"].item() == 0
