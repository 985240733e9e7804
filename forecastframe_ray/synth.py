"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F3).

Schema per ``BASELINE.json`` input_hint:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Design goals:

- **Deterministic & batch-independent**: every field of row ``i`` is a pure
  function of ``(seed, i)`` via a splitmix64-style mixer — the same corpus is
  produced at any parallelism / block split, so bench runs at 8 and 32 CPUs
  see identical input.
- **Zipf-skewed domains** (log-uniform rank ⇒ the top domain holds ~15% of
  pages) to exercise salted repartitioning before windowed aggregation.
- **Crawl-time gaps** within hosts to exercise gap-fill.
- **Non-circular text oracle**: the stored ``text`` column is assembled from
  the canonical pieces (title, body, entity marker), while ``html`` embeds
  escaped versions of the same pieces inside tags/script/style noise. The
  engine's extractor (:mod:`forecastframe_ray.extract`) must reproduce
  ``text`` byte-identically.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

import ray.data

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
SPAN_DAYS = 28
_DAY_US = 86_400_000_000

_TLDS = ("com", "org", "net", "io", "de")
_SUBS = ("www", "blog", "shop", "docs")
_LANGS = ("en", "en", "en", "en", "en", "en", "en", "de", "fr", "es")  # 70% en

_WORDS = (
    "data stream batch arrow shard block window rollup tier bucket crawl page "
    "host domain fetch parse index token vector metric series gap fill lag "
    "delta gorilla codec chunk point value count mean total merge sort group "
    "key hash salt skew spill queue actor pool task node cluster scale "
    "byte text html link title body head style script render cache store "
    "read write scan filter map join union limit sample rank label class "
    "model train test split fold error score loss grad step rate decay "
    "time stamp hour day week month year zone epoch range span slice bound "
    "plan stage graph probe build emit yield flow drain batchy quorum shardlet"
).split()
assert len(_WORDS) >= 100
_WORDS2 = _WORDS * 3  # wraparound slicing


def _mix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mixer)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fields(ids: np.ndarray, seed: int, num_domains: int) -> dict[str, np.ndarray]:
    """All numeric per-row fields as vectorized numpy (no Python loop)."""
    base = ids.astype(np.uint64) + (np.uint64(seed) << np.uint64(32))
    m1 = _mix(base)
    m2 = _mix(base + np.uint64(1))
    m3 = _mix(base + np.uint64(2))
    m4 = _mix(base + np.uint64(3))
    m5 = _mix(base + np.uint64(4))
    m6 = _mix(base + np.uint64(5))
    m7 = _mix(base + np.uint64(6))

    u = m1.astype(np.float64) / 2.0**64
    # log-uniform domain rank in [1, D] → Zipf-ish skew
    rank = np.minimum(num_domains, np.floor(num_domains**u).astype(np.int64) + 0) + 0
    rank = np.maximum(rank, 1)

    day = (m3 % np.uint64(SPAN_DAYS)).astype(np.int64)
    # carve weekly-ish holes per (domain, weekday) to guarantee gaps
    hole = (day + rank) % 5 == 0
    day = np.where(hole, (day + 1) % SPAN_DAYS, day)
    intra = (m4 % np.uint64(_DAY_US)).astype(np.int64)
    ts_us = BASE_TS_US + day * _DAY_US + intra

    return {
        "rank": rank,
        "sub_ix": (m2 % np.uint64(1) + (m2 % np.uint64(4))).astype(np.int64) % (1 + rank % 3),
        "ts_us": ts_us,
        "lang_ix": (m5 % np.uint64(len(_LANGS))).astype(np.int64),
        "n_words": (20 + m6 % np.uint64(108)).astype(np.int64),
        "word_off": (m7 % np.uint64(len(_WORDS))).astype(np.int64),
    }


def _make_batch(ids: np.ndarray, seed: int, num_domains: int) -> pa.Table:
    f = _fields(ids, seed, num_domains)
    n = len(ids)
    urls = np.empty(n, dtype=object)
    htmls = np.empty(n, dtype=object)
    texts = np.empty(n, dtype=object)
    langs = np.empty(n, dtype=object)

    rank, sub_ix = f["rank"], f["sub_ix"]
    n_words, word_off, lang_ix = f["n_words"], f["word_off"], f["lang_ix"]
    for j in range(n):
        i = int(ids[j])
        k = int(rank[j])
        tld = _TLDS[k % len(_TLDS)]
        host = f"{_SUBS[int(sub_ix[j])]}.site{k:05d}.{tld}"
        url = f"https://{host}/p/{i}"
        title = f"Page {i} — {host}"
        body = " ".join(_WORDS2[int(word_off[j]): int(word_off[j]) + int(n_words[j])])
        pieces = [title, title, body]  # <title> and <h1> both surface the title
        marker = ""
        if i % 7 == 0:
            pieces.append("Tom & Jerry <3")
            marker = "<p>Tom &amp; Jerry &lt;3</p>"
        text = " ".join(pieces)
        et = _html.escape(title)
        eb = _html.escape(body)
        html_doc = (
            f"<!DOCTYPE html><html><head><title>{et}</title>"
            f"<style>body{{margin:0;color:#222}}</style>"
            f"<script>var p={i};if(p>1){{p=0}}</script></head>"
            f"<body>\n  <h1>{et}</h1>\n  <p>{eb}</p>{marker}\n"
            f"<!-- crawl {i} --></body></html>"
        )
        urls[j] = url
        htmls[j] = html_doc.encode("utf-8")
        texts[j] = text
        langs[j] = _LANGS[int(lang_ix[j])]

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(f["ts_us"], type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def pages_dataset(num_pages: int, seed: int = 42, num_domains: int = 500,
                  override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Lazy, distributed, deterministic pages corpus as a Ray Dataset."""

    def gen(batch: dict) -> pa.Table:
        return _make_batch(np.asarray(batch["id"], dtype=np.int64), seed, num_domains)

    ds = ray.data.range(num_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy", batch_size=8192)


def pages_table(num_pages: int, seed: int = 42, num_domains: int = 500) -> pa.Table:
    """Driver-side small corpus for unit tests (no Ray needed)."""
    return _make_batch(np.arange(num_pages, dtype=np.int64), seed, num_domains)


def write_pages_corpus(path: str, num_pages: int, seed: int = 42,
                       num_domains: int = 500, num_blocks: int = 64) -> None:
    """Materialize a corpus to partitioned Parquet (bench input, cached)."""
    pages_dataset(num_pages, seed, num_domains, override_num_blocks=num_blocks).write_parquet(path)


# ---------------------------------------------------------------------------
# synthetic documents corpus (LLM-pipeline flagship input)
# ---------------------------------------------------------------------------

#: corpus-wide boilerplate line pool (every line ≥5 words with terminal
#: punctuation, so C4 cleaning alone would KEEP them — only the corpus-level
#: frequency pass can remove them; this is what makes the stage ordering in
#: pipelines/llm.py observable)
_BOILER = tuple(
    f"{_WORDS[(7 * k) % len(_WORDS)].capitalize()} {_WORDS[(11 * k + 3) % len(_WORDS)]} "
    f"site notice number {k:02d} all rights reserved."
    for k in range(20)
)

#: doc-kind codes emitted in the test-only ``kind`` column
DOC_UNIQUE, DOC_EXACT_DUP, DOC_NEAR_DUP, DOC_JUNK = 0, 1, 2, 3


def _template_lines(t: int, seed: int) -> list[str]:
    """Deterministic 3–8 good C4-style lines for template ``t`` (pure
    function of (seed, t) — exact-dup docs regenerate it bit-identically)."""
    base = np.uint64(t) + (np.uint64(seed + 101) << np.uint64(32))
    # re-mix into a per-template 64-bit salt BEFORE deriving per-line
    # streams: with raw ``base + j`` inputs, template t's line j would
    # collide with template t+1's line j-1 (a sliding window over one hash
    # sequence) and neighboring templates would share their entire line sets
    salt = _mix(np.array([base]))[0]
    h = _mix(np.array([salt + np.uint64(1)]))[0]
    nl = 3 + int(h % np.uint64(5))
    lines = []
    for j in range(nl):
        hj = _mix(np.array([salt + np.uint64(10 + j)]))[0]
        off = int(hj % np.uint64(len(_WORDS)))
        ln_len = 6 + int((hj >> np.uint64(32)) % np.uint64(9))
        words = _WORDS2[off: off + ln_len]
        # high-entropy ref token: ordinary content lines must be (nearly)
        # unique per (template, line) — without it the ~900-string line
        # space would make EVERY line corpus-frequent "boilerplate" at scale
        ref = int(hj >> np.uint64(22)) % 10**12
        lines.append((" ".join(words)).capitalize() + f" ref{ref:012d}.")
    return lines


def _make_docs_batch(ids: np.ndarray, seed: int, num_templates: int) -> pa.Table:
    base = ids.astype(np.uint64) + (np.uint64(seed + 7) << np.uint64(32))
    m1 = _mix(base)
    m2 = _mix(base + np.uint64(1))
    m3 = _mix(base + np.uint64(2))
    m4 = _mix(base + np.uint64(3))
    m5 = _mix(base + np.uint64(4))
    m6 = _mix(base + np.uint64(5))

    r = (m1 % np.uint64(100)).astype(np.int64)
    texts = np.empty(len(ids), dtype=object)
    templates = np.empty(len(ids), dtype=np.int64)
    kinds = np.empty(len(ids), dtype=np.int8)
    tmpl_cache: dict[int, list[str]] = {}

    def tl(t: int) -> list[str]:
        if t not in tmpl_cache:
            tmpl_cache[t] = _template_lines(t, seed)
        return tmpl_cache[t]

    for j in range(len(ids)):
        i = int(ids[j])
        if r[j] < 60:            # unique doc: its own template
            t, kind = i, DOC_UNIQUE
            lines = list(tl(t))
        elif r[j] < 80:          # exact duplicate of a pooled template
            t, kind = int(m2[j] % np.uint64(num_templates)), DOC_EXACT_DUP
            lines = list(tl(t))
        elif r[j] < 92:          # near duplicate: one word mutated
            t, kind = int(m2[j] % np.uint64(num_templates)), DOC_NEAR_DUP
            lines = list(tl(t))
            lm = int(m3[j] % np.uint64(len(lines)))
            words = lines[lm][:-1].split(" ")
            # mutate one ORDINARY word (never the first, never the trailing
            # high-entropy ref token) so the doc stays a close near-dup
            words[1 + int(m4[j] % np.uint64(len(words) - 3))] = \
                f"mut{int(m4[j] % np.uint64(997))}"
            lines[lm] = " ".join(words) + "."
        else:                    # junk: short lines C4 drops
            t, kind = i, DOC_JUNK
            lines = ["click here", "main menu", f"page {i}"]
        nb = int(m5[j] % np.uint64(3))  # 0-2 boilerplate lines appended
        for b in range(nb):
            lines.append(_BOILER[int((m6[j] + np.uint64(b)) % np.uint64(len(_BOILER)))])
        texts[j] = "\n".join(lines)
        templates[j] = t
        kinds[j] = kind

    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "template": pa.array(templates, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.int8()),
    })


def docs_dataset(num_docs: int, seed: int = 42, num_templates: int | None = None,
                 override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Lazy, distributed, deterministic documents corpus: ~60% unique docs,
    20% exact duplicates and 12% near duplicates drawn from a shared
    template pool, 8% junk, all with appended corpus-level boilerplate
    lines. ``template``/``kind`` are TEST-ONLY ground-truth columns — the
    LLM pipeline reads ``(doc_id, text)``.

    Corpus-shape contract for the boilerplate threshold: a boilerplate line
    appears ~``num_docs/20`` times, a duplicate-class template line at most
    ~``3 × num_docs / num_templates`` ≈ 36× the mean class size of ~3.8 —
    pick ``max_repeats`` between the two (e.g. ``num_docs // 50``) so the
    frequency pass removes boilerplate but never duplicate-class content."""
    if num_templates is None:
        num_templates = max(1, num_docs // 12)

    def gen(batch: dict) -> pa.Table:
        return _make_docs_batch(np.asarray(batch["id"], dtype=np.int64),
                                seed, num_templates)

    ds = ray.data.range(num_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy", batch_size=8192)


def docs_table(num_docs: int, seed: int = 42,
               num_templates: int | None = None) -> pa.Table:
    """Driver-side small corpus for unit tests (no Ray needed)."""
    if num_templates is None:
        num_templates = max(1, num_docs // 12)
    return _make_docs_batch(np.arange(num_docs, dtype=np.int64), seed,
                            num_templates)


def write_docs_corpus(path: str, num_docs: int, seed: int = 42,
                      num_templates: int | None = None,
                      num_blocks: int = 64) -> None:
    """Materialize a documents corpus to partitioned Parquet (bench input)."""
    docs_dataset(num_docs, seed, num_templates,
                 override_num_blocks=num_blocks).write_parquet(path)


def diverse_docs_dataset(num_docs: int, dup_fraction: float = 0.1,
                         words_per_doc: int = 80, seed: int = 5,
                         override_num_blocks: int | None = None):
    """Content-DIVERSE deterministic corpus: every base doc's words embed
    its id (so docs share no shingles by construction), and a
    ``dup_fraction`` of docs are near-duplicates of a deterministically
    chosen EARLIER doc (last ~20% of words replaced → char-shingle
    Jaccard ≈ 0.75). The corpus shape where LSH collisions track true
    duplicates instead of template reuse — the measurement corpus for
    incremental-maintenance cost (``bench.py --llm-incremental``), the
    complement of :func:`docs_dataset`'s template-saturated shape."""
    import ray.data

    mod = max(2, int(round(1.0 / max(dup_fraction, 1e-9))))

    def _words(doc: int, count: int, salt: int = 0) -> list[str]:
        # 12-hex-char words from a per-doc seeded generator: no two docs
        # share a word, so no two non-dup docs share a 5-char shingle
        # beyond separator noise (short formatted words like "w3x7" DID
        # share shingles doc-to-doc and collapsed the whole corpus into
        # one LSH component — measured before this form)
        rng = np.random.default_rng((doc * 2 + salt) * 1_000_003 + seed)
        return [f"{v:012x}" for v in
                rng.integers(0, 1 << 48, size=count, dtype=np.int64)]

    def gen(batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        texts = []
        for i in ids:
            if i % mod == mod - 1 and i >= mod:
                # near-dup of a deterministic UNIFORMLY-CHOSEN earlier doc
                # (seeded rng, not modular arithmetic: (i·a+c) mod (i−r)
                # collapses to the constant a·r+c for all i, which made
                # every variant reference ONE base doc — a 200k-member
                # mega-clique that crossed the verify CLASS_CAP star
                # heuristic differently between full and probed runs);
                # ~10% of words perturbed → char-shingle Jaccard ≈ 0.8
                base = int(np.random.default_rng(seed * 31 + i)
                           .integers(0, i - i % mod))
                words = _words(base, words_per_doc)
                tail = max(1, words_per_doc // 10)
                words[-tail:] = _words(int(i), tail, salt=1)
            else:
                words = _words(int(i), words_per_doc)
            # ≥3 words/line + terminal '.' so C4 cleaning keeps the lines
            lines = [" ".join(words[k: k + 8]) + "."
                     for k in range(0, len(words), 8)]
            texts.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts, type=pa.string())})

    ds = ray.data.range(num_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy", batch_size=8192)
