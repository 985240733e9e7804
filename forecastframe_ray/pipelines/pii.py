"""PII redaction for training-data pipelines: replace emails, IPv4 addresses
and international phone numbers with typed placeholder tokens, counting each.

Standard practice for public LLM corpora (e.g. the BigScience ROOTS and
Dolma data-curation writeups describe regex-based PII masking of exactly
these classes); no analog in the reference, which holds no text columns.

Scale shape: a stateless ``map_batches`` stage — one compiled-regex
``Series.str`` C pass per pattern, zero shuffles, embarrassingly parallel.
The patterns deliberately use only syntax with identical semantics in
Python ``re`` and RE2 (character classes, bounded repetition, ``\\b``; no
alternation, no lookaround) so a DuckDB ``regexp_replace`` oracle can pin
the output byte-for-byte.

Redaction order is fixed (email -> ipv4 -> phone) and each pass runs on the
previous pass's output; placeholder tokens contain no digits or ``@`` so
later passes never re-match earlier replacements.
"""

from __future__ import annotations

import re

import pandas as pd

#: (name, compiled pattern, replacement) in application order. Kept ASCII-only
#: (``[0-9]`` not ``\d``) because Python ``re`` is unicode-digit by default
#: while RE2 is ASCII — the oracle twin must match on any corpus.
PII_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("email",
     re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
     "<EMAIL>"),
    ("ip",
     re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
     "<IP>"),
    ("phone",
     re.compile(r"\+[0-9][0-9 ()-]{6,14}[0-9]"),
     "<PHONE>"),
]


def redact_pii_batch(batch: pd.DataFrame, text_col: str = "text",
                     out_col: str | None = None,
                     count: bool = True) -> pd.DataFrame:
    """Redact in place-order; optionally append ``n_emails`` / ``n_ips`` /
    ``n_phones`` match counts (counted on the text as each pass sees it)."""
    s = batch[text_col]
    for name, pat, repl in PII_PATTERNS:
        if count:
            batch[f"n_{name}s"] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    batch[out_col or f"{text_col}_redacted"] = s
    return batch


def redact_pii(ds, text_col: str = "text", out_col: str | None = None,
               count: bool = True):
    """Dataset form: stateless vectorized map, no shuffle."""
    return ds.map_batches(
        lambda b: redact_pii_batch(b, text_col, out_col, count),
        batch_format="pandas")
