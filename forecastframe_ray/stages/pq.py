"""Product quantization (Jégou, Douze, Schmid 2011 — public algorithm)
for the persisted ANN index: vectors compress to ``m`` uint8 codes
(64-dim float64 → 8 bytes, 64×), and search scores candidates by
ASYMMETRIC distance (one per-query lookup table per subspace, then pure
fancy-indexed adds) — the vector-column sibling of the Gorilla codec for
the time-series tiers.

Accuracy contract: PQ preserves COARSE similarity — the right cluster,
the right shortlist — not fine intra-cluster ranking (at 8 bytes the
quantization error exceeds a tight cluster's internal spread; measured:
cluster retrieval 1.0, exact-top-10 overlap ~0.15 on σ=0.05 clusters).
Production IVFADC+R re-ranks the ADC shortlist against stored vectors;
here the uncompressed index (``pq_m=None``, the default) IS the exact
path, and the PQ layout is the storage-bound alternative.

Determinism contract (the same one the coarse quantizer follows): the
codebooks train on an id-SORTED driver sample with a fixed seed, so a
persisted index's codes never depend on Ray block order.
"""

from __future__ import annotations

import numpy as np


def train_pq(X: np.ndarray, m: int = 8, k: int = 256, iters: int = 10,
             seed: int = 7) -> np.ndarray:
    """Per-subspace k-means codebooks over a (n, d) sample → (m, k', dsub)
    with ``k' = min(k, n)``. Distances run in the matmul form
    (argmin ‖s−c‖² = argmax s·c − ‖c‖²/2) — no (n, k, dsub) temporary."""
    n, d = X.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    kk = min(k, n)
    books = np.empty((m, kk, dsub), dtype=np.float64)
    for j in range(m):
        S = np.ascontiguousarray(X[:, j * dsub:(j + 1) * dsub])
        rng = np.random.default_rng(seed + 31 * j)
        C = S[rng.choice(n, size=kk, replace=False)].copy()
        for _ in range(iters):
            assign = (S @ C.T - 0.5 * (C * C).sum(1)[None, :]).argmax(1)
            for c in range(kk):
                mem = S[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books[j] = C
    return books


def pq_encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 codes (nearest codebook entry per subspace)."""
    m, _k, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        C = books[j]
        codes[:, j] = (S @ C.T
                       - 0.5 * (C * C).sum(1)[None, :]).argmax(1)
    return codes


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) codes → (n, d) reconstructed vectors."""
    m, _k, dsub = books.shape
    out = np.empty((len(codes), m * dsub), dtype=np.float64)
    for j in range(m):
        out[:, j * dsub:(j + 1) * dsub] = books[j][codes[:, j]]
    return out


def adc_scores(q: np.ndarray, codes: np.ndarray,
               books: np.ndarray) -> np.ndarray:
    """Asymmetric inner-product scores of one query against (n, m) codes:
    one (m, k) lookup table (q_sub · codebook entries), then m
    fancy-indexed adds per candidate — never reconstructing vectors."""
    m, _k, dsub = books.shape
    lut = np.stack([books[j] @ q[j * dsub:(j + 1) * dsub]
                    for j in range(m)])          # (m, k)
    s = lut[0][codes[:, 0]].copy()
    for j in range(1, m):
        s += lut[j][codes[:, j]]
    return s
