"""Multimodal (image/audio/video) column plumbing (session brief
"Multimodal columns"): opaque ``binary`` payload columns + typed metadata,
processed by actor-pool ``map_batches`` stages.

The actual media codecs are NOT in this container, so the decode step is
stubbed exactly as the brief directs: ``DecodeStage(real=True)`` raises
``NotImplementedError`` at the decode call site, while the default
deterministic fake decoder exercises every piece of real Ray plumbing —
actor-pool signature (stateful ``__init__`` / per-batch ``__call__``),
Arrow binary schema in/out, small-batch sizing for large payloads, and the
feature-extraction output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: media payload schema: opaque bytes + typed metadata (the 100 TB layout —
#: payloads stay binary end-to-end; metadata is columnar and prunable).
MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / n-a
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media corpus for tests/benches (no external data):
    payload bytes are a seeded function of (seed, id)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [
        hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        * int(rng.integers(8, 64))
        for i in range(n)
    ]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(rng.integers(16, 4096, size=n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 4096, size=n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(0, 600_000, size=n).astype(np.int32)),
    })


def media_from_documents(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Deterministic media table derived from the documents corpus: payload =
    the document's UTF-8 bytes, kind = id mod 3 — every metadata column is
    recomputable in SQL, which gives the decode pipeline a value oracle."""
    _KINDS = ("image", "audio", "video")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        payloads = [(t or "").encode("utf-8") for t in texts]
        # deterministic, SQL-recomputable dimensions (resize oracle)
        width = (16 + (ids * 7) % 4000).astype(np.int32)
        height = (16 + (ids * 13) % 3000).astype(np.int32)
        return pa.table({
            "media_id": pa.array(ids),
            "kind": pa.array([_KINDS[i % 3] for i in ids], type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * len(ids)),
            "width": pa.array(width),
            "height": pa.array(height),
            "duration_ms": pa.array(np.full(len(ids), -1, dtype=np.int32)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode + feature-extract stage.

    Use as ``ds.map_batches(DecodeStage, fn_constructor_kwargs={...},
    concurrency=(2, 8), batch_size=32, num_cpus=1, batch_format="pyarrow")``.
    Small ``batch_size`` is deliberate: batch bytes ≈ batch_size × payload —
    with multi-MB payloads a batch of 32 keeps (batch × concurrency) far under
    a worker heap.

    ``real=True`` marks where a real codec (PIL / libav / torchaudio) would
    load in ``__init__`` — unavailable in this container, so it raises.
    """

    def __init__(self, real: bool = False, feat_dim: int = 16):
        self.real = real
        self.feat_dim = feat_dim
        if real:
            # real path: import and initialize the codec ONCE per actor here.
            raise NotImplementedError(
                "media codecs (PIL/libav) are not available in this container; "
                "use the deterministic fake decoder (real=False)"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in for decode+embed: blake2b-seeded feature
        vector (counter-mode chunks — blake2b digests cap at 64 bytes).
        Same bytes → same features, across processes and runs."""
        need = self.feat_dim * 8
        chunks = []
        for ctr in range((need + 63) // 64):
            chunks.append(
                hashlib.blake2b(payload, digest_size=64, salt=ctr.to_bytes(8, "little")).digest()
            )
        h = b"".join(chunks)[:need]
        return np.frombuffer(h, dtype="<u8").astype(np.float64) / 2.0**64

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._fake_decode(p) for p in payloads])
        sizes = np.asarray([len(p) for p in payloads], dtype=np.int64)
        out = batch.drop_columns(["payload"])  # features replace raw bytes
        out = out.append_column("payload_bytes", pa.array(sizes))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float64()), self.feat_dim
            )
        )
        return out


class ResizeStage:
    """Actor-pool resize/frame-sample stage: rewrites payloads + metadata.
    The byte transform is a deterministic truncate-and-tag fake (same
    contract note as DecodeStage); the metadata math is real."""

    def __init__(self, max_side: int = 256, real: bool = False):
        if real:
            raise NotImplementedError("image resample codec unavailable; use real=False")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1.0))
        new_w = np.maximum(1, np.round(w * scale)).astype(np.int32)
        new_h = np.maximum(1, np.round(h * scale)).astype(np.int32)
        payloads = batch["payload"].to_pylist()
        shrunk = [
            p[: max(16, int(len(p) * s * s))] for p, s in zip(payloads, scale)
        ]
        cols = {name: batch[name] for name in batch.column_names}
        cols["width"] = pa.array(new_w)
        cols["height"] = pa.array(new_h)
        cols["payload"] = pa.array(shrunk, type=pa.binary())
        return pa.table(cols)


def decode_features(ds, concurrency=(1, 4), batch_size: int = 32, feat_dim: int = 16):
    """The canonical multimodal pipeline step: actor-pool decode with
    payload-aware batch sizing."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": False, "feat_dim": feat_dim},
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
        batch_format="pyarrow",
    )
