"""Real pure-stdlib image codec for the multimodal decode stage (round-5
verdict item: retire the ``real=True`` NotImplementedError stub). Pins
BMP/PPM round-trips (including the BMP 4-byte row-padding path), golden
pixel sums through the actual actor-pool ``map_batches`` stage, and the
undecodable-payload error contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from forecastframe_ray.pipelines import multimodal as M


def gradient(h: int, w: int) -> np.ndarray:
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    return ((x * 7 + y * 13 + c * 29) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(5, 8), (4, 3), (1, 1), (7, 5)])
def test_bmp_roundtrip(h, w):
    # w=3 and w=5 exercise nonzero BMP row padding (w*3 % 4 != 0)
    arr = gradient(h, w)
    np.testing.assert_array_equal(M.decode_bmp(M.encode_bmp(arr)), arr)


@pytest.mark.parametrize("h,w", [(5, 8), (3, 3)])
def test_ppm_roundtrip(h, w):
    arr = gradient(h, w)
    np.testing.assert_array_equal(M.decode_ppm(M.encode_ppm(arr)), arr)


def test_ppm_header_comments():
    arr = gradient(2, 2)
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + arr.tobytes()
    np.testing.assert_array_equal(M.decode_ppm(data), arr)


def test_real_decode_actor_pool_golden_sums():
    """The real=True path through the actual Ray actor-pool stage: decoded
    pixel sums and channel means must match the source arrays exactly."""
    arrs = [gradient(5, 8), gradient(4, 3), gradient(6, 6)]
    payloads = [M.encode_bmp(arrs[0]), M.encode_ppm(arrs[1]),
                M.encode_bmp(arrs[2])]
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "kind": pa.array(["image"] * 3),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        M.DecodeStage, fn_constructor_kwargs={"real": True, "feat_dim": 16},
        concurrency=(1, 2), batch_size=2, batch_format="pyarrow",
    ).to_pandas().sort_values("media_id").reset_index(drop=True)

    assert out["payload_bytes"].tolist() == [len(p) for p in payloads]
    for i, arr in enumerate(arrs):
        f = np.asarray(out["features"].iloc[i])
        assert (f[0], f[1], f[2]) == (arr.shape[1], arr.shape[0], 3)
        assert f[3] == float(arr.astype(np.float64).sum())  # golden sum
        np.testing.assert_allclose(f[4:7], arr.mean(axis=(0, 1)))
        assert (f[10], f[11]) == (arr.min(), arr.max())


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError, match="undecodable"):
        M.DecodeStage(real=True)._real_decode(b"\x00\x01\x02junk")
    with pytest.raises(ValueError, match="unsupported BMP"):
        # valid magic, 8-bit palette BMP → explicit unsupported error
        import struct
        hdr = struct.pack("<2sIHHI", b"BM", 1000, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 0, 0, 0, 0, 0)
        M.decode_bmp(hdr + dib + b"\x00" * 64)


def test_fake_decoder_contract_unchanged():
    """The SQL-oracled driver entries are pinned to the fake decoder —
    its output must not shift with the codec addition."""
    st = M.DecodeStage(real=False, feat_dim=4)
    f = st._fake_decode(b"payload")
    assert f.shape == (4,) and np.all((f >= 0) & (f < 1))
    np.testing.assert_array_equal(f, st._fake_decode(b"payload"))


def test_real_resize_actor_pool():
    """real=True resize: decode → nearest-neighbor resample → re-encode in
    the same container, through the actual actor pool; pixels pinned
    against an independent fancy-index twin."""
    arrs = [gradient(10, 7), gradient(3, 3), gradient(5, 12)]
    payloads = [M.encode_bmp(arrs[0]), M.encode_ppm(arrs[1]),
                M.encode_bmp(arrs[2])]
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.zeros(3, dtype=np.int32)),   # decode wins
        "height": pa.array(np.zeros(3, dtype=np.int32)),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        M.ResizeStage, fn_constructor_kwargs={"real": True, "max_side": 4},
        concurrency=(1, 2), batch_size=2, batch_format="pyarrow",
    ).to_pandas().sort_values("media_id").reset_index(drop=True)

    for i, arr in enumerate(arrs):
        h, w = arr.shape[:2]
        scale = min(1.0, 4 / max(h, w))
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        assert (out["width"].iloc[i], out["height"].iloc[i]) == (nw, nh)
        payload = out["payload"].iloc[i]
        dec = M.decode_bmp(payload) if payload[:2] == b"BM" \
            else M.decode_ppm(payload)
        # independent nearest-neighbor twin
        iy = np.minimum((np.arange(nh) + 0.5) * h / nh, h - 1).astype(int)
        ix = np.minimum((np.arange(nw) + 0.5) * w / nw, w - 1).astype(int)
        want = arr[iy][:, ix] if (nh, nw) != (h, w) else arr
        np.testing.assert_array_equal(dec, want)
