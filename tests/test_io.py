"""IO harness tests: evaluation metrics, record/replay, native loader."""
import os
import struct
import tempfile
import zlib

import numpy as np
import pytest

from vins_tpu.io import evaluate
from vins_tpu.io.replay import Recorder, load_checkpoint, save_checkpoint


def _write_gray_png(path, arr):
    H, W = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(H))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_ate_identity_and_alignment():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    # A rigidly transformed copy must align to ~zero error.
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est = gt @ R.T + np.array([1.0, -2.0, 0.5])
    res = evaluate.ate_rmse(est, gt)
    assert res.rmse < 1e-9
    # Scaled copy aligns with with_scale=True and reports the scale.
    res2 = evaluate.ate_rmse(2.0 * gt, gt, with_scale=True)
    assert res2.rmse < 1e-9
    assert abs(res2.s - 0.5) < 1e-9


def test_recorder_roundtrip(tmp_path):
    rec = Recorder()
    for k in range(5):
        rec.add(t=float(k), p=np.full(3, k, np.float32))
    path = str(tmp_path / "run.npz")
    rec.save(path)
    data = Recorder.load(path)
    assert data["p"].shape == (5, 3)
    np.testing.assert_allclose(data["t"], np.arange(5.0))


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from vins_tpu import default_config
    from vins_tpu.core.estimator import BackendState

    est = BackendState.fresh(default_config())
    path = str(tmp_path / "est.ckpt")
    save_checkpoint(path, est)
    est2 = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(est.window.q),
                               np.asarray(est2.window.q))


def test_python_png_decoder(tmp_path):
    from vins_tpu.io.euroc import _decode_png_gray8

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    _write_gray_png(path, arr)
    dec = _decode_png_gray8(path)
    np.testing.assert_allclose(dec, arr.astype(np.float32) / 255.0)


@pytest.mark.skipif(not os.path.exists("/usr/include/zlib.h"),
                    reason="no toolchain")
def test_native_png_decoder_and_prefetch(tmp_path):
    from vins_tpu.io.native_loader import (PrefetchingImageLoader,
                                           decode_png_native)

    rng = np.random.default_rng(2)
    paths = []
    arrs = []
    for k in range(6):
        arr = rng.integers(0, 256, (40, 56), dtype=np.uint8)
        p = str(tmp_path / f"{k}.png")
        _write_gray_png(p, arr)
        paths.append(p)
        arrs.append(arr)

    dec = decode_png_native(paths[0], 56, 40)
    np.testing.assert_allclose(dec, arrs[0].astype(np.float32) / 255.0)

    loader = PrefetchingImageLoader(paths, 56, 40, n_workers=3, queue_cap=2)
    got = list(loader)
    assert len(got) == 6
    for k in range(6):
        np.testing.assert_allclose(got[k], arrs[k].astype(np.float32) / 255.0)
    loader.close()
