"""Native streaming runtime tests: C++ vs pure-Python parity, chunk
semantics, and preintegration integration."""
import numpy as np
import pytest

from vins_tpu.io.native_runtime import (NativeStreamSync, StreamSync,
                                        make_stream_sync)


def _feed(sync, t_end=1.0, accel_hz=100.0, gyro_hz=97.0, img_hz=10.0,
          seed=0):
    rng = np.random.default_rng(seed)
    t_a = np.arange(0.0, t_end, 1.0 / accel_hz)
    t_g = np.arange(0.0005, t_end, 1.0 / gyro_hz)
    t_i = np.arange(0.105, t_end - 0.05, 1.0 / img_hz)
    acc = np.stack([np.sin(3 * t_a), np.cos(2 * t_a), 9.8 + 0.1 * t_a], 1)
    gyr = np.stack([0.1 * t_g, np.cos(t_g), np.sin(t_g)], 1)
    events = ([("a", t, acc[i]) for i, t in enumerate(t_a)]
              + [("g", t, gyr[i]) for i, t in enumerate(t_g)]
              + [("i", t, None) for t in t_i])
    events.sort(key=lambda e: e[0 + 1])
    out = []
    img_id = 0
    for kind, t, v in events:
        if kind == "a":
            sync.push_accel(t, v)
        elif kind == "g":
            sync.push_gyro(t, v)
        else:
            sync.push_image(t, img_id)
            img_id += 1
        while True:
            r = sync.poll()
            if r is None:
                break
            out.append(r)
    return out


def _native_available():
    try:
        NativeStreamSync(8)
        return True
    except Exception:
        return False


def test_python_stream_sync_chunks_are_consistent():
    sync = StreamSync(max_per_edge=32)
    out = _feed(sync)
    assert len(out) >= 7
    ids = [o[0] for o in out]
    assert ids == sorted(ids)
    # Interior chunks: dt sums to the inter-image interval.
    for (i0, t0, _), (i1, t1, c1) in zip(out[:-1], out[1:]):
        np.testing.assert_allclose(c1.dt.sum(), t1 - t0, atol=1e-5)
        assert c1.dt[0] == 0.0  # seed row


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_matches_python():
    out_n = _feed(NativeStreamSync(max_per_edge=32), seed=1)
    out_p = _feed(StreamSync(max_per_edge=32), seed=1)
    assert len(out_n) == len(out_p)
    for (ia, ta, ca), (ib, tb, cb) in zip(out_n, out_p):
        assert ia == ib
        np.testing.assert_allclose(ta, tb, atol=1e-12)
        np.testing.assert_allclose(ca.dt, cb.dt, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ca.acc), np.asarray(cb.acc),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ca.gyr), np.asarray(cb.gyr),
                                   atol=1e-5)


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_overflow_conserves_dt():
    sync = NativeStreamSync(max_per_edge=6)  # force overflow (10 samples)
    sync2 = StreamSync(max_per_edge=6)
    for s in (sync, sync2):
        for k in range(120):
            t = k * 0.01
            s.push_accel(t, (0.0, 0.0, 9.8))
            s.push_gyro(t + 0.0001, (0.0, 0.0, 0.1))
        s.push_image(0.5, 0)
        s.push_image(0.8, 1)
        r0 = s.poll()
        r1 = s.poll()
        assert r0 is not None and r1 is not None
        np.testing.assert_allclose(r1[2].dt.sum(), 0.3, atol=1e-5)


def test_stream_chunks_feed_preintegration():
    """Chunks integrate to the expected closed form for constant motion."""
    import jax
    import jax.numpy as jnp

    from vins_tpu.config import ImuConfig
    from vins_tpu.core.preintegration import propagate

    sync = make_stream_sync(32)
    a_const = np.array([0.2, -0.1, 9.9])
    for k in range(200):
        t = k * 0.005
        sync.push_accel(t, a_const)
        sync.push_gyro(t + 1e-4, (0.0, 0.0, 0.0))
    for i, t in enumerate([0.3, 0.5, 0.7]):
        sync.push_image(t, i)
    chunks = []
    while True:
        r = sync.poll()
        if r is None:
            break
        chunks.append(r[2])
    assert len(chunks) == 3
    imu = ImuConfig()
    pre = propagate(jax.tree.map(jnp.asarray, chunks[1]),
                    jnp.zeros(3), jnp.zeros(3), imu)
    np.testing.assert_allclose(float(pre.sum_dt), 0.2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pre.dp), 0.5 * a_const * 0.2 ** 2,
                               rtol=2e-3, atol=1e-4)
