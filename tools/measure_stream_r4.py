"""Round-4 on-chip measurement: new scan cost + double-buffered stream.

Measures (on the real TPU, one process):
  1. FUSED scan ms/frame (new: precomputed pyramids, pnp-solve gating)
  2. precompute_block ms/frame (batched CLAHE+pyramid+grads)
  3. process_stream fps at depth=1 vs depth=2 (overlap win quantified)

Run: timeout 3000 python tools/measure_stream_r4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vins_tpu import default_config
    from vins_tpu.io import synthetic
    from vins_tpu.pipeline import VinsSystem
    from vins_tpu.stream import precompute_block, run_vio_scan

    cfg = default_config()
    N = 48
    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("handshake done", flush=True)

    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=480 + 48, n_landmarks=300, seed=7,
        frame_dt=1.0 / 30.0, traj_kwargs=dict(w=0.35, bob=0.15),
        imu_per_frame=4)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=7, device=True)
    print("sequence staged", flush=True)

    sys_ = VinsSystem(cfg, use_loop=True, ext=seq.ext)
    k = 0
    while k < 48 and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(imgs[k], chunk, t=float(seq.timestamps[k]))
        k += 1
    print(f"initialized at {k}: {sys_.initialized}", flush=True)
    assert sys_.initialized

    imgs48 = jnp.asarray(imgs[k:k + N], jnp.float32)
    chunks48 = jax.tree.map(lambda x: x[k:k + N], seq.chunks)

    # --- 1. precompute alone ---
    pre = jax.jit(lambda im: precompute_block(im, cfg))
    out = pre(imgs48)
    jax.block_until_ready(out[0][0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = pre(imgs48)
    jax.block_until_ready(out[0][0])
    dt = (time.perf_counter() - t0) / 3
    print(f"precompute_block {dt / N * 1e3:8.3f} ms/frame", flush=True)

    # --- 2. fused scan ---
    scan_fn = jax.jit(lambda s, im, ch: run_vio_scan(
        s, im, ch, cfg, sys_.ext, sys_.gravity, use_pnp=True))
    s0 = sys_._scan_state()
    _, o = scan_fn(s0, imgs48, chunks48)
    jax.block_until_ready(o.p)
    t0 = time.perf_counter()
    for _ in range(3):
        _, o = scan_fn(s0, imgs48, chunks48)
    jax.block_until_ready(o.p)
    dt = (time.perf_counter() - t0) / 3
    print(f"FUSED scan (new) {dt / N * 1e3:8.3f} ms/frame", flush=True)

    # --- 3. stream fps depth 1 vs 2 ---
    n_meas = 480 - 2 * N
    imgs_dev = jnp.asarray(imgs[k:k + 480])
    chunks_dev = jax.tree.map(lambda x: x[k:k + 480], seq.chunks)
    for depth in (1, 2):
        s2 = VinsSystem(cfg, use_loop=True, ext=seq.ext)
        # clone initialized state
        s2.initialized = True
        s2.est = sys_.est
        s2.pnp = sys_.pnp
        s2.tracker.state = sys_.tracker.state
        s2.tracker.started = True
        s2.frame_idx = sys_.frame_idx
        s2._scan_jit = sys_._scan_jit
        warm = s2.process_stream(
            imgs_dev[:2 * N],
            jax.tree.map(lambda x: x[:2 * N], chunks_dev), block=N,
            depth=depth)
        s2.loop.warm()
        meas_imgs = imgs_dev[2 * N:]
        meas_chunks = jax.tree.map(lambda x: x[2 * N:], chunks_dev)
        z = jnp.asarray(0, jnp.int32)
        jax.block_until_ready(s2._slice_block(meas_imgs, z, N))
        jax.tree.map(
            lambda x: jax.block_until_ready(s2._slice_block(x, z, N)),
            meas_chunks)
        s2.timings = {}
        t0 = time.perf_counter()
        outs = s2.process_stream(meas_imgs, meas_chunks, block=N,
                                 depth=depth)
        dt = time.perf_counter() - t0
        assert len(outs) == n_meas and all(o.initialized for o in outs)
        nb = max(s2.timings.get("blocks", 0), 1)
        budget = {kk: round(1e3 * v / nb, 1)
                  for kk, v in s2.timings.items() if kk != "blocks"}
        print(f"depth={depth}: {n_meas / dt:7.1f} fps  "
              f"({dt / n_meas * 1e3:.2f} ms/frame)  budget={budget}",
              flush=True)


if __name__ == "__main__":
    main()
