"""Round-4 chip session C: scan stage re-split + backend internals +
block-size/depth sweep.

Run: timeout 3600 python tools/measure_r4c.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from vins_tpu import default_config
    from vins_tpu.core import pnp as pnp_mod
    from vins_tpu.frontend import tracker as tr_mod
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
    assert sys_.initialized
    print(f"initialized at {k}", flush=True)

    imgs48 = jnp.asarray(imgs[k:k + N], jnp.float32)
    chunks48 = jax.tree.map(lambda x: x[k:k + N], seq.chunks)

    # --- scan stage split: track_step_pre only (scanned) ---
    pyrs, grads = jax.jit(lambda im: precompute_block(im, cfg))(imgs48)
    jax.block_until_ready(pyrs[0])

    ts0 = sys_.tracker.state

    def track_only(c0):
        def body(s, xs):
            pyr, grad = xs
            s2, _ = tr_mod.track_step_pre(s, pyr, grad, cfg,
                                          do_topup=True)
            return s2, None
        return jax.lax.scan(body, c0, (pyrs, grads))
    dt = timed(jax.jit(track_only), ts0)
    print(f"track_step_pre (topup=all)  {dt / N * 1e3:8.3f} ms/frame",
          flush=True)

    def track_gated(c0):
        def body(s, xs):
            pyr, grad, i = xs
            s2, _ = tr_mod.track_step_pre(s, pyr, grad, cfg,
                                          do_topup=(i % 3 == 0))
            return s2, None
        return jax.lax.scan(body, c0, (pyrs, grads, jnp.arange(N)))
    dt = timed(jax.jit(track_gated), ts0)
    print(f"track_step_pre (topup=1/3)  {dt / N * 1e3:8.3f} ms/frame",
          flush=True)

    # --- pnp advance only (deadreckon) ---
    M = cfg.window.max_landmarks
    obs_l = jnp.zeros((M, 2), jnp.float32)
    has_l = jnp.ones((M,), bool)

    def pnp_dead(c0):
        def body(w, ch):
            w2, _ = pnp_mod.pnp_step(w, ch, obs_l, has_l, cfg, sys_.ext,
                                     sys_.gravity, do_solve=False)
            return w2, None
        return jax.lax.scan(body, c0, chunks48)
    dt = timed(jax.jit(pnp_dead), sys_.pnp)
    print(f"pnp advance (deadreckon)    {dt / N * 1e3:8.3f} ms/frame",
          flush=True)

    # --- backend internals ---
    import bench as bench_mod
    from vins_tpu.core import feature_manager as fm
    from vins_tpu.core import marginalization as marg_mod
    from vins_tpu.core.estimator import run_sequence_scan

    est, inputs, ext, gravity = bench_mod.build_backend_inputs(cfg, N)
    g = jax.jit(lambda e, i: run_sequence_scan(e, i, cfg, ext, gravity))
    dt = timed(g, est, inputs)
    print(f"backend_step (per be-frame) {dt / N * 1e3:8.3f} ms/frame",
          flush=True)

    # Solver share: rerun the backend scan with a reduced LM iteration
    # cap / budget — the delta isolates per-iteration solve cost.
    import dataclasses

    cfg3 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iters=3))
    g3 = jax.jit(lambda e, i: run_sequence_scan(e, i, cfg3, ext, gravity))
    dt = timed(g3, est, inputs)
    print(f"backend_step (max_iters=3)  {dt / N * 1e3:8.3f} ms/frame",
          flush=True)
    cfg5 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iters=5))
    g5 = jax.jit(lambda e, i: run_sequence_scan(e, i, cfg5, ext, gravity))
    dt = timed(g5, est, inputs)
    print(f"backend_step (max_iters=5)  {dt / N * 1e3:8.3f} ms/frame",
          flush=True)

    # --- full stream: block/depth sweep ---
    imgs_dev = jnp.asarray(imgs[k:k + 480])
    chunks_dev = jax.tree.map(lambda x: x[k:k + 480], seq.chunks)
    for block, depth in ((48, 2), (48, 3), (72, 2), (96, 2)):
        s2 = VinsSystem(cfg, use_loop=True, ext=seq.ext)
        s2.initialized = True
        s2.est = sys_.est
        s2.pnp = sys_.pnp
        s2.tracker.state = sys_.tracker.state
        s2.tracker.started = True
        s2.frame_idx = sys_.frame_idx
        warm_n = 2 * block
        warm = s2.process_stream(
            imgs_dev[:warm_n],
            jax.tree.map(lambda x: x[:warm_n], chunks_dev), block=block,
            depth=depth)
        s2.loop.warm()
        meas_imgs = imgs_dev[warm_n:]
        meas_chunks = jax.tree.map(lambda x: x[warm_n:], chunks_dev)
        z = jnp.asarray(0, jnp.int32)
        jax.block_until_ready(s2._slice_block(meas_imgs, z, block))
        jax.tree.map(
            lambda x: jax.block_until_ready(s2._slice_block(x, z, block)),
            meas_chunks)
        n_meas = (480 - warm_n) // block * block
        meas_imgs = meas_imgs[:n_meas]
        meas_chunks = jax.tree.map(lambda x: x[:n_meas], meas_chunks)
        s2.timings = {}
        t0 = time.perf_counter()
        outs = s2.process_stream(meas_imgs, meas_chunks, block=block,
                                 depth=depth)
        dt = time.perf_counter() - t0
        assert len(outs) == n_meas and all(o.initialized for o in outs)
        nb = max(s2.timings.get("blocks", 0), 1)
        budget = {kk: round(1e3 * v / nb, 1)
                  for kk, v in s2.timings.items() if kk != "blocks"}
        print(f"block={block} depth={depth}: {n_meas / dt:7.1f} fps  "
              f"budget={budget}", flush=True)


if __name__ == "__main__":
    main()
