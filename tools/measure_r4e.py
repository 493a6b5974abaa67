"""Round-4 chip session E: scan unroll + clahe bins knobs.

Run: timeout 3600 python tools/measure_r4e.py
"""
import dataclasses
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
    from vins_tpu.io import synthetic
    from vins_tpu.pipeline import VinsSystem
    from vins_tpu.stream import precompute_block, run_vio_scan

    cfg = default_config()
    N = 48
    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("handshake done", flush=True)

    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=96, n_landmarks=300, seed=7,
        frame_dt=1.0 / 30.0, traj_kwargs=dict(w=0.35, bob=0.15),
        imu_per_frame=4)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=7, device=True)
    sys_ = VinsSystem(cfg, use_loop=False, ext=seq.ext)
    k = 0
    while k < 48 and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(imgs[k], chunk, t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized
    print(f"initialized at {k}", flush=True)
    imgs48 = jnp.asarray(imgs[k:k + N], jnp.float32)
    chunks48 = jax.tree.map(lambda x: x[k:k + N], seq.chunks)
    s0 = sys_._scan_state()

    for label, c, unroll in (
            ("base", cfg, 1),
            ("unroll=3", cfg, 3),
            ("bins=128", dataclasses.replace(
                cfg, frontend=dataclasses.replace(cfg.frontend,
                                                  clahe_bins=128)), 1),
            ("bins=128+unroll=3", dataclasses.replace(
                cfg, frontend=dataclasses.replace(cfg.frontend,
                                                  clahe_bins=128)), 3),
    ):
        fn = jax.jit(lambda s, im, ch, c=c, u=unroll: run_vio_scan(
            s, im, ch, c, sys_.ext, sys_.gravity, use_pnp=True, unroll=u))
        dt = timed(fn, s0, imgs48, chunks48)
        print(f"scan [{label:18s}] {dt / N * 1e3:8.3f} ms/frame",
              flush=True)

    for label, c in (("pre base", cfg),
                     ("pre bins=128", dataclasses.replace(
                         cfg, frontend=dataclasses.replace(
                             cfg.frontend, clahe_bins=128)))):
        pre = jax.jit(lambda im, c=c: precompute_block(im, c))
        dt = timed(pre, imgs48)
        print(f"{label:24s} {dt / N * 1e3:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
