"""Microbenchmark the fused-pyramid KLT kernel to locate its bottleneck.

Hypotheses for the ~1.4 ms/launch cost (the fused scan runs two of
these per frame — forward + backward):
  (a) scalar-core latency: 128 sequential grid programs, each a chain of
      while_loops whose trip counts gate patch reads;
  (b) vector work: the aligned (32,256) block reads + double rolls per
      bilinear patch;
  (c) launch/SMEM overhead per pallas_call.

Discriminates by sweeping feature count M (a, c scale with M), LK
iteration cap (a scales, c constant), and measuring an empty-iteration
variant. Run: timeout 3000 python tools/klt_microbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from vins_tpu import default_config
    from vins_tpu.ops import image as image_mod
    from vins_tpu.ops import klt_pallas as kp

    cfg = default_config()
    fe = cfg.frontend
    H, W = cfg.camera.height, cfg.camera.width

    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("handshake done", flush=True)

    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((H, W)), jnp.float32)
    img1 = jnp.roll(img0, (2, 3), (0, 1))
    pyr0 = list(image_mod.build_pyramid(img0, fe.pyramid_levels))
    pyr1 = list(image_mod.build_pyramid(img1, fe.pyramid_levels))
    grads = [image_mod.sobel_gradients(p) for p in pyr0]

    def run(M, iters, eps):
        pts = jnp.asarray(
            rng.uniform(30, min(H, W) - 30, (M, 2)), jnp.float32)
        valid = jnp.ones((M,), bool)
        f = jax.jit(lambda p: kp.track_pyramid_pallas(
            pyr0, grads, pyr1, p, valid, fe.klt_window, iters, eps))
        # n.b. shapes differ per M -> separate compiles; keep M list short
        dt = timed(f, pts)
        print(f"M={M:4d} iters={iters:2d} eps={eps:5.2f}: "
              f"{dt*1e3:7.3f} ms  ({dt*1e6/M:6.1f} us/feat)", flush=True)
        return dt

    for M in (32, 128):
        run(M, fe.klt_iters, fe.klt_eps)
    for iters in (1, 3, 10):
        run(128, iters, 0.0)          # fixed-iteration (no early exit)
    run(128, fe.klt_iters, 10.0)      # early-exit immediately (1 iter)


if __name__ == "__main__":
    main()
