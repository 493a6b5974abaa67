"""On-chip scaling measurements (VERDICT r2 item 5).

Measures, on the REAL v5e chip:
  1. t_compute(L): single-device `solve_ba` wall time at K=64 poses for
     several landmark counts (the per-shard compute term of SCALING.md's
     cost model — previously measured only on CPU at toy size);
  2. t_solve: the L-independent remainder (replicated Cholesky +
     dispatch), from the same sweep's extrapolation to L→0;
  3. the psum payload's device-local cost proxy: time to materialize +
     add the [6K,6K] reduced system (an upper bound on the on-chip part
     of the all-reduce; the wire term stays analytic — one chip).

Prints a markdown table to paste into SCALING.md.

Run: timeout 3000 python tools/measure_scaling_chip.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vins_tpu.io.synthetic import make_ba_problem
    from vins_tpu.parallel.dist_ba import solve_ba

    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("platform:", jax.devices()[0].platform, flush=True)

    K = 64
    ITERS = 6
    rows = []
    for L in (128, 256, 512, 1024, 2048):
        gt, init, prob = make_ba_problem(
            n_poses=K, n_landmarks=L, seed=1, pose_noise=0.05,
            point_noise=0.2)
        run = jax.jit(lambda s, p: solve_ba(s, p, iters=ITERS))
        st, cost, _ = run(init, prob)
        jax.block_until_ready(st.p)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            st, cost, _ = run(init, prob)
        jax.block_until_ready(st.p)
        dt = (time.perf_counter() - t0) / reps
        rows.append((L, dt))
        print(f"L={L:5d}  {dt*1e3:9.2f} ms/solve ({ITERS} iters)",
              flush=True)

    # Fit t(L) = a*L + b  (b = serial remainder per solve).
    Ls = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    A = np.stack([Ls, np.ones_like(Ls)], -1)
    (a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(f"\nlinear fit: t = {a*1e6:.3f} us/landmark * L + {b*1e3:.2f} ms")

    # Per-iteration psum payload proxy: add two [6K,6K] buffers.
    D = 6 * K
    x = jnp.ones((D, D), jnp.float32)
    y = jnp.ones((D, D), jnp.float32)
    add = jax.jit(lambda a_, b_: a_ + b_)
    jax.block_until_ready(add(x, y))
    t0 = time.perf_counter()
    for _ in range(100):
        x = add(x, y)
    jax.block_until_ready(x)
    t_add = (time.perf_counter() - t0) / 100
    payload_kb = 4 * (D * D + D) / 1024
    print(f"psum payload at K={K}: {payload_kb:.0f} KiB; on-chip add "
          f"proxy {t_add*1e6:.1f} us")

    # Projection to 2 shards/hosts from chip numbers.
    t1 = float(a * 2048 + b)
    t2 = float(a * 1024 + b)
    # analytic wire term (DCN 2 hosts ~25 GB/s, 2*(B-1)/B*payload/link):
    t_wire = payload_kb * 1024 / 25e9 * ITERS
    eff2 = t1 / (2 * (t2 + t_wire))
    print(f"\nprojection at L=2048, K={K}: t(1)= {t1*1e3:.2f} ms, "
          f"t(2 shards)= {t2*1e3:.2f} ms + wire {t_wire*1e6:.0f} us "
          f"=> eff(2) = {eff2:.3f}")

    print("\n| L (landmarks) | ms/solve (6 iters, v5e) |")
    print("|---|---|")
    for L, dt in rows:
        print(f"| {L} | {dt*1e3:.2f} |")


if __name__ == "__main__":
    main()
