"""Microbenchmark solve_pnp_window to locate its ~1.9 ms/frame cost.

Variants isolate: LM iteration count, the compacted perspective-factor
sweep (P), the 30-wide IMU jacfwd, and the dense 105x105 Cholesky solve.
Run (shares a chip session): timeout 3000 python tools/pnp_microbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=10):
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
    from vins_tpu.core import preintegration as pre_mod
    from vins_tpu.io import synthetic

    cfg = default_config()
    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("handshake done", flush=True)

    S = cfg.window.pnp_size + 1
    Mp = cfg.window.max_landmarks
    N = cfg.window.max_imu_per_edge
    rng = np.random.default_rng(0)

    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=S + 2, n_landmarks=300, seed=3, frame_dt=1.0 / 30.0,
        imu_per_frame=4)
    win = pnp_mod.PnpWindow(
        state=pnp_mod.PnpState(
            p=seq.p[:S], q=seq.q[:S], v=seq.v[:S],
            ba=jnp.zeros((S, 3)), bg=jnp.zeros((S, 3))),
        feats=pnp_mod.PnpFeatures(
            pts_w=jnp.asarray(rng.normal(0, 2, (Mp, 3)), jnp.float32),
            obs=jnp.asarray(rng.normal(0, 0.3, (S, Mp, 2)), jnp.float32),
            mask=jnp.asarray(rng.random((S, Mp)) < 0.4),
            weight=jnp.ones((Mp,), jnp.float32)),
        chunks=jax.tree.map(lambda x: x[:S - 1], seq.chunks),
        anchored=jnp.zeros((S,), bool).at[0].set(True),
        preints=None)
    win = win._replace(preints=pnp_mod.window_preints(win, cfg))
    ext, grav = seq.ext, seq.gravity

    def t(label, fn):
        f = jax.jit(fn)
        dt = timed(f, win)
        print(f"{label:32s} {dt*1e3:7.3f} ms", flush=True)

    for it in (0, 1, 3):
        t(f"solve iters={it}",
          lambda w, it=it: pnp_mod.solve_pnp_window(w, cfg, ext, grav,
                                                    iters=it)[1])

    # Pieces: one build() worth of IMU rows vs perspective rows, and the
    # 105x105 damped Cholesky solve, each as standalone scanned programs.
    D = 15 * S
    H = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
    H = H @ H.T + 10.0 * jnp.eye(D)
    g = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    def chol_solve(w):
        def body(c, _):
            L = jnp.linalg.cholesky(H + c * jnp.eye(D))
            return c + jax.scipy.linalg.cho_solve((L, True), g)[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=4)
        return c
    t("4x cholesky+solve 105", chol_solve)

    P = min(cfg.solver.pnp_max_factors, S * Mp)

    def persp_only(w):
        from vins_tpu.core.factors import perspective_residual
        from vins_tpu.utils import lie
        sel = jnp.arange(P) % Mp
        self_f = jnp.arange(P) % S

        def one(k):
            def local(d):
                pp, qq = lie.pose_retract(w.state.p[self_f[k]],
                                          w.state.q[self_f[k]], d)
                return perspective_residual(w.feats.pts_w[sel[k]],
                                            w.feats.obs[self_f[k], sel[k]],
                                            pp, qq, ext)
            z = jnp.zeros(6)
            return local(z), jax.jacfwd(local)(z)
        r, J = jax.vmap(one)(jnp.arange(P))
        return jnp.sum(r) + jnp.sum(J)
    t(f"persp sweep P={P} (1x)", persp_only)

    def imu_only(w):
        pre = w.preints
        S_all = jax.vmap(pre_mod.sqrt_information)(pre)

        def one(e):
            return pnp_mod._imu_local(jax.tree.map(lambda x: x[e], pre),
                                      w.state, e, grav, S_all[e])
        r, J = jax.vmap(one)(jnp.arange(S - 1))
        return jnp.sum(r) + jnp.sum(J)
    t("imu rows 6x jacfwd30 (1x)", imu_only)

    def topk_only(w):
        # Mirrors solve_pnp_window's compaction score exactly (newest
        # frame first, weight/free gating, w_act*2n - arange) so the
        # isolated top_k matches the real kernel's distribution.
        n = S * Mp
        fgrid = jnp.repeat(jnp.arange(S - 1, -1, -1, dtype=jnp.int32), Mp)
        mgrid = jnp.tile(jnp.arange(Mp, dtype=jnp.int32), S)
        free = (~w.anchored).astype(jnp.float32)
        w_act = (w.feats.mask[fgrid, mgrid]
                 & (w.feats.weight[mgrid] > 0)
                 & (free[fgrid] > 0)).astype(jnp.float32)
        score = w_act * (2.0 * n) - jnp.arange(n, dtype=jnp.float32)
        _, order = jax.lax.top_k(score, P)
        return jnp.sum(order)
    t("top_k select (1x)", topk_only)


if __name__ == "__main__":
    main()
