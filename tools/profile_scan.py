"""Per-stage on-chip profile of the streaming scan (VERDICT r2 item 1a).

Times each pipeline stage as a scanned device program on the real TPU:
CLAHE+pyramid, KLT, F-RANSAC, corner top-up, full track_step, pnp_step,
backend_step, and the fused vio_scan block. Prints a ms/frame table.

Run: timeout 3000 python tools/profile_scan.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def main():
    from vins_tpu import default_config
    from vins_tpu.core import pnp as pnp_mod
    from vins_tpu.core import preintegration as pre_mod
    from vins_tpu.core.estimator import run_sequence_scan
    from vins_tpu.frontend import tracker as tr_mod
    from vins_tpu.io import synthetic
    from vins_tpu.ops import corners as corners_mod
    from vins_tpu.ops import image as image_mod
    from vins_tpu.ops import klt as klt_mod
    from vins_tpu.ops import ransac as ransac_mod
    from vins_tpu.stream import run_vio_scan
    from vins_tpu.pipeline import VinsSystem

    cfg = default_config()
    fe = cfg.frontend
    N_SCAN = 48

    # Warm the transfer path (tunnel handshake).
    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    print("handshake done", flush=True)

    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=N_SCAN + 16, n_landmarks=300, seed=7,
        frame_dt=1.0 / 30.0, traj_kwargs=dict(w=0.35, bob=0.15),
        imu_per_frame=4)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=7, device=True)
    imgs = jnp.asarray(imgs[:N_SCAN], jnp.float32)
    chunks = jax.tree.map(lambda x: x[:N_SCAN], seq.chunks)
    print("sequence staged", flush=True)

    rows = []

    def scan_op(f, init, label, n=N_SCAN):
        """Time f applied n times in one scanned program."""
        def body(c, x):
            return f(c, x), None

        g = jax.jit(lambda c0: jax.lax.scan(body, c0, imgs[:n]))
        dt, _ = timed(g, init, label=label)
        rows.append((label, dt / n * 1e3))
        print(f"{label:28s} {dt / n * 1e3:8.3f} ms/frame", flush=True)

    # --- stage: CLAHE + pyramid ---
    def f_pyr(c, img):
        eq = image_mod.clahe(img, fe.clahe_clip, fe.clahe_grid)
        pyr = image_mod.build_pyramid(eq, fe.pyramid_levels)
        return c + pyr[0][0, 0] + pyr[-1][0, 0], None

    scan_op(lambda c, x: f_pyr(c, x)[0], jnp.zeros(()), "clahe+pyramid")

    # --- stage: full tracker step ---
    st0 = tr_mod.fresh_state(cfg, 0)
    st0, _ = jax.jit(lambda s, i: tr_mod.init_step(s, i, cfg))(st0, imgs[0])
    scan_op(lambda s, img: tr_mod.track_step(s, img, cfg)[0], st0,
            "track_step (full)")

    # --- stage: KLT only (fixed pyramids) ---
    eq = image_mod.clahe(imgs[0], fe.clahe_clip, fe.clahe_grid)
    pyr = tuple(image_mod.build_pyramid(eq, fe.pyramid_levels))
    eq1 = image_mod.clahe(imgs[1], fe.clahe_clip, fe.clahe_grid)
    pyr1 = tuple(image_mod.build_pyramid(eq1, fe.pyramid_levels))

    def f_klt(pts, _img):
        res = klt_mod.track_pyramid_fb(list(pyr), list(pyr1), pts,
                                       st0.valid, fe)
        return res.pts, None

    scan_op(lambda c, x: f_klt(c, x)[0], st0.pts, "klt_fb only")

    # --- stage: F-RANSAC only ---
    from vins_tpu.utils import camera as cam_mod
    prev_n = cam_mod.pixel_to_normalized(cfg.camera, st0.pts)
    thresh = (fe.f_ransac_thresh / cfg.camera.focal) ** 2

    def f_ransac(key, _img):
        key, sub = jax.random.split(key)
        rr = ransac_mod.ransac_fundamental(prev_n, prev_n, st0.valid, sub,
                                           fe.f_ransac_hyps, thresh)
        return key, None

    scan_op(lambda c, x: f_ransac(c, x)[0], jax.random.PRNGKey(0),
            "f-ransac only")

    # --- stage: top-up (occupancy + shi-tomasi + select) ---
    def f_topup(c, img):
        eqi = image_mod.clahe(img, fe.clahe_clip, fe.clahe_grid)
        occ = corners_mod.occupancy_cells(eqi.shape, st0.pts, st0.valid,
                                          fe.min_distance)
        resp = corners_mod.shi_tomasi_response(eqi)
        pick = corners_mod.select_corners_grid(resp, occ, fe.target_features,
                                               fe.min_distance)
        return c + pick.pts[0, 0], None

    scan_op(lambda c, x: f_topup(c, x)[0], jnp.zeros(()), "top-up stages")

    # --- stage: pnp_step ---
    sys_ = VinsSystem(cfg, use_loop=False, ext=seq.ext)
    M = cfg.window.max_landmarks
    obs_l = jnp.zeros((M, 2), jnp.float32)
    has_l = jnp.ones((M,), bool)
    chunk0 = jax.tree.map(lambda x: x[0], chunks)

    def f_pnp(win, _img):
        win2, _ = pnp_mod.pnp_step(win, chunk0, obs_l, has_l, cfg,
                                   sys_.ext, sys_.gravity)
        return win2, None

    scan_op(lambda c, x: f_pnp(c, x)[0], sys_.pnp, "pnp_step")

    # --- stage: backend_step (per backend frame; /freq for per-frame) ---
    import bench as bench_mod
    est, inputs, ext, gravity = bench_mod.build_backend_inputs(cfg, N_SCAN)
    g = jax.jit(lambda e, i: run_sequence_scan(e, i, cfg, ext, gravity))
    dt, _ = timed(g, est, inputs)
    rows.append(("backend_step (per be-frame)", dt / N_SCAN * 1e3))
    print(f"{'backend_step (per be-frame)':28s} {dt / N_SCAN * 1e3:8.3f} "
          f"ms/frame", flush=True)

    # --- stage: backend_step WITH an (inactive) loop block — what the
    # fused scan now runs every backend frame ---
    from vins_tpu.core.estimator import LoopInput, backend_step

    loop_in = LoopInput.inactive(cfg.window.max_landmarks)

    def f_loop(e, inp):
        e2, out = backend_step(e, inp._replace(loop=loop_in), cfg, ext,
                               gravity)
        e2 = jax.tree.map(lambda a, b: jnp.where(out.failure, a, b), e, e2)
        return e2, out

    g2 = jax.jit(lambda e, i: jax.lax.scan(f_loop, e, i))
    dt, _ = timed(g2, est, inputs)
    rows.append(("backend_step+loop (be-frame)", dt / N_SCAN * 1e3))
    print(f"{'backend_step+loop (be-frame)':28s} {dt / N_SCAN * 1e3:8.3f} "
          f"ms/frame", flush=True)

    # --- fused scan block ---
    k = 0
    while k < 16 and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(imgs[k], chunk, t=0.0)
        k += 1
    if not sys_.initialized:
        from vins_tpu.core.estimator import BackendState
        from vins_tpu.core import feature_manager as fm
        from vins_tpu.core.state import FeatureTable
        F = cfg.window.num_frames
        feats = FeatureTable.empty(F, cfg.window.max_landmarks)
        for f in range(F):
            feats = fm.ingest_frame(feats, jnp.asarray(f), seq.ids[f],
                                    seq.obs[f], seq.obs_valid[f])
        chunks_b = jax.tree.map(lambda x: x[1:F], seq.chunks)
        win = BackendState.fresh(cfg).window._replace(
            p=seq.p[:F], q=seq.q[:F], v=seq.v[:F])
        win = fm.triangulate(win, feats, seq.ext, cfg)
        sys_.est = BackendState.bootstrap(cfg, win, chunks_b and feats,
                                          chunks_b, seq.ext, seq.gravity) \
            if False else BackendState.bootstrap(
                cfg, win, feats, chunks_b, seq.ext, seq.gravity)
        sys_.initialized = True
        sys_.frame_idx = F

    scan_fn = jax.jit(lambda s, im, ch: run_vio_scan(
        s, im, ch, cfg, sys_.ext, sys_.gravity, use_pnp=True))
    s0 = sys_._scan_state()
    dt, _ = timed(scan_fn, s0, imgs, chunks)
    rows.append(("FUSED scan (all)", dt / N_SCAN * 1e3))
    print(f"{'FUSED scan (all)':28s} {dt / N_SCAN * 1e3:8.3f} ms/frame",
          flush=True)

    print("\n=== summary (ms/frame) ===")
    for label, ms in rows:
        print(f"{label:28s} {ms:8.3f}")


if __name__ == "__main__":
    main()
