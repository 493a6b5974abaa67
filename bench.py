"""End-to-end VIO throughput benchmark (driver-run, real TPU).

Measures full backend VIO frames/s — the sliding-window solve, feature
bookkeeping, preintegration repropagation, marginalization, and window
slide per frame (the reference's 10 Hz "solve_ceres + marginalization"
path, VINS_ios/VINS.cpp:480-830) — by replaying a synthetic sequence
through `run_sequence_scan` (one compiled program, host dispatch
amortized) and through data-parallel streams when >1 device is present.

Prints ONE JSON line:
  {"metric": "vio_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / 200.0}
Baseline: BASELINE.md north star >200 frames/s full VIO on one v5e chip.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_inputs(cfg, n_frames, seed=0):
    from vins_tpu.core.estimator import BackendState, FrameInput
    from vins_tpu.io import synthetic

    F = cfg.window.num_frames
    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=F + n_frames, n_landmarks=300, seed=seed,
        noise_px=0.5, frame_dt=0.1)

    # Bootstrap the window from ground truth (benchmarks the steady-state
    # NON_LINEAR path; init is a one-shot cost, not throughput).
    from vins_tpu.core import feature_manager as fm
    from vins_tpu.core.state import FeatureTable

    feats = FeatureTable.empty(F, cfg.window.max_landmarks)
    for f in range(F):
        feats = fm.ingest_frame(feats, jnp.asarray(f), seq.ids[f],
                                seq.obs[f], seq.obs_valid[f])
    chunks = jax.tree.map(lambda x: x[1:F], seq.chunks)
    win = BackendState.fresh(cfg).window._replace(
        p=seq.p[:F], q=seq.q[:F], v=seq.v[:F])
    win = fm.triangulate(win, feats, seq.ext, cfg)
    est = BackendState.bootstrap(cfg, win, feats, chunks, seq.ext,
                                 seq.gravity)

    inputs = FrameInput(
        chunk=jax.tree.map(lambda x: x[F:], seq.chunks),
        ids=seq.ids[F:], obs=seq.obs[F:], obs_valid=seq.obs_valid[F:])
    return est, inputs, seq.ext, seq.gravity


def main():
    from vins_tpu import default_config
    from vins_tpu.core.estimator import run_sequence_scan

    cfg = default_config()
    n_frames = 256
    est, inputs, ext, gravity = build_inputs(cfg, n_frames)

    run = jax.jit(lambda e, i: run_sequence_scan(e, i, cfg, ext, gravity))

    # Warmup/compile.
    e2, out = run(est, inputs)
    jax.block_until_ready(out.pose_p)

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        e2, out = run(est, inputs)
    jax.block_until_ready(out.pose_p)
    dt = (time.perf_counter() - t0) / n_rep

    fps = n_frames / dt

    # Data-parallel scale-up on one chip (stream batching) if it helps.
    n_dev = len(jax.devices())
    result = {
        "metric": "vio_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
