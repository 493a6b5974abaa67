"""Full-system long-run soak through process_stream (VERDICT r4 item 4).

One streaming run long enough that every capacity mechanism fires INSIDE
the pipeline, not in isolation: the keyframe DB hits its 512-row cap and
distance-resamples (keyfame_database.cpp:16,44-76), the 64-row loop-edge
table rolls (keyframe_db._add_loop_edge eviction), the 4-DoF pose graph
runs repeatedly, deferred detect/verify work crosses resamples (the
ADVICE r4 generation/UID window), and the end-state trajectory is still
metrically sane. The reference's operating envelope is minutes-long
sessions at the 500-keyframe cap; this is the streaming equivalent at a
reduced resolution so the CPU test host can afford it.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.io import evaluate
from vins_tpu.pipeline import VinsSystem


def soak_config() -> VinsConfig:
    """Half-resolution portrait profile: intrinsics and pixel-denominated
    thresholds scaled with the image so the geometry semantics match the
    full-size profile (same FoV, same angular parallax gate)."""
    base = VinsConfig()
    cam = dataclasses.replace(
        base.camera, width=240, height=320, fx=263.3, fy=263.3,
        cx=121.7, cy=157.6)
    fe = dataclasses.replace(base.frontend, min_distance=15)
    win = dataclasses.replace(base.window, min_parallax_px=5.0)
    lp = dataclasses.replace(base.loop, loop_freq=1)
    return dataclasses.replace(base, camera=cam, frontend=fe, window=win,
                               loop=lp)


@pytest.mark.slow
def test_streaming_soak_resample_edge_roll_and_pose_graph():
    from conftest import render_cached

    cfg = soak_config()
    n_frames = 2100  # 70 s @ 30 fps ≈ 7.8 laps of a 3 m circle
    seq, imgs = render_cached(cfg, n_frames=n_frames, seed=29,
                              frame_dt=1.0 / 30.0,
                              traj_kwargs=dict(w=0.7, bob=0.2),
                              imu_per_frame=4)

    sys_ = VinsSystem(cfg, use_loop=True, ext=seq.ext)
    outs = sys_.process_stream(jnp.asarray(imgs),
                               jax.tree.map(jnp.asarray, seq.chunks),
                               block=48, ts=seq.timestamps)

    # One output per input frame, bootstrap inside the stream.
    assert len(outs) == n_frames
    init_at = next((i for i, o in enumerate(outs) if o.initialized), None)
    assert init_at is not None and init_at <= 60
    n_fail = sum(1 for o in outs if o.status == "FAILURE")
    assert n_fail == 0, f"{n_fail} failures during soak"

    lc = sys_.loop
    # 600+ keyframes inserted in ONE run; the 512-row DB cap forced at
    # least one distance resample; count stays bounded.
    assert lc._next_uid >= 600, f"only {lc._next_uid} keyframes inserted"
    assert lc.generation >= 1, "DB resample never fired at the 512 cap"
    assert lc.count <= cfg.loop.max_keyframes
    # Loop closure stayed live across the whole session: repeated hits,
    # repeated pose-graph runs, and enough verified edges that the
    # 64-row edge table rolled (eviction path exercised in-stream).
    assert lc.n_loops + lc.n_edges_evicted >= 65, \
        f"edge table never rolled ({lc.n_loops} + {lc.n_edges_evicted})"
    assert lc.n_edges_evicted >= 1
    assert lc.n_optimizes >= 3, f"pose graph ran {lc.n_optimizes}x"
    # Host-side staging structures stay bounded (no leak over 2k frames).
    assert len(lc._loop_i_host) <= 64
    assert len(sys_._stage_queue) <= 4

    # End-state trajectory: finite everywhere, and loop closure STRICTLY
    # improves the published path over raw VIO. At this deliberately
    # hostile half-resolution config, raw VIO accrues real drift over
    # 7.8 laps (~147 m path; measured raw ATE 2.21 m = 1.5% of path) —
    # the soak's job is proving the capacity mechanisms keep working and
    # keep HELPING at the reference's minutes-long operating envelope,
    # not frontend accuracy (gated by the full-res e2e tests).
    est_p = np.stack([o.p for o in outs[init_at:]])
    raw_p = np.stack([o.p_raw for o in outs[init_at:]])
    assert np.all(np.isfinite(est_p))
    gt_p = np.asarray(seq.p[init_at:n_frames])
    res = evaluate.ate_rmse(est_p, gt_p)
    res_raw = evaluate.ate_rmse(raw_p, gt_p)
    assert res_raw.rmse >= 1.0, \
        f"raw drift vanished ({res_raw.rmse:.3f}) — gates below vacuous"
    assert res.rmse <= 0.85 * res_raw.rmse, \
        f"loop closure didn't help: {res.rmse:.3f} vs raw {res_raw.rmse:.3f}"
    assert res.rmse < 2.0, f"soak ATE {res.rmse:.3f}"
    # Drift estimate finite and bounded (it legitimately reaches meters
    # here — it's the correction magnitude, not an error).
    assert np.all(np.isfinite(lc.t_drift))
    assert float(np.linalg.norm(lc.t_drift)) < 15.0
