"""Scale-out layer tests on the virtual 8-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu import default_config
from vins_tpu.core.estimator import BackendState, FrameInput
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.io import synthetic
from vins_tpu.parallel import (BAProblem, BAState, make_batched_step,
                               make_mesh, solve_ba, solve_ba_sharded,
                               stack_inputs, stack_states)
from vins_tpu.parallel.mesh import batch_sharding, shard_leading
from vins_tpu.utils import lie


def tiny_config():
    cfg = default_config()
    return cfg.replace(
        window=cfg.window.__class__(window_size=4, max_imu_per_edge=8,
                                    max_landmarks=32),
        frontend=cfg.frontend.__class__(max_features=32, target_features=16),
    )


def test_mesh_construction():
    mesh = make_mesh(batch=4, block=2)
    assert mesh.shape == {"batch": 4, "block": 2}
    mesh = make_mesh(block=4)
    assert mesh.shape == {"batch": 2, "block": 4}


def test_dist_ba_matches_single_device():
    """Sharded BA must produce the same solution as the dense solver."""
    gt, init, prob = synthetic.make_ba_problem(
        n_poses=8, n_landmarks=64, seed=1, pose_noise=0.05, point_noise=0.2)
    st_1, cost_1, _ = jax.jit(lambda s, p: solve_ba(s, p, iters=8))(init, prob)

    mesh = make_mesh(batch=1, block=8)
    st_8, cost_8, _ = solve_ba_sharded(init, prob, mesh, iters=8)

    np.testing.assert_allclose(np.asarray(cost_8), np.asarray(cost_1),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_8.p), np.asarray(st_1.p),
                               rtol=1e-3, atol=1e-4)


def test_dist_ba_converges_to_ground_truth():
    gt, init, prob = synthetic.make_ba_problem(
        n_poses=8, n_landmarks=64, seed=2, pose_noise=0.05, point_noise=0.2)
    mesh = make_mesh(batch=1, block=8)
    st, cost, hist = solve_ba_sharded(init, prob, mesh, iters=12)
    ate = float(jnp.sqrt(jnp.mean(jnp.sum((st.p - gt.p) ** 2, -1))))
    assert ate < 1e-2, f"ATE {ate} too high, cost {cost}"
    assert float(cost) < 1e-6


def test_ba_pose_prior_anchors_metric_scale():
    """Mono BA's scale is observable only through the anchors: corrupt
    the frozen pose-0/1 baseline by 15% and the whole refined map
    re-scales with it. The pose-position prior (harvest sets it at the
    VIO estimates — IMU-metric on average) must pin the scale against
    all poses instead of the one short baseline."""
    import jax.numpy as jnp

    gt, init, prob = synthetic.make_ba_problem(
        n_poses=12, n_landmarks=128, seed=3, noise_px=0.3,
        pose_noise=0.02, point_noise=0.1)
    p = np.array(init.p)
    p[1] = p[0] + 1.15 * (np.asarray(gt.p[1]) - np.asarray(gt.p[0]))
    init = init._replace(p=jnp.asarray(p))

    st_no, _, _ = jax.jit(lambda s, pr: solve_ba(s, pr, iters=12))(
        init, prob)
    prob_pr = prob._replace(prior_p=init.p,
                            prior_w=jnp.asarray(0.1, jnp.float32))
    st_pr, _, _ = jax.jit(lambda s, pr: solve_ba(s, pr, iters=12))(
        init, prob_pr)

    def ate(st):
        return float(jnp.sqrt(jnp.mean(jnp.sum((st.p - gt.p) ** 2, -1))))

    e_no, e_pr = ate(st_no), ate(st_pr)
    assert e_pr < e_no * 0.7, (e_pr, e_no)
    assert e_pr < 0.08, e_pr


def test_batched_backend_step_runs_sharded():
    """B=8 independent windows, one per device, single jitted step."""
    cfg = tiny_config()
    B = 8
    wins = [synthetic.make_synthetic_window(cfg, n_landmarks=24, seed=s,
                                            noise_px=0.3)
            for s in range(2)]  # two distinct worlds, tiled
    ext, gravity = wins[0].ext, wins[0].gravity

    states, inputs = [], []
    for b in range(B):
        w = wins[b % 2]
        est = BackendState.bootstrap(cfg, w.state, w.feats, w.chunks,
                                     w.ext, w.gravity)
        states.append(est)
        F = cfg.window.num_frames
        inputs.append(FrameInput(
            chunk=jax.tree.map(lambda x: x[-1], w.chunks),
            ids=w.feats.track_id,
            obs=w.feats.obs[F - 1],
            obs_valid=w.feats.mask[F - 1] & w.feats.valid))

    mesh = make_mesh(batch=8, block=1)
    step = make_batched_step(cfg, ext, gravity, mesh)
    est_b = shard_leading(stack_states(states), batch_sharding(mesh))
    inp_b = shard_leading(stack_inputs(inputs), batch_sharding(mesh))

    est2, out = step(est_b, inp_b)
    assert out.pose_p.shape == (B, 3)
    assert bool(jnp.all(jnp.isfinite(out.pose_p)))
    # Streams with the same world must produce identical outputs.
    np.testing.assert_allclose(np.asarray(out.pose_p[0]),
                               np.asarray(out.pose_p[2]), rtol=1e-5)


def _fake_keyframe_db(n_kf=12, n_lms=80, seed=3, pose_noise=0.03,
                      point_noise=0.08):
    """Populate a LoopCloser's DB directly with a consistent synthetic
    map (bypassing image-based insertion): circle of body poses observing
    annulus landmarks, identity camera-IMU extrinsics, stored world
    points and poses perturbed like accumulated VIO drift."""
    from vins_tpu.loop.keyframe_db import LoopCloser, _add_row
    from vins_tpu.config import VinsConfig

    rng = np.random.default_rng(seed)
    cfg = VinsConfig()
    lc = LoopCloser(cfg, seed)   # identity extrinsics by default

    t = np.linspace(0.0, 2.2, n_kf)
    p_f, _, _, yaw_f, _ = synthetic._traj(t)
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    q_f = np.asarray(lie.so3_exp_quat(jnp.asarray(
        np.stack([np.zeros_like(yaw_f), np.zeros_like(yaw_f), yaw_f], -1),
        dtype=jnp.float32)))
    Rwb = np.asarray(lie.quat_to_rotmat(jnp.asarray(q_f)))
    R_wc = Rwb @ R_cam
    q_wc = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_wc)))

    ang = rng.uniform(0, 2 * np.pi, n_lms)
    rad = rng.uniform(5.0, 9.0, n_lms)
    h = rng.uniform(-1.5, 1.5, n_lms)
    lms = np.stack([rad * np.cos(ang), rad * np.sin(ang), h], -1)

    Nf = lc.Nf
    for k in range(n_kf):
        pc = (lms - p_f[k]) @ R_wc[k]
        z = pc[:, 2]
        ok = (z > 0.5) & (np.abs(pc[:, 0] / np.maximum(z, 1e-6)) < 0.8) \
            & (np.abs(pc[:, 1] / np.maximum(z, 1e-6)) < 0.8)
        xy = (pc[:, :2] / np.maximum(z[:, None], 1e-6)).astype(np.float32)
        kp = np.zeros((Nf, 2), np.float32)
        tid = np.full((Nf,), -1, np.int32)
        okr = np.zeros((Nf,), bool)
        ptsw = np.zeros((Nf, 3), np.float32)
        rows = np.flatnonzero(ok)[:Nf]
        kp[:len(rows)] = xy[rows]
        tid[:len(rows)] = rows
        okr[:len(rows)] = True
        ptsw[:len(rows)] = lms[rows] + rng.normal(size=(len(rows), 3)) \
            * point_noise
        p_noisy = p_f[k] + rng.normal(size=3) * pose_noise * (k >= 2)
        lc.db = _add_row(
            lc.db, jnp.asarray(k), jnp.asarray(p_noisy, jnp.float32),
            jnp.asarray(q_wc[k]), jnp.zeros(1024),
            jnp.zeros((Nf, 8), jnp.uint32), jnp.asarray(kp),
            jnp.zeros((Nf, 2)), jnp.asarray(ptsw), jnp.asarray(okr),
            jnp.asarray(okr), jnp.asarray(0, jnp.int32), jnp.asarray(tid))
    return lc, p_f


def test_harvest_builds_real_map_problem():
    """harvest_ba_problem over a populated keyframe DB: multi-keyframe
    tracks become landmark rows with consistent observations."""
    from vins_tpu.parallel import harvest_ba_problem

    lc, p_f = _fake_keyframe_db()
    res = harvest_ba_problem(lc.db, lc.tic, lc.qic)
    assert res is not None
    L, K = res.prob.mask.shape
    assert K == 12 and L >= 30
    # every harvested landmark is multi-view
    assert float(np.asarray(res.prob.mask).sum(1).min()) >= 2
    # observations at the stored poses reproject near the stored points
    # (same world), so initial cost is small but nonzero (injected noise).
    from vins_tpu.parallel.dist_ba import _ba_cost
    c0 = float(_ba_cost(res.state, res.prob, None))
    assert np.isfinite(c0) and c0 > 0


def test_global_ba_refines_real_map_sharded():
    """LoopCloser.global_ba: harvest → landmark-sharded psum BA over the
    8-device mesh → refined poses written back; cost drops and poses end
    closer to ground truth than the drifted input."""
    lc, p_gt = _fake_keyframe_db(pose_noise=0.05, point_noise=0.1)
    p_before = np.asarray(lc.db.p[:12]).copy()
    err_before = np.linalg.norm(p_before - p_gt, axis=1).mean()

    mesh = make_mesh(batch=1, block=8)
    cost = lc.global_ba(mesh=mesh, iters=8)
    assert cost is not None and np.isfinite(cost)
    p_after = np.asarray(lc.db.p[:12])
    err_after = np.linalg.norm(p_after - p_gt, axis=1).mean()
    # The production pose prior (harvest anchors every pose at its VIO
    # estimate to pin the mono-BA gauge/scale) deliberately limits how
    # far BA can move poses, so the gate is "meaningfully better", not
    # fully corrected — scale protection is tested separately
    # (test_ba_pose_prior_anchors_metric_scale).
    assert err_after < err_before * 0.85, (err_before, err_after)

    # Single-device path agrees.
    lc2, _ = _fake_keyframe_db(pose_noise=0.05, point_noise=0.1)
    cost2 = lc2.global_ba(mesh=None, iters=8)
    p_single = np.asarray(lc2.db.p[:12])
    np.testing.assert_allclose(p_after, p_single, atol=2e-3)


def test_scaling_report_runs():
    """Strong-scaling harness produces a monotone-block table."""
    from vins_tpu.parallel import scaling_report

    rows = scaling_report(blocks=(1, 2, 4), n_poses=8, n_landmarks=64,
                          iters=3, n_rep=1)
    assert [r["block"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert np.isfinite(r["final_cost"])
        assert r["psum_bytes_per_iter"] == 4 * ((6 * 8) ** 2 + 6 * 8)
