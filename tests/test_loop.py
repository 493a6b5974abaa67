"""Loop-closure stack tests: BRIEF, Hamming matching, pose graph, detector."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu import default_config
from vins_tpu.config import LoopConfig
from vins_tpu.io import synthetic
from vins_tpu.loop import LoopCloser, PoseGraph, drift_from_solution, \
    optimize_pose_graph
from vins_tpu.loop import keyframe_db
from vins_tpu.ops import brief as brief_mod
from vins_tpu.utils import lie


def test_hamming_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2 ** 32, (5, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (7, 8), dtype=np.uint32)
    d = np.asarray(brief_mod.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.zeros((5, 7), np.int32)
    for i in range(5):
        for j in range(7):
            ref[i, j] = bin(int.from_bytes(a[i].tobytes(), "little")
                            ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
    np.testing.assert_array_equal(d, ref)


def test_brief_matches_same_scene():
    """Descriptors of the same rendered scene from two nearby viewpoints
    must match at the ground-truth correspondences."""
    cfg = default_config()
    seq = synthetic.make_synthetic_sequence(cfg, n_frames=2, n_landmarks=50,
                                            seed=3, frame_dt=0.05)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=3)
    rng = np.random.default_rng(1)
    N = 64
    pts0 = rng.uniform(80, 380, (N, 2)).astype(np.float32)
    pts1 = synthetic.ground_truth_correspondence(seq, cfg, pts0, 0, 1)
    inb = ((pts1[:, 0] > 60) & (pts1[:, 0] < 420)
           & (pts1[:, 1] > 60) & (pts1[:, 1] < 580))
    ok = jnp.asarray(inb)

    d0 = brief_mod.extract_brief(jnp.asarray(imgs[0]), jnp.asarray(pts0), ok)
    d1 = brief_mod.extract_brief(jnp.asarray(imgs[1]), jnp.asarray(pts1), ok)
    m = brief_mod.match_descriptors(d0, d1, ok, ok, max_dist=60, ratio=0.9)
    # The correct correspondence is at the same index: count matches where
    # the best match IS index i.
    correct = np.asarray(m.ok & (m.idx == jnp.arange(N)))
    n_ok = int(np.asarray(ok).sum())
    assert correct.sum() >= 0.6 * n_ok, \
        f"only {correct.sum()}/{n_ok} correct BRIEF matches"


def test_pose_graph_removes_yaw_drift():
    """Circle trajectory with injected yaw drift; one loop edge back to the
    start must pull the end back to ground truth."""
    K, E = 64, 8
    n = 40
    t_gt = np.stack([3 * np.cos(np.linspace(0, 2 * np.pi, n)),
                     3 * np.sin(np.linspace(0, 2 * np.pi, n)),
                     np.zeros(n)], -1).astype(np.float32)
    yaw_gt = np.linspace(0, 2 * np.pi, n).astype(np.float32)
    # Drifted: yaw error grows linearly, corrupting integrated positions.
    drift_rate = 0.15
    yaw_d = yaw_gt + drift_rate * np.linspace(0, 1, n)
    t_d = t_gt.copy()
    for k in range(1, n):
        dy = yaw_d[k - 1] - yaw_gt[k - 1]
        R = np.array([[np.cos(dy), -np.sin(dy), 0],
                      [np.sin(dy), np.cos(dy), 0], [0, 0, 1]], np.float32)
        t_d[k] = t_d[k - 1] + R @ (t_gt[k] - t_gt[k - 1])

    g = PoseGraph.empty(K, E)
    g = g._replace(
        t=g.t.at[:n].set(jnp.asarray(t_d)),
        yaw=g.yaw.at[:n].set(jnp.asarray(yaw_d)),
        # Origin columns = the raw (drifted) odometry: sequential edges
        # are measured from these (keyfame_database.cpp:239 parity).
        t_origin=g.t_origin.at[:n].set(jnp.asarray(t_d)),
        yaw_origin=g.yaw_origin.at[:n].set(jnp.asarray(yaw_d)),
        node_ok=g.node_ok.at[:n].set(True))
    # Loop edge: node n-1 ↔ node 0 with the TRUE relative measurement.
    R0 = np.array([[np.cos(yaw_gt[0]), -np.sin(yaw_gt[0]), 0],
                   [np.sin(yaw_gt[0]), np.cos(yaw_gt[0]), 0],
                   [0, 0, 1]], np.float32)
    t_rel = R0.T @ (t_gt[n - 1] - t_gt[0])
    g = g._replace(
        loop_i=g.loop_i.at[0].set(0),
        loop_j=g.loop_j.at[0].set(n - 1),
        loop_t=g.loop_t.at[0].set(jnp.asarray(t_rel)),
        loop_yaw=g.loop_yaw.at[0].set(yaw_gt[n - 1] - yaw_gt[0]),
        loop_w=g.loop_w.at[0].set(1.0))

    g_before = g
    g_after, cost = optimize_pose_graph(g, jnp.asarray(0), iters=15)
    err_before = np.linalg.norm(t_d[n - 1] - t_gt[n - 1])
    err_after = float(jnp.linalg.norm(g_after.t[n - 1] - t_gt[n - 1]))
    assert err_after < 0.25 * err_before, (err_before, err_after)

    # Cumulative drift: optimized-vs-ORIGIN at the latest node; applying
    # it to the raw (origin) pose reproduces the optimized pose.
    R_d, t_dr = drift_from_solution(g_after, jnp.asarray(n - 1))
    p_corr = np.asarray(R_d) @ t_d[n - 1] + np.asarray(t_dr)
    np.testing.assert_allclose(p_corr, np.asarray(g_after.t[n - 1]),
                               atol=1e-4)

    # Idempotence: re-optimizing the SOLVED graph with the same edges
    # must not move the solution (sequential edges are measured from the
    # origin poses, so repeated runs don't re-measure their own output —
    # the wander that cost 0.7 m over 12 runs on the revisit fixture).
    g_again, _ = optimize_pose_graph(g_after, jnp.asarray(0), iters=15)
    move = float(jnp.max(jnp.linalg.norm(g_again.t[:n] - g_after.t[:n],
                                         axis=-1)))
    assert move < 5e-3, f"pose graph not idempotent: {move}"


@pytest.mark.slow
def test_loop_detection_on_revisit():
    """Render a circle that revisits its start; the detector must fire on
    the revisit and the relative pose must be near ground truth."""
    cfg = default_config().replace(loop=LoopConfig(
        max_keyframes=64, dislocal=6, min_loop_matches=15,
        max_kf_features=160, similarity_alpha=0.5, temporal_k=1))
    # One full circle in 16 keyframes; frames 16.. revisit the start poses.
    n = 20
    period = 2 * np.pi / 0.6  # w=0.6 in _traj
    dt = period / 16
    seq = synthetic.make_synthetic_sequence(cfg, n_frames=n, n_landmarks=50,
                                            seed=5, frame_dt=dt)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=5)

    lc = LoopCloser(cfg, ext=(seq.ext.tic, seq.ext.qic))
    Mw = 32
    hits = []
    for f in range(n):
        # Window features = Shi-Tomasi corners (as the real frontend
        # produces), with exact world points from the renderer geometry.
        from vins_tpu.ops import corners as corners_mod
        img_j = jnp.asarray(imgs[f])
        resp = corners_mod.shi_tomasi_response(img_j)
        pick = corners_mod.select_corners_grid(
            resp, jnp.zeros(img_j.shape, bool), Mw, 30)
        pts_px = pick.pts[:Mw]
        ok = pick.valid[:Mw]
        ptsw, ptsw_ok = _raycast_world(seq, cfg, np.asarray(pts_px), f)
        idx = lc.add_keyframe(jnp.asarray(imgs[f]), seq.p[f], seq.q[f],
                              pts_px, ok, jnp.asarray(ptsw),
                              jnp.asarray(ptsw_ok))
        hit = lc.detect(idx)
        if hit is not None:
            hits.append(hit)
    assert hits, "no loop detected on revisit"
    h = hits[0]
    assert h.cur_idx - h.old_idx >= 10  # a real revisit, not a neighbor
    # Drift-free world ⇒ measured relative pose ≈ relative ground truth.
    R_old = np.asarray(lie.quat_to_rotmat(seq.q[h.old_idx]))
    t_rel_gt = R_old.T @ np.asarray(seq.p[h.cur_idx] - seq.p[h.old_idx])
    np.testing.assert_allclose(h.t_rel, t_rel_gt, atol=0.15)


def _raycast_world(seq, cfg, pts_px, f, wall_radius=8.0, floor_z=-2.0,
                   ceil_z=2.0):
    """World points hit by pixel rays of frame f (renderer geometry)."""
    fx, fy, cx, cy = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx,
                      cfg.camera.cy)
    R_ic = np.asarray(lie.quat_to_rotmat(seq.ext.qic))
    t_ic = np.asarray(seq.ext.tic)
    Rwb = np.asarray(lie.quat_to_rotmat(seq.q[f]))
    o = np.asarray(seq.p[f]) + Rwb @ t_ic
    d_c = np.stack([(pts_px[:, 0] - cx) / fx, (pts_px[:, 1] - cy) / fy,
                    np.ones(len(pts_px), np.float32)], -1)
    d = d_c @ (Rwb @ R_ic).T
    a = d[:, 0] ** 2 + d[:, 1] ** 2
    b = 2 * (o[0] * d[:, 0] + o[1] * d[:, 1])
    c = o[0] ** 2 + o[1] ** 2 - wall_radius ** 2
    t_cyl = (-b + np.sqrt(np.maximum(b * b - 4 * a * c, 0))) / np.maximum(
        2 * a, 1e-9)
    dz = d[:, 2]
    t_flo = np.where(dz < -1e-6, (floor_z - o[2]) / np.where(
        np.abs(dz) < 1e-6, -1e-6, dz), np.inf)
    t_cei = np.where(dz > 1e-6, (ceil_z - o[2]) / np.where(
        np.abs(dz) < 1e-6, 1e-6, dz), np.inf)
    t_hit = np.minimum(np.minimum(t_cyl, t_flo), t_cei)
    X = o + d * t_hit[:, None]
    return X.astype(np.float32), np.isfinite(t_hit)


def test_keyframe_db_resample_compacts_and_protects():
    """When full, the DB decimates spatially-redundant keyframes
    (reference keyfame_database.cpp:44-76) while protecting loop-edge
    endpoints and the recent window, and remaps loop edges."""
    cfg = default_config().replace(loop=LoopConfig(
        max_keyframes=32, dislocal=4, max_kf_features=8))
    lc = LoopCloser(cfg)
    K = cfg.loop.max_keyframes
    Nf = cfg.loop.max_kf_features

    # Fill the DB directly (bypassing image feature extraction).
    rng = np.random.default_rng(0)
    for i in range(K):
        p = jnp.asarray([i * 0.05, 0.0, 0.0], jnp.float32)  # dense line
        lc.db = keyframe_db._add_row(
            lc.db, jnp.asarray(i), p, lie.quat_identity(),
            jnp.asarray(rng.normal(size=1024), jnp.float32),
            jnp.zeros((Nf, 8), jnp.uint32), jnp.zeros((Nf, 2), jnp.float32),
            jnp.zeros((Nf, 2), jnp.float32), jnp.zeros((Nf, 3), jnp.float32),
            jnp.zeros((Nf,), bool), jnp.zeros((Nf,), bool),
            jnp.asarray(0, jnp.int32), jnp.full((Nf,), -1, jnp.int32))
        lc.graph = lc.graph._replace(
            t=lc.graph.t.at[i].set(p),
            node_ok=lc.graph.node_ok.at[i].set(True))
    # One loop edge between 3 and 20.
    lc.graph = lc.graph._replace(
        loop_i=lc.graph.loop_i.at[0].set(3),
        loop_j=lc.graph.loop_j.at[0].set(20),
        loop_w=lc.graph.loop_w.at[0].set(1.0))
    lc.n_loops = 1

    p3 = np.asarray(lc.db.p[3]).copy()
    p20 = np.asarray(lc.db.p[20]).copy()
    lc.resample()
    m = int(lc.db.count)
    assert m < K and m >= K - K // 2  # freed some but kept most-protected
    # Loop endpoints survived at remapped indices with identical poses.
    li = int(lc.graph.loop_i[0])
    lj = int(lc.graph.loop_j[0])
    np.testing.assert_allclose(np.asarray(lc.db.p[li]), p3)
    np.testing.assert_allclose(np.asarray(lc.db.p[lj]), p20)
    # Insertion works again without raising.
    img = jnp.asarray(np.zeros((cfg.camera.height, cfg.camera.width),
                               np.float32))
    Mw = 4
    idx = lc.add_keyframe(
        img, jnp.zeros(3, jnp.float32), lie.quat_identity(),
        jnp.zeros((Mw, 2), jnp.float32), jnp.zeros((Mw,), bool),
        jnp.zeros((Mw, 3), jnp.float32), jnp.zeros((Mw,), bool))
    assert idx == m


def test_loop_edge_eviction_at_capacity():
    """VERDICT r2: the fixed loop-edge table must keep accepting
    constraints on long runs — overflow evicts the OLDEST edge (the
    reference has no cap: list + 500-kf resampling) and the host
    mirrors stay consistent."""
    from vins_tpu.loop.keyframe_db import LoopHit

    cfg = default_config()
    lc = LoopCloser(cfg)
    E = lc.graph.loop_w.shape[0]
    Nf = lc.Nf
    for e in range(E + 6):
        hit = LoopHit(
            old_idx=e, cur_idx=e + 100, n_inliers=30,
            t_rel=np.array([0.1 * e, 0, 0], np.float32), yaw_rel=0.01 * e,
            pts_w=np.zeros((Nf, 3), np.float32),
            obs_old=np.zeros((Nf, 2), np.float32),
            match_ok=np.zeros((Nf,), bool))
        lc._add_loop_edge(hit)
    assert lc.n_loops == E
    li = np.asarray(lc.graph.loop_i[:E])
    # Oldest 6 evicted; newest survives in the last slot.
    assert li[0] == 6 and li[-1] == E + 5
    assert lc._loop_i_host == list(range(6, E + 6))
    # update_loop_edge still addresses the surviving rows.
    lc.update_loop_edge(E - 1, np.array([9.0, 9.0, 9.0], np.float32), 0.5)
    np.testing.assert_allclose(np.asarray(lc.graph.loop_t[E - 1]),
                               [9.0, 9.0, 9.0])
    assert float(lc.graph.loop_w[E - 1]) == lc.W_REFINED
