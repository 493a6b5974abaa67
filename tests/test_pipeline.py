"""Full-system test: pixels + IMU in → initialized, tracked poses out.

Exercises the complete ViewController-equivalent flow (SURVEY.md §3):
frontend tracking, automatic visual-inertial initialization (no ground
truth given to the system), backend solves at `freq` cadence, and the
30 Hz motion-only poses in between.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core.factors import Extrinsics
from vins_tpu.io import evaluate
from vins_tpu.io.synthetic import make_synthetic_sequence, \
    render_sequence_images
from vins_tpu.pipeline import VinsSystem

CFG = VinsConfig()


@pytest.fixture(scope="module")
def seq_pack():
    """One shared 110-frame rendered sequence for every slow pipeline
    test (same seed/trajectory; tests slice what they need — rendering
    is cached ON DISK across test files and sessions, conftest
    render_cached)."""
    from conftest import render_cached

    return render_cached(CFG, n_frames=110, seed=13, frame_dt=1.0 / 30.0,
                         traj_kwargs=dict(w=0.35, bob=0.15),
                         imu_per_frame=4)



@pytest.fixture(scope="module")
def interactive_run(seq_pack):
    """One shared 100-frame fully-interactive run (deterministic): the
    tracking test slices it and the block/interactive parity test uses
    it as the uninterrupted twin."""
    seq, imgs = seq_pack
    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    outs = []
    for k in range(100):
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        outs.append(sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                                       t=float(seq.timestamps[k])))
    return outs


@pytest.mark.slow
def test_full_pipeline_initializes_and_tracks(seq_pack, interactive_run):
    n_frames = 70
    seq, _ = seq_pack
    outs = interactive_run[:n_frames]

    init_at = next((i for i, o in enumerate(outs) if o.initialized), None)
    assert init_at is not None, "system never initialized"
    assert init_at <= 45, f"initialization too late: frame {init_at}"

    # After init, estimated trajectory must track ground truth (the init
    # frame fixes the gauge; compare aligned).
    est_p = np.stack([o.p for o in outs[init_at:]])
    gt_p = np.asarray(seq.p[init_at:n_frames])
    res = evaluate.ate_rmse(est_p, gt_p)
    assert res.rmse < 0.15, f"pipeline ATE {res.rmse}"
    # Scale must be metric-ish. The post-init arc here is short (~1.4 m)
    # so the similarity fit's scale estimate is ill-conditioned (it soaks
    # up whatever curvature mismatch exists); 35% is the honest gate at
    # this excitation level — the ATE gate above is the binding one.
    res_s = evaluate.ate_rmse(est_p, gt_p, with_scale=True)
    assert abs(res_s.s - 1.0) < 0.35, f"metric scale off: {res_s.s}"


def test_reanchor_window_unit():
    """_reanchor_window_jit: frame 0 lands at the anchor with the anchor
    yaw; relative geometry (and roll/pitch) preserved."""
    from vins_tpu.io.synthetic import make_synthetic_window
    from vins_tpu.pipeline import _reanchor_window_jit
    from vins_tpu.utils import lie

    syn = make_synthetic_window(CFG, n_landmarks=40, seed=21)
    p_anchor = np.array([4.0, -2.0, 1.5], np.float32)
    yaw_anchor = 0.9
    w2 = _reanchor_window_jit(syn.state, jnp.asarray(p_anchor),
                              jnp.asarray(yaw_anchor, jnp.float32))
    np.testing.assert_allclose(np.asarray(w2.p[0]), p_anchor, atol=1e-5)
    ypr0 = np.asarray(lie.rotmat_to_ypr(lie.quat_to_rotmat(w2.q[0])))
    assert abs(float(ypr0[0]) - yaw_anchor) < 1e-5
    # Rigid: inter-frame distances preserved.
    d_before = np.linalg.norm(np.asarray(syn.state.p[5] - syn.state.p[0]))
    d_after = np.linalg.norm(np.asarray(w2.p[5] - w2.p[0]))
    assert abs(d_before - d_after) < 1e-5
    # Roll/pitch untouched (gravity-observable).
    ypr_b = np.asarray(lie.rotmat_to_ypr(lie.quat_to_rotmat(syn.state.q[5])))
    ypr_a = np.asarray(lie.rotmat_to_ypr(lie.quat_to_rotmat(w2.q[5])))
    np.testing.assert_allclose(ypr_a[1:], ypr_b[1:], atol=1e-5)


def test_fail_reset_keeps_trajectory_and_anchor():
    """Failure recovery must not discard the recorded trajectory and must
    remember the last good pose for re-anchoring (VINS.cpp:137-142)."""
    sys_ = VinsSystem(CFG, use_loop=False, use_pnp=False)
    sys_.trajectory = [np.zeros(3), np.ones(3)]
    sys_._last_good = (np.array([1.0, 2.0, 3.0], np.float32), 0.5)
    sys_._fail_reset()
    assert len(sys_.trajectory) == 2
    assert sys_._recover_anchor is not None
    np.testing.assert_allclose(sys_._recover_anchor[0], [1.0, 2.0, 3.0])
    assert not sys_.initialized


def test_drift_correct_points_unit():
    """Published point cloud must be drift-corrected like the pose
    (VINS.cpp:307-331)."""
    sys_ = VinsSystem(CFG, use_loop=True, use_pnp=False)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    sys_.loop.r_drift = R
    sys_.loop.t_drift = t
    pts = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    out = sys_._drift_correct_points(pts)
    np.testing.assert_allclose(out, pts @ R.T + t, rtol=1e-5)
    p1, _ = sys_._drift_correct(pts[0], np.array([1, 0, 0, 0], np.float32))
    np.testing.assert_allclose(out[0], p1, rtol=1e-5)


@pytest.mark.slow
def test_failure_recovery_continuity(seq_pack):
    """Inject garbage IMU mid-sequence: the system must detect failure,
    re-initialize, and continue the trajectory from the last good pose —
    no teleport to the origin (VINS.cpp:131-212, ViewController.mm:771-781)."""
    n_frames = 110
    seq, imgs = seq_pack

    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    outs = []
    fail_at = None
    last_good_p = None
    for k in range(n_frames):
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        if fail_at is None and k >= 45 and sys_.initialized \
                and (sys_.frame_idx % CFG.freq) == 0:
            # Garbage IMU chunk on a backend frame -> rotation-jump failure.
            chunk = chunk._replace(gyr=jnp.full_like(chunk.gyr, 40.0))
            fail_at = k
            last_good_p = outs[-1].p
        out = sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                                 t=float(seq.timestamps[k]))
        outs.append(out)

    assert fail_at is not None, "never initialized before injection point"
    post = [o for o in outs[fail_at + 1:] if o.initialized]
    assert post, "system never re-initialized after failure"
    # Continuity: the first recovered pose must continue from the last
    # good pose, not restart at the origin.
    first_rec = post[0].p
    assert np.linalg.norm(first_rec - last_good_p) < 1.0, \
        (first_rec, last_good_p)
    assert np.linalg.norm(first_rec) > 0.5, "teleported to origin"
    # Trajectory history survived the reset.
    assert len(sys_.trajectory) == n_frames


@pytest.mark.slow
def test_process_block_matches_interactive(seq_pack):
    """The fused streaming scan (stream.run_vio_scan via process_block)
    must produce the same-quality trajectory as the per-frame interactive
    path: same tracker, same solves, one device program per block."""
    n_frames = 70
    seq, imgs = seq_pack

    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    k = 0
    # INITIAL phase runs interactively (block mode is steady-state only).
    while k < n_frames and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                           t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized and k <= 45
    init_at = k - 1

    block_imgs = jnp.asarray(imgs[k:n_frames])
    block_chunks = jax.tree.map(lambda x: x[k:n_frames], seq.chunks)
    outs = sys_.process_block(block_imgs, block_chunks,
                              ts=seq.timestamps[k:n_frames])
    assert len(outs) == n_frames - k
    assert all(o.initialized for o in outs)
    assert any(o.is_keyframe for o in outs)

    est_p = np.stack([o.p for o in outs])
    gt_p = np.asarray(seq.p[k:n_frames])
    res = evaluate.ate_rmse(est_p, gt_p)
    assert res.rmse < 0.15, f"block-mode ATE {res.rmse}"


@pytest.mark.slow
def test_pipeline_loop_injection_refines_edge(seq_pack):
    """The pending-loop machinery end-to-end: a staged loop constraint is
    injected into subsequent window solves, the pose-graph edge is
    refined from the SOLVED window (not the detection-time value), and
    the pose graph runs when the loop frame retires (VINS.cpp:571-680,
    ViewController.mm:850-875)."""
    from vins_tpu.core.estimator import LoopInput
    from vins_tpu.core.estimator import landmark_world_points
    from vins_tpu.loop.keyframe_db import _add_row
    from vins_tpu.utils import lie

    n_frames = 110
    seq, imgs = seq_pack

    sys_ = VinsSystem(CFG, use_loop=True, ext=seq.ext)
    k = 0
    while k < 60 and not (sys_.initialized and (k % CFG.freq) == 0
                          and k > 45):
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                           t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized

    F = CFG.window.num_frames
    M = CFG.window.max_landmarks

    # Stage a loop: 'old keyframe' at the loop frame's own VIO pose (the
    # estimator's gauge, NOT seq ground truth — init re-anchors the world
    # at its boot frame), i.e. a drift-free revisit whose refined
    # constraint must come out ≈ identity.
    est = sys_.est
    old_p = np.asarray(est.window.p[F - 2])
    old_q = np.asarray(est.window.q[F - 2])
    pts_w = np.asarray(landmark_world_points(est.window, est.feats,
                                             sys_.ext))
    tid = np.asarray(est.feats.track_id)
    valid = np.asarray(est.feats.valid) & \
        (np.asarray(est.window.inv_depth) > 1e-3)
    Rwb = np.asarray(lie.quat_to_rotmat(jnp.asarray(old_q)))
    R_ic = np.asarray(lie.quat_to_rotmat(sys_.ext.qic))
    t_ic = np.asarray(sys_.ext.tic)
    pc = ((pts_w - old_p) @ Rwb - t_ic) @ R_ic
    z = pc[:, 2]
    vis = valid & (z > 0.3) & \
        (np.abs(pc[:, :2] / np.maximum(z[:, None], 1e-6)) < 0.9).all(1)
    obs_old = np.where(vis[:, None],
                       pc[:, :2] / np.maximum(z[:, None], 1e-6),
                       0.0).astype(np.float32)
    assert vis.sum() >= 15

    # Two DB rows + one sentinel-valued loop edge.
    Nf = sys_.loop.Nf
    zrow = dict(gdesc=jnp.zeros(1024), desc=jnp.zeros((Nf, 8), jnp.uint32),
                kp_norm=jnp.zeros((Nf, 2)), kp_px=jnp.zeros((Nf, 2)),
                pts_w=jnp.zeros((Nf, 3)), pts_ok=jnp.zeros(Nf, bool),
                kp_ok=jnp.zeros(Nf, bool))
    db = sys_.loop.db
    db = _add_row(db, jnp.asarray(0), jnp.asarray(old_p),
                  jnp.asarray(old_q), *zrow.values(),
                  jnp.asarray(0, jnp.int32), jnp.full((Nf,), -1, jnp.int32))
    db = _add_row(db, jnp.asarray(1), est.window.p[F - 2],
                  est.window.q[F - 2], *zrow.values(),
                  jnp.asarray(0, jnp.int32), jnp.full((Nf,), -1, jnp.int32))
    sys_.loop.db = db
    g = sys_.loop.graph
    sys_.loop.graph = g._replace(
        node_ok=g.node_ok.at[0].set(True).at[1].set(True),
        t=g.t.at[0].set(jnp.asarray(old_p)).at[1].set(est.window.p[F - 2]),
        t_origin=g.t_origin.at[0].set(jnp.asarray(old_p))
        .at[1].set(est.window.p[F - 2]),
        loop_i=g.loop_i.at[0].set(0), loop_j=g.loop_j.at[0].set(1),
        loop_t=g.loop_t.at[0].set(jnp.asarray([9.0, 9.0, 9.0])),
        loop_yaw=g.loop_yaw.at[0].set(9.0),
        loop_w=g.loop_w.at[0].set(1.0))
    sys_.loop.n_loops = 1
    sys_.loop._loop_i_host = [0]
    sys_.loop._loop_w_host = [1.0]
    sys_.loop._edge_abs_host = [0]
    sys_.loop._next_edge_abs = 1

    yaw_old = float(np.arctan2(
        *np.asarray(lie.quat_to_rotmat(jnp.asarray(old_q)))[[1, 0], 0]))
    # Host mirrors for the refined-edge re-point (edge j endpoint is the
    # newest keyframe; both rows sit at the same drift-free place).
    sys_.loop.count = 2
    sys_.loop._kf_p_np[0] = old_p
    sys_.loop._kf_p_np[1] = old_p
    sys_.loop._kf_yaw_np[0] = yaw_old
    sys_.loop._kf_yaw_np[1] = yaw_old
    sys_._pending_loop = {
        "edge_abs": 0, "old_idx": 0, "ttl": F,
        "dev": LoopInput(obs_old=jnp.asarray(obs_old),
                         ok=jnp.asarray(vis), ids=jnp.asarray(tid),
                         # drift-free staged loop: old pose == the loop
                         # frame's own pose, so init/readout use it
                         p_init=jnp.asarray(old_p),
                         q_init=jnp.asarray(old_q),
                         ttl=jnp.asarray(F, jnp.int32),
                         weight=jnp.asarray(1.0))}

    refined_seen = False
    while k < n_frames and sys_._pending_loop is not None:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        out = sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                                 t=float(seq.timestamps[k]))
        assert out.initialized
        lt = np.asarray(sys_.loop.graph.loop_t[0])
        if not np.allclose(lt, 9.0):
            refined_seen = True
        k += 1

    assert refined_seen, "loop edge never refined by the window solve"
    # Drift-free staged loop: the refined edge is re-pointed at the
    # newest keyframe j and must match the raw-odometry relative pose
    # old -> j (identity when j is still at the staged place).
    lt = np.asarray(sys_.loop.graph.loop_t[0])
    e_j = int(np.asarray(sys_.loop.graph.loop_j[0]))
    p_j = sys_.loop._kf_p_np[e_j]
    yaw_j = float(sys_.loop._kf_yaw_np[e_j])
    c, s = np.cos(yaw_old), np.sin(yaw_old)
    RzT = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    exp_t = RzT @ (p_j - old_p)
    assert np.linalg.norm(lt - exp_t) < 0.3, (lt, exp_t)
    dy = float(sys_.loop.graph.loop_yaw[0]) - (yaw_j - yaw_old)
    assert abs(np.arctan2(np.sin(dy), np.cos(dy))) < 0.1
    # Retirement ran the pose graph; with a consistent loop the drift
    # stays near identity.
    assert sys_._pending_loop is None
    assert np.linalg.norm(sys_.loop.t_drift) < 0.5


@pytest.mark.slow
def test_keyframe_trajectory_export_and_instream_ba(seq_pack):
    """VERDICT r3 items 8/9: (a) LoopCloser.trajectory() returns the
    pose-graph-corrected keyframe path — identical to the DB's corrected
    columns, one combined fetch; (b) the opt-in PERIODIC in-stream
    global BA (global_ba_every_kf) actually runs during process_stream,
    sharded over the visible (virtual 8-device) mesh, and keyframe
    poses stay finite afterwards."""
    seq, imgs = seq_pack
    sys_ = VinsSystem(CFG, use_loop=True, ext=seq.ext,
                      global_ba_every_kf=4)
    assert sys_._ba_mesh is not None, "virtual mesh not detected"
    k = 0
    while k < 60 and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                           t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized
    n_frames = 110
    outs = sys_.process_stream(jnp.asarray(imgs[k:n_frames]),
                               jax.tree.map(lambda x: x[k:n_frames],
                                            seq.chunks),
                               block=12, ts=seq.timestamps[k:n_frames])
    assert len(outs) == n_frames - k
    assert getattr(sys_, "ba_runs", 0) >= 1, \
        "periodic in-stream global BA never ran"

    lc = sys_.loop
    n = lc.count
    assert n >= 4
    t, p, q = lc.trajectory()
    assert t.shape == (n,) and p.shape == (n, 3) and q.shape == (n, 4)
    assert np.all(np.isfinite(p)) and np.all(np.isfinite(q))
    # Matches the corrected DB columns exactly (the consumer-facing
    # artifact is the same data the pose graph republishes,
    # keyfame_database.cpp:358).
    np.testing.assert_array_equal(p, np.asarray(lc.db.p[:n]))
    np.testing.assert_array_equal(q, np.asarray(lc.db.q[:n]))
    np.testing.assert_allclose(t, lc._kf_t_np[:n])
    # Timestamps are the capture stamps (monotone within a segment).
    assert np.all(np.diff(t) > 0)


@pytest.mark.slow
def test_block_to_interactive_rebuilds_pnp_preints(seq_pack,
                                                   interactive_run):
    """Mode switch after deadreckon block mode: the scan skips the pnp
    window's per-edge preintegration updates (pnp_step
    update_preints=False), so the carried preints go stale; the first
    interactive frame after a block must rebuild them (window_preints)
    and the 30 Hz motion-only solve must keep tracking.

    Seamlessness is asserted as PARITY against the uninterrupted
    interactive twin (same frames, same deterministic init, hence the
    same gauge): the reference has no mode boundary at all
    (vins_pnp.cpp:264-341), so (block + interactive tail) must publish
    the same trajectory. Raw comparison against absolute ground truth
    is NOT meaningful here — the VIO gauge (position + yaw of the first
    window frame) is unobservable, so only gauge-aligned ATE and
    twin-parity are asserted (the round-4 version of this test asserted
    the gauge and failed by ~1.5 m while actual twin parity was 2 cm)."""
    assert CFG.solver.pnp_stream_solve == "deadreckon"
    n_frames = 100
    seq, imgs = seq_pack

    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    k = 0
    while k < n_frames and not sys_.initialized:
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                           t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized
    # Identical deterministic prefix → identical gauge as the twin.
    init_at = next(i for i, o in enumerate(interactive_run)
                   if o.initialized)
    assert init_at == k - 1, "twin diverged during bootstrap"

    e = k + 36
    outs_blk = sys_.process_block(jnp.asarray(imgs[k:e]),
                                  jax.tree.map(lambda x: x[k:e],
                                               seq.chunks),
                                  ts=seq.timestamps[k:e])
    assert sys_._pnp_preints_stale, "deadreckon block did not mark preints"

    # Interactive tail: the rebuild must happen and the published 30 Hz
    # poses (pnp-solved on non-backend frames) must keep tracking.
    outs = []
    for j in range(e, n_frames):
        chunk = jax.tree.map(lambda x: x[j], seq.chunks)
        outs.append(sys_.process_frame(jnp.asarray(imgs[j]), chunk,
                                       t=float(seq.timestamps[j])))
    assert not sys_._pnp_preints_stale
    assert all(o.initialized for o in outs)

    # Parity vs the uninterrupted twin, same gauge (measured 7 mm mean
    # in-block, 19 mm post-switch; gate leaves margin for backend/
    # platform numerics, not for a real boundary bug).
    twin_p = np.stack([o.p for o in interactive_run[k:]])
    run_p = np.stack([o.p for o in outs_blk] + [o.p for o in outs])
    assert np.all(np.isfinite(run_p))
    d = np.linalg.norm(run_p - twin_p, axis=-1)
    assert float(d[:36].mean()) < 0.10, \
        f"block-mode parity broke: {d[:36].mean():.3f} m"
    assert float(d[36:].mean()) < 0.10, \
        f"post-switch parity broke: {d[36:].mean():.3f} m"
    # And the whole (block + tail) path must track ground truth after
    # gauge alignment (measured 0.082).
    res = evaluate.ate_rmse(run_p, np.asarray(seq.p[k:n_frames]))
    assert res.rmse < 0.12, f"block+tail ATE {res.rmse:.3f}"
