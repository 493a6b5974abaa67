"""Streaming (block-scan) capability parity with the interactive path.

VERDICT r2 item 2: the throughput path must be the COMPLETE system —
loop-factor injection into the window solves (VINS.cpp:571-637), refined
pose-graph edges read off the solved window (VINS.cpp:663-680), published
point clouds (VINS.cpp:307-331), and failure recovery that keeps
consuming the stream (VINS.cpp:463-467) — not a degraded fallback.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import render_cached
from vins_tpu.config import VinsConfig
from vins_tpu.io import evaluate
from vins_tpu.pipeline import VinsSystem

CFG = VinsConfig()


@pytest.fixture(scope="module")
def seq_pack():
    """Same sequence parameters as test_pipeline's (shared disk cache)."""
    return render_cached(CFG, n_frames=110, seed=13, frame_dt=1.0 / 30.0,
                         traj_kwargs=dict(w=0.35, bob=0.15),
                         imu_per_frame=4)


def _boot(sys_, seq, imgs, k_max=60, until_backend_after=45):
    """Interactive frames until initialized and aligned on a backend
    frame past the warmup region; returns the next frame index."""
    k = 0
    while k < k_max and not (sys_.initialized and (k % CFG.freq) == 0
                             and k > until_backend_after):
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                           t=float(seq.timestamps[k]))
        k += 1
    assert sys_.initialized
    return k


@pytest.mark.slow
def test_stream_loop_injection_refines_edge(seq_pack):
    """Block-mode version of test_pipeline_loop_injection_refines_edge:
    a staged loop constraint rides the scan (ScanState.loop), each
    backend solve refines it jointly with a free loop pose, the refined
    edge lands in the pose graph, and retirement (tracked INSIDE the
    scan) triggers the 4-DoF optimization between blocks."""
    from vins_tpu.core.estimator import LoopInput, landmark_world_points
    from vins_tpu.loop.keyframe_db import _add_row
    from vins_tpu.utils import lie

    seq, imgs = seq_pack
    sys_ = VinsSystem(CFG, use_loop=True, ext=seq.ext)
    k = _boot(sys_, seq, imgs)

    F = CFG.window.num_frames

    # Stage a drift-free loop (old pose == the loop frame's own VIO pose)
    # exactly as the interactive test does: the refined edge must come
    # out ~identity, nowhere near the sentinel.
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
    # Host mirrors for the refined-edge re-point (both rows at the same
    # drift-free place).
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

    # Stream the rest in blocks; the staged loop is consumed by the
    # first dispatch and its lifecycle runs inside the scan.
    n_frames = 110
    outs = sys_.process_stream(
        jnp.asarray(imgs[k:n_frames]),
        jax.tree.map(lambda x: x[k:n_frames], seq.chunks),
        block=12, ts=seq.timestamps[k:n_frames])
    assert len(outs) == n_frames - k
    assert all(o.initialized for o in outs)
    # Every published artifact is finite (VERDICT r3 item 3: empty
    # landmark slots used to overflow the fp16 cloud cast to inf).
    for o in outs:
        assert np.all(np.isfinite(o.p)) and np.all(np.isfinite(o.q))
        if o.point_cloud is not None:
            assert np.all(np.isfinite(o.point_cloud))

    # The edge was refined by a window solve, not left at the sentinel,
    # and re-pointed at the keyframe nearest the readout: it must match
    # the raw-odometry relative pose old -> that keyframe.
    lt = np.asarray(sys_.loop.graph.loop_t[0])
    assert not np.allclose(lt, 9.0), "loop edge never refined in-stream"
    e_j = int(np.asarray(sys_.loop.graph.loop_j[0]))
    p_j = sys_.loop._kf_p_np[e_j]
    yaw_j = float(sys_.loop._kf_yaw_np[e_j])
    c, s = np.cos(yaw_old), np.sin(yaw_old)
    RzT = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    exp_t = RzT @ (p_j - old_p)
    assert np.linalg.norm(lt - exp_t) < 0.3, (lt, exp_t)
    dy = float(sys_.loop.graph.loop_yaw[0]) - (yaw_j - yaw_old)
    assert abs(np.arctan2(np.sin(dy), np.cos(dy))) < 0.1
    # Retirement ran the pose graph between blocks and cleared the
    # pending record; a consistent loop keeps drift near identity.
    assert sys_._pending_loop is None
    assert np.linalg.norm(sys_.loop.t_drift) < 0.5

    # Block outputs publish the drift-corrected sparse map on backend
    # frames (VINS.cpp:307-331 parity — the r2 streaming path didn't).
    pc_frames = [o for o in outs if o.point_cloud is not None]
    assert pc_frames, "no point clouds published in block mode"
    best = max(int(np.sum(o.point_valid)) for o in pc_frames)
    assert best >= 10, f"point clouds empty ({best} valid)"


@pytest.mark.slow
def test_stream_failure_recovery_continuity(seq_pack):
    """Block-mode version of test_failure_recovery_continuity: garbage
    IMU mid-block must flag the failure frame, re-enter INITIAL, and
    REPROCESS the tail of the stream (one output per input frame —
    VINS.cpp:463-467 keeps consuming; the r2 streaming path truncated)."""
    seq, imgs = seq_pack
    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    k = _boot(sys_, seq, imgs)

    n_frames = 110
    n_in = n_frames - k
    # Poison one IMU chunk a few frames into the second block.
    fail_k = 12 + 5
    chunks = jax.tree.map(lambda x: x[k:n_frames], seq.chunks)
    chunks = chunks._replace(
        gyr=chunks.gyr.at[fail_k].set(jnp.full_like(chunks.gyr[fail_k],
                                                    40.0)))
    last_good_idx = k + fail_k - 1

    outs = sys_.process_stream(jnp.asarray(imgs[k:n_frames]), chunks,
                               block=12, ts=seq.timestamps[k:n_frames])
    # One output per input frame — the stream is never truncated.
    assert len(outs) == n_in, (len(outs), n_in)

    statuses = [o.status for o in outs]
    assert "FAILURE" in statuses, "failure never flagged"
    f_at = statuses.index("FAILURE")
    assert abs(f_at - fail_k) <= CFG.freq, (f_at, fail_k)

    post = [o for o in outs[f_at + 1:] if o.initialized]
    assert post, "system never re-initialized after in-block failure"
    # Continuity: recovery re-anchors near the last good pose. The
    # platform keeps MOVING during the re-init window (~1 s), so the
    # gate is the ground-truth displacement over the outage plus an
    # anchoring tolerance — not an absolute radius.
    rec_idx = next(i for i in range(f_at + 1, len(outs))
                   if outs[i].initialized)
    gt_disp = float(np.linalg.norm(
        np.asarray(seq.p[k + rec_idx]) - np.asarray(seq.p[k + f_at - 1])))
    last_good_p = outs[f_at - 1].p
    first_rec = post[0].p
    jump = np.linalg.norm(first_rec - last_good_p)
    assert jump < gt_disp + 0.8, (jump, gt_disp)
    assert np.linalg.norm(first_rec) > 0.5, "teleported to origin"
    # And the recovered tail keeps tracking (finite, moving).
    assert all(np.all(np.isfinite(o.p)) for o in post)


@pytest.mark.slow
def test_stream_bootstrap_in_stream(seq_pack):
    """process_stream on an UNinitialized system must bootstrap inside
    the stream (interactive frames until init, blocks after) and still
    return one output per input frame with a sane trajectory."""
    seq, imgs = seq_pack
    n_frames = 90
    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    outs = sys_.process_stream(jnp.asarray(imgs[:n_frames]),
                               jax.tree.map(lambda x: x[:n_frames],
                                            seq.chunks),
                               block=24, ts=seq.timestamps[:n_frames])
    assert len(outs) == n_frames
    init_at = next((i for i, o in enumerate(outs) if o.initialized), None)
    assert init_at is not None and init_at <= 45
    est_p = np.stack([o.p for o in outs[init_at:]])
    gt_p = np.asarray(seq.p[init_at:n_frames])
    res = evaluate.ate_rmse(est_p, gt_p)
    assert res.rmse < 0.15, f"in-stream bootstrap ATE {res.rmse}"


@pytest.mark.slow
def test_stream_backpressure_degrades_solver_budget(seq_pack):
    """Real-time backpressure (the reference scales its solver cap
    60→40→30 ms with queue depth, VINS.cpp:646-653): when blocks fall
    behind the camera rate in realtime mode, the runtime LM iteration
    budget degrades gracefully toward the floor instead of the queue
    growing — and the stream still tracks. Offline replay (realtime
    False, the default) must NOT degrade."""
    seq, imgs = seq_pack
    sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
    k = _boot(sys_, seq, imgs)
    n_frames = 104
    full = CFG.solver.max_iters
    assert sys_.solver_budget == full

    # On a CPU test host every block takes far longer than its 30 Hz
    # real-time span, so the budget must fall.
    outs = sys_.process_stream(jnp.asarray(imgs[k:n_frames]),
                               jax.tree.map(lambda x: x[k:n_frames],
                                            seq.chunks),
                               block=12, ts=seq.timestamps[k:n_frames],
                               realtime=True)
    assert len(outs) == n_frames - k
    assert all(o.initialized for o in outs)
    assert sys_.solver_budget < full, "budget never degraded"
    assert sys_.solver_budget >= sys_._budget_floor
