"""End-to-end backend tests: sliding-window VIO with marginalization over a
long synthetic sequence stays glued to ground truth (SURVEY.md §7.2 stage 4
acceptance: marginalized window ≈ drift-free over N steps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.core.estimator import (BackendState, FrameInput, VinsEstimator,
                                     backend_step)
from vins_tpu.core.factors import Extrinsics
from vins_tpu.core.state import FeatureTable, WindowState
from vins_tpu.core import feature_manager as fm
from vins_tpu.io.synthetic import make_synthetic_sequence

CFG = VinsConfig()
F = CFG.window.num_frames
M = CFG.window.max_landmarks


def bootstrap_from_sequence(seq, est: VinsEstimator):
    """Fill frames 0..F-2 as ground truth, leaving slot F-1 post-slide-free
    (the backend step expects the newest slot to be overwritten by the
    incoming frame). Stands in for automatic initialization (stage 6).
    The first frame to stream is seq index F-1."""
    feats = FeatureTable.empty(F, M)
    for f in range(F - 1):
        feats = fm.ingest_frame(feats, jnp.asarray(f), seq.ids[f],
                                seq.obs[f], seq.obs_valid[f])
    dup = lambda x: jnp.concatenate([x[:F - 1], x[F - 2:F - 1]], axis=0)
    window = WindowState(
        p=dup(seq.p), q=dup(seq.q), v=dup(seq.v),
        ba=jnp.zeros((F, 3)), bg=jnp.zeros((F, 3)),
        inv_depth=jnp.zeros(M))
    window = fm.triangulate(window, feats, seq.ext, CFG)
    # Edges 0..W-2 connect frames 0..F-2; the last edge arrives with the
    # next frame's input.
    W = F - 1
    S = CFG.window.max_imu_per_edge
    chunks = jax.tree.map(
        lambda x: jnp.concatenate([x[1:F - 1], jnp.zeros_like(x[:1])], 0),
        seq.chunks)
    est.bootstrap(window, feats, chunks)


@pytest.mark.slow
def test_sliding_window_tracks_ground_truth():
    seq = make_synthetic_sequence(CFG, n_frames=40, n_landmarks=300, seed=2)
    est = VinsEstimator(CFG, seq.ext)
    bootstrap_from_sequence(seq, est)

    errs = []
    kf_flags = []
    for k in range(F - 1, 40):
        inp = FrameInput(
            chunk=jax.tree.map(lambda x: x[k], seq.chunks),
            ids=seq.ids[k], obs=seq.obs[k], obs_valid=seq.obs_valid[k])
        out = est.process_frame(inp)
        assert not bool(out.failure), f"failure at frame {k}"
        errs.append(np.linalg.norm(np.asarray(out.pose_p) - np.asarray(seq.p[k])))
        kf_flags.append(bool(out.is_keyframe))

    ate = float(np.sqrt(np.mean(np.square(errs))))
    # Noiseless observations: the marginalized sliding window should track
    # ground truth tightly over ~3 m of travel.
    assert ate < 0.02, (ate, errs[-5:])
    # The circle trajectory has steady parallax: most frames are keyframes.
    assert np.mean(kf_flags) > 0.5


@pytest.mark.slow
def test_nonkeyframe_path_exercised():
    """A near-stationary trajectory (tiny angular rate ⇒ sub-pixel
    parallax) must route frames through MARGIN_SECOND_NEW, including the
    merged-chunk compaction, and keep tracking."""
    seq = make_synthetic_sequence(
        CFG, n_frames=18, n_landmarks=300, seed=4,
        traj_kwargs=dict(w=0.02, bob=0.0))
    est = VinsEstimator(CFG, seq.ext)
    bootstrap_from_sequence(seq, est)

    saw_nonkf = False
    for k in range(F - 1, 18):
        inp = FrameInput(
            chunk=jax.tree.map(lambda x: x[k], seq.chunks),
            ids=seq.ids[k], obs=seq.obs[k], obs_valid=seq.obs_valid[k])
        out = est.process_frame(inp)
        assert not bool(out.failure)
        saw_nonkf |= not bool(out.is_keyframe)
        err = np.linalg.norm(np.asarray(out.pose_p) - np.asarray(seq.p[k]))
        assert err < 0.05, (k, err)
    assert saw_nonkf  # sub-pixel parallax must trigger the merge path


def test_failure_detection_on_garbage_imu():
    seq = make_synthetic_sequence(CFG, n_frames=16, n_landmarks=300, seed=5)
    est = VinsEstimator(CFG, seq.ext)
    bootstrap_from_sequence(seq, est)
    S = CFG.window.max_imu_per_edge
    crazy = pre_mod.ImuChunk(
        dt=jnp.zeros(S).at[1:].set(0.01),
        acc=jnp.full((S, 3), 300.0), gyr=jnp.full((S, 3), 50.0))
    k = F - 1
    inp = FrameInput(chunk=crazy, ids=seq.ids[k], obs=seq.obs[k],
                     obs_valid=seq.obs_valid[k])
    out = est.process_frame(inp)
    assert bool(out.failure)
    assert not est.initialized  # host resets to INITIAL, as the reference
