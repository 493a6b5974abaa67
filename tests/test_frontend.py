"""Front-end pipeline tests on ray-cast rendered imagery: KLT flows match
the exact scene geometry, and the full pixels → poses loop tracks the
ground-truth trajectory (SURVEY.md §7.2 stage 5 acceptance)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core.estimator import FrameInput, VinsEstimator
from vins_tpu.core.state import FeatureTable, WindowState
from vins_tpu.core import feature_manager as fm
from vins_tpu.frontend.tracker import FeatureTracker
from vins_tpu.io.synthetic import (ground_truth_correspondence,
                                   make_synthetic_sequence,
                                   render_sequence_images)

import dataclasses

# This file's fixture runs at 10 fps (frame_dt=0.1 — 3x the inter-frame
# motion of the 30 Hz product rate), so the LK pyramid needs an extra
# level to keep the coarse-to-fine capture range (~2^(L-1)·10 px) above
# the per-frame flow. The product default is 3 levels (reference parity;
# measured more accurate at 30 fps — see config.FrontendConfig).
CFG = VinsConfig()
CFG = dataclasses.replace(
    CFG, frontend=dataclasses.replace(CFG.frontend, pyramid_levels=4))
F = CFG.window.num_frames
M = CFG.window.max_landmarks


@pytest.fixture(scope="module")
def rendered():
    seq = make_synthetic_sequence(CFG, n_frames=26, n_landmarks=50, seed=9,
                                  traj_kwargs=dict(w=0.35, bob=0.15))
    imgs = render_sequence_images(seq, CFG, seed=9)
    return seq, imgs


@pytest.mark.slow
def test_tracker_flow_matches_geometry(rendered):
    seq, imgs = rendered
    tracker = FeatureTracker(CFG)
    out0 = tracker.process(jnp.asarray(imgs[0]))
    assert int(out0.n_tracked) >= 50
    pts0 = np.asarray(out0.pts_px)
    ids0 = np.asarray(out0.ids)
    v0 = np.asarray(out0.obs_valid)

    out1 = tracker.process(jnp.asarray(imgs[1]))
    ids1 = np.asarray(out1.ids)
    v1 = np.asarray(out1.obs_valid)
    common, ia, ib = np.intersect1d(ids0[v0], ids1[v1], return_indices=True)
    assert len(common) >= 40, len(common)

    # Exact expected correspondence from the renderer's geometry.
    pa = pts0[v0][ia]
    pb = np.asarray(out1.pts_px)[v1][ib]
    expect = ground_truth_correspondence(seq, CFG, pa, 0, 1)
    err = np.linalg.norm(pb - expect, axis=-1)
    assert np.median(err) < 0.8, np.median(err)
    assert (err < 2.5).mean() > 0.9


@pytest.mark.slow
def test_pixels_to_poses(rendered):
    """Full loop: rendered pixels -> KLT tracks -> backend solves."""
    seq, imgs = rendered
    tracker = FeatureTracker(CFG)
    est = VinsEstimator(CFG, seq.ext)

    feats = FeatureTable.empty(F, M)
    for f in range(F - 1):
        out = tracker.process(jnp.asarray(imgs[f]))
        feats = fm.ingest_frame(feats, jnp.asarray(f), out.ids, out.obs,
                                out.obs_valid)
    dup = lambda x: jnp.concatenate([x[:F - 1], x[F - 2:F - 1]], axis=0)
    window = WindowState(
        p=dup(seq.p), q=dup(seq.q), v=dup(seq.v),
        ba=jnp.zeros((F, 3)), bg=jnp.zeros((F, 3)), inv_depth=jnp.zeros(M))
    window = fm.triangulate(window, feats, seq.ext, CFG)
    chunks = jax.tree.map(
        lambda x: jnp.concatenate([x[1:F - 1], jnp.zeros_like(x[:1])], 0),
        seq.chunks)
    est.bootstrap(window, feats, chunks)

    errs = []
    for k in range(F - 1, 26):
        out = tracker.process(jnp.asarray(imgs[k]))
        inp = FrameInput(
            chunk=jax.tree.map(lambda x: x[k], seq.chunks),
            ids=out.ids, obs=out.obs, obs_valid=out.obs_valid)
        bout = est.process_frame(inp)
        assert not bool(bout.failure), f"failure at {k}"
        errs.append(np.linalg.norm(np.asarray(bout.pose_p)
                                   - np.asarray(seq.p[k])))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    # Real-pixel observations: centimeter-level tracking is the bar.
    assert ate < 0.25, (ate, errs)
