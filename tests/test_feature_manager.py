"""Feature-table lifecycle tests: ingestion/slot allocation, triangulation
against ground truth, parallax keyframe test, window shifts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core import feature_manager as fm
from vins_tpu.core.state import FeatureTable, WindowState
from vins_tpu.io.synthetic import make_synthetic_window

CFG = VinsConfig()
F = CFG.window.num_frames
M = CFG.window.max_landmarks


def test_ingest_allocates_and_matches():
    feats = FeatureTable.empty(F, M)
    ids = jnp.arange(10, dtype=jnp.int32) + 100
    obs = jnp.ones((10, 2)) * 0.1
    ok = jnp.ones(10, bool)
    feats = fm.ingest_frame(feats, jnp.asarray(0), ids, obs, ok)
    assert int(jnp.sum(feats.track_id >= 0)) == 10
    assert not bool(jnp.any(feats.valid))  # single obs -> not yet valid

    # Same ids next frame -> matched to same slots, becomes valid.
    feats = fm.ingest_frame(feats, jnp.asarray(1), ids, obs + 0.01, ok)
    assert int(jnp.sum(feats.valid)) == 10
    assert int(jnp.sum(feats.track_id >= 0)) == 10
    # Anchors remain frame 0.
    live = np.asarray(feats.track_id) >= 0
    assert np.all(np.asarray(feats.anchor)[live] == 0)

    # New ids allocate fresh slots.
    ids2 = jnp.arange(5, dtype=jnp.int32) + 500
    feats = fm.ingest_frame(feats, jnp.asarray(1), ids2, obs[:5], ok[:5])
    assert int(jnp.sum(feats.track_id >= 0)) == 15


def test_ingest_overflow_drops_gracefully():
    feats = FeatureTable.empty(F, M)
    ids = jnp.arange(M + 40, dtype=jnp.int32)
    obs = jnp.zeros((M + 40, 2))
    ok = jnp.ones(M + 40, bool)
    feats = fm.ingest_frame(feats, jnp.asarray(0), ids, obs, ok)
    assert int(jnp.sum(feats.track_id >= 0)) == M  # capacity respected


def test_triangulate_recovers_depth():
    syn = make_synthetic_window(CFG, n_landmarks=60, seed=5)
    st0 = syn.state._replace(inv_depth=jnp.zeros(M))
    st = fm.triangulate(st0, syn.feats, syn.ext, CFG)
    valid = np.asarray(syn.feats.valid)
    got = np.asarray(st.inv_depth)[valid]
    want = np.asarray(syn.state.inv_depth)[valid]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)


def test_parallax_keyframe():
    syn = make_synthetic_window(CFG, n_landmarks=60, seed=5)
    is_kf, par = fm.keyframe_parallax(syn.feats, CFG, CFG.camera.focal)
    assert float(par) > 0
    # Duplicate the last frame's observations into F-3: zero parallax.
    feats2 = syn.feats._replace(
        obs=syn.feats.obs.at[F - 3].set(syn.feats.obs[F - 2]),
        mask=syn.feats.mask.at[F - 3].set(syn.feats.mask[F - 2]))
    is_kf2, par2 = fm.keyframe_parallax(feats2, CFG, CFG.camera.focal)
    assert float(par2) < 1e-5


def test_slide_old_reanchors_depth():
    syn = make_synthetic_window(CFG, n_landmarks=60, seed=7)
    feats2, inv2 = fm.slide_old(syn.state, syn.feats, syn.ext, CFG)
    # Features anchored at 0 and seen at 1 must re-anchor with the depth at
    # (old) frame 1's camera — recompute ground truth there.
    m_sel = np.flatnonzero(
        np.asarray(syn.feats.valid)
        & (np.asarray(syn.feats.anchor) == 0)
        & np.asarray(syn.feats.mask[1]))
    assert len(m_sel) > 5
    from vins_tpu.utils import lie
    R_wb = np.asarray(lie.quat_to_rotmat(syn.state.q))
    R_ic = np.asarray(lie.quat_to_rotmat(syn.ext.qic))
    for m in m_sel[:8]:
        lm = np.asarray(syn.landmarks)[m]
        R1 = R_wb[1] @ R_ic
        t1 = np.asarray(syn.state.p)[1] + R_wb[1] @ np.asarray(syn.ext.tic)
        z = (R1.T @ (lm - t1))[2]
        np.testing.assert_allclose(float(inv2[m]), 1.0 / z, rtol=2e-2)
    # Grid shifted: new frame f observations = old frame f+1.
    np.testing.assert_allclose(np.asarray(feats2.obs[0]),
                               np.asarray(syn.feats.obs[1]))
    assert not bool(jnp.any(feats2.mask[F - 1]))


def test_slide_new_merges_newest():
    syn = make_synthetic_window(CFG, n_landmarks=60, seed=7)
    feats2 = fm.slide_new(syn.feats)
    np.testing.assert_allclose(np.asarray(feats2.obs[F - 2]),
                               np.asarray(syn.feats.obs[F - 1]))
    assert not bool(jnp.any(feats2.mask[F - 1]))


def test_remove_failures():
    syn = make_synthetic_window(CFG, n_landmarks=60, seed=7)
    st = syn.state._replace(
        inv_depth=syn.state.inv_depth.at[3].set(-0.5))
    feats2 = fm.remove_failures(st, syn.feats)
    if bool(syn.feats.valid[3]):
        assert not bool(feats2.valid[3])
        assert int(feats2.track_id[3]) == -1
