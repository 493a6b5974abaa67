"""Motion-only (vinsPnP-equivalent) tracker tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu import default_config
from vins_tpu.config import WindowConfig
from vins_tpu.core import pnp as pnp_mod
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.io import synthetic
from vins_tpu.utils import lie


def small_cfg():
    cfg = default_config()
    return cfg.replace(window=WindowConfig(window_size=10, pnp_size=6,
                                           max_imu_per_edge=8))


def build_pnp_world(cfg, n_frames=20, seed=0, noise_px=0.0):
    """Ground-truth streaming world reusing the synthetic generator."""
    seq = synthetic.make_synthetic_sequence(
        cfg, n_frames=n_frames, n_landmarks=200, seed=seed,
        noise_px=noise_px, frame_dt=1.0 / 30.0)
    return seq


def test_pnp_tracks_ground_truth():
    """Seed the 7-frame window with ground truth, track the next frames at
    30 Hz; poses must stay within a few mm on noiseless data."""
    cfg = small_cfg()
    S = cfg.window.pnp_size + 1
    Mp = cfg.frontend.max_features
    seq = build_pnp_world(cfg, n_frames=S + 8)

    # Landmarks as the fixed map: world points in backend slot order =
    # landmark index (the synthetic seq uses ids == landmark index).
    # Build per-frame slot-aligned observations.
    L = seq.landmarks.shape[0]

    def slot_obs(f):
        obs = np.zeros((Mp, 2), np.float32)
        mask = np.zeros((Mp,), bool)
        ids = np.asarray(seq.ids[f])
        ob = np.asarray(seq.obs[f])
        ok = np.asarray(seq.obs_valid[f])
        for i in range(Mp):
            if ok[i] and 0 <= ids[i] < Mp:
                obs[ids[i] % Mp] = ob[i]
                mask[ids[i] % Mp] = True
        return jnp.asarray(obs), jnp.asarray(mask)

    pts_w = jnp.zeros((Mp, 3), jnp.float32).at[:min(Mp, L)].set(
        seq.landmarks[:min(Mp, L)])

    win = pnp_mod.PnpWindow(
        state=pnp_mod.PnpState.identity(S),
        feats=pnp_mod.PnpFeatures.empty(S, Mp)._replace(
            pts_w=pts_w, weight=jnp.ones((Mp,), jnp.float32)),
        chunks=jax.tree.map(lambda x: x[1:S], seq.chunks),
        anchored=jnp.zeros((S,), bool))

    # Fill window with ground truth states + observations.
    st = win.state._replace(p=seq.p[:S], q=seq.q[:S], v=seq.v[:S])
    obs_all, mask_all = [], []
    for f in range(S):
        o, m = slot_obs(f)
        obs_all.append(o)
        mask_all.append(m)
    win = win._replace(
        state=st,
        feats=win.feats._replace(obs=jnp.stack(obs_all),
                                 mask=jnp.stack(mask_all)),
        anchored=win.anchored.at[0].set(True))

    step = jax.jit(lambda w, c, o, m: pnp_mod.pnp_step(
        w, c, o, m, cfg, seq.ext, seq.gravity))

    errs = []
    for f in range(S, S + 8):
        chunk = jax.tree.map(lambda x: x[f], seq.chunks)
        o, m = slot_obs(f)
        win, (p, q, v) = step(win, chunk, o, m)
        errs.append(float(jnp.linalg.norm(p - seq.p[f])))
    assert max(errs) < 5e-3, f"pnp drift too high: {errs}"


def test_pnp_anchor_freezes_frame():
    cfg = small_cfg()
    S = cfg.window.pnp_size + 1
    Mp = 16
    win = pnp_mod.PnpWindow(
        state=pnp_mod.PnpState.identity(S),
        feats=pnp_mod.PnpFeatures.empty(S, Mp),
        chunks=jax.tree.map(
            lambda x: jnp.tile(x[None], (S - 1,) + (1,) * x.ndim),
            pre_mod.ImuChunk.empty(cfg.window.max_imu_per_edge)),
        anchored=jnp.zeros((S,), bool))
    p = jnp.array([1.0, 2.0, 3.0])
    q = lie.quat_normalize(jnp.array([0.9, 0.1, 0.0, 0.1]))
    v = jnp.array([0.1, 0.0, 0.0])
    win = pnp_mod.anchor_from_backend(win, jnp.asarray(S - 2), p, q, v,
                                      jnp.zeros(3), jnp.zeros(3))
    assert bool(win.anchored[S - 2])
    solved, cost = pnp_mod.solve_pnp_window(win, cfg,
                                            synthetic.make_synthetic_window(
                                                cfg, n_landmarks=4).ext,
                                            jnp.array([0.0, 0.0, 9.805]))
    np.testing.assert_allclose(np.asarray(solved.p[S - 2]), np.asarray(p),
                               atol=1e-6)
