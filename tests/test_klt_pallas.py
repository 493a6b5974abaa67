"""Parity tests for the Pallas KLT kernels (interpret mode on CPU).

The real-TPU path is exercised by the driver/bench; here the kernels run
under `pltpu.force_tpu_interpret_mode()` against the pure-XLA reference
implementation in ops/klt.py, which the CPU test suite already validates
end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from vins_tpu.config import FrontendConfig
from vins_tpu.ops import image as image_mod
from vins_tpu.ops import klt as klt_mod
from vins_tpu.ops.klt_pallas import patch_ncc_pallas, track_level_pallas

CFG = FrontendConfig(klt_window=11, klt_iters=6, pyramid_levels=2)


def _smooth(img, n=3):
    for _ in range(n):
        img = image_mod.gaussian_blur(img, 1.5)
    return img


@pytest.fixture
def scene(rng):
    H, W = 96, 128
    base = rng.uniform(0, 1, (H + 8, W + 8)).astype(np.float32)
    base = np.asarray(_smooth(jnp.asarray(base)))
    img0 = jnp.asarray(base[4:H + 4, 4:W + 4])
    img1 = jnp.asarray(base[4:H + 4, 2:W + 2])   # 2 px shift in x
    pts = jnp.asarray(rng.uniform(16, 80, (16, 2)), jnp.float32)
    return img0, img1, pts


def test_track_level_pallas_matches_xla(scene):
    img0, img1, pts = scene
    gx, gy = image_mod.sobel_gradients(img0)
    valid = jnp.ones(pts.shape[0], bool)
    guess = jnp.zeros_like(pts)

    f_ref, ok_ref, e_ref = klt_mod._track_level(
        img0, gx, gy, img1, pts, guess, valid, CFG)
    with pltpu.force_tpu_interpret_mode():
        f_pal, ok_pal, e_pal = track_level_pallas(
            img0, gx, gy, img1, pts, guess, valid,
            CFG.klt_window, CFG.klt_iters)

    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               atol=1e-4)
    assert np.array_equal(np.asarray(ok_pal), np.asarray(ok_ref))
    np.testing.assert_allclose(np.asarray(e_pal), np.asarray(e_ref),
                               atol=1e-5)


def test_track_level_pallas_early_exit_close(scene):
    img0, img1, pts = scene
    gx, gy = image_mod.sobel_gradients(img0)
    valid = jnp.ones(pts.shape[0], bool)
    guess = jnp.zeros_like(pts)

    f_ref, _, _ = klt_mod._track_level(
        img0, gx, gy, img1, pts, guess, valid, CFG)
    with pltpu.force_tpu_interpret_mode():
        f_ee, ok_ee, _ = track_level_pallas(
            img0, gx, gy, img1, pts, guess, valid,
            CFG.klt_window, CFG.klt_iters, eps=0.01)
    # Early exit stops within eps of the fixed-iteration answer.
    np.testing.assert_allclose(np.asarray(f_ee), np.asarray(f_ref),
                               atol=0.05)


def test_patch_ncc_pallas_matches_xla(scene):
    img0, img1, pts = scene
    r = (CFG.klt_window - 1) / 2.0

    def ncc_one(pa, pb):
        ta = klt_mod._extract_patch(img0, pa - r, CFG.klt_window)
        tb = klt_mod._extract_patch(img1, pb - r, CFG.klt_window)
        ta = ta - jnp.mean(ta)
        tb = tb - jnp.mean(tb)
        return jnp.sum(ta * tb) * jax.lax.rsqrt(
            jnp.sum(ta * ta) * jnp.sum(tb * tb) + 1e-12)

    pts_b = pts + jnp.asarray([2.0, 0.0])
    ref = jax.vmap(ncc_one)(pts, pts_b)
    with pltpu.force_tpu_interpret_mode():
        pal = patch_ncc_pallas(img0, img1, pts, pts_b, CFG.klt_window)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-4)


def test_patch_parity_at_borders(rng):
    """Clamped border reads agree between kernel and XLA path."""
    H, W = 64, 128
    img = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    win = 11
    corner_pts = jnp.asarray([[0.0, 0.0], [W - 1.0, H - 1.0],
                              [0.0, H - 1.0], [W - 1.0, 0.0],
                              [5.3, 60.7], [120.9, 2.2]], jnp.float32)
    gx, gy = image_mod.sobel_gradients(img)
    valid = jnp.ones(len(corner_pts), bool)
    guess = jnp.zeros_like(corner_pts)
    cfg = FrontendConfig(klt_window=win, klt_iters=3)
    f_ref, ok_ref, _ = klt_mod._track_level(
        img, gx, gy, img, corner_pts, guess, valid, cfg)
    with pltpu.force_tpu_interpret_mode():
        f_pal, ok_pal, _ = track_level_pallas(
            img, gx, gy, img, corner_pts, guess, valid, win, 3)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               atol=1e-4)
    assert np.array_equal(np.asarray(ok_pal), np.asarray(ok_ref))


def test_track_pyramid_pallas_matches_xla(scene):
    """Whole-pyramid fused kernel vs the XLA per-level composition."""
    from vins_tpu.ops.klt_pallas import track_pyramid_pallas

    img0, img1, pts = scene
    L = CFG.pyramid_levels
    pyr0 = image_mod.build_pyramid(img0, L)
    pyr1 = image_mod.build_pyramid(img1, L)
    grads = [image_mod.sobel_gradients(p) for p in pyr0]
    valid = jnp.ones(pts.shape[0], bool)

    flow = jnp.zeros_like(pts)
    ok = valid
    for lvl in range(L - 1, -1, -1):
        flow, ok, err = klt_mod._track_level(
            pyr0[lvl], grads[lvl][0], grads[lvl][1], pyr1[lvl],
            pts / (2.0 ** lvl), flow, ok, CFG)
        if lvl > 0:
            flow = flow * 2.0

    with pltpu.force_tpu_interpret_mode():
        p_pal, ok_pal, _ = track_pyramid_pallas(
            pyr0, grads, pyr1, pts, valid, CFG.klt_window, CFG.klt_iters)
    np.testing.assert_allclose(np.asarray(p_pal - pts), np.asarray(flow),
                               atol=1e-3)
    assert np.array_equal(np.asarray(ok_pal), np.asarray(ok))
