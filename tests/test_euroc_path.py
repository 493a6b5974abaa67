"""End-to-end EuRoC code-path test on an ASL-layout fixture.

VERDICT r1 item 1: the EuRoC path (io/euroc.py loading + measurement
alignment, radtan undistortion in utils/camera.py, euroc device profile,
real PNG decode) had zero end-to-end coverage. This generates a maximal-
fidelity ASL fixture (distorted 752×480 renders, 200 Hz noisy IMU with
bias walk, EuRoC csv formats) and runs the EXACT examples/run_euroc.py
flow over it, gated on ATE — the same command works unchanged on a real
EuRoC directory.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vins_tpu.config import euroc_config
from vins_tpu.io import euroc
from vins_tpu.io.asl_fixture import generate_asl_fixture

CFG = euroc_config()


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("euroc_fixture"))
    truth = generate_asl_fixture(root, CFG, n_frames=18, seed=3)
    return root, truth


def test_asl_layout_roundtrip(fixture_dir):
    """load_euroc + align_measurements must parse the written tree:
    correct counts, IMU chunks spanning each frame interval, PNG decode."""
    root, truth = fixture_dir
    data = euroc.load_euroc(root)
    assert len(data.cam_ts) == 18
    np.testing.assert_allclose(data.cam_ts, truth.cam_ts, atol=1e-8)
    # 18 frames @ 20 Hz = 0.9 s => ~180 IMU/GT rows @ 200 Hz.
    assert data.gt_ts is not None and len(data.gt_ts) >= 150

    frames = list(euroc.align_measurements(data, CFG))
    assert len(frames) == 17
    for f in frames:
        n_valid = int((f.chunk.dt > 0).sum())
        # 200 Hz IMU / 20 Hz camera: ~10 samples per frame interval.
        assert 8 <= n_valid <= 12, n_valid
        assert abs(float(f.chunk.dt.sum()) - 0.05) < 5e-3
    # Ground truth attached and finite.
    assert frames[0].gt_p is not None
    assert np.all(np.isfinite(frames[0].gt_p))

    img = euroc.load_gray_png(frames[0].image_path)
    assert img.shape == (CFG.camera.height, CFG.camera.width)
    assert 0.05 < float(img.mean()) < 0.95  # textured, not blank
    assert float(img.std()) > 0.02


def test_distortion_actually_applied(fixture_dir):
    """The fixture must exercise the undistortion path: the euroc profile
    carries real radtan coefficients and the rendered rays used them."""
    assert CFG.camera.k1 != 0.0
    from vins_tpu.io.synthetic import camera_ray_grid

    d_pin = camera_ray_grid(CFG, distorted=False)
    d_rad = camera_ray_grid(CFG, distorted=True)
    # Corners differ by many milliradians; center matches.
    corner = np.arccos(np.clip(np.sum(d_pin[2, 2] * d_rad[2, 2]), -1, 1))
    center = np.arccos(np.clip(np.sum(
        d_pin[240, 376] * d_rad[240, 376]), -1, 1))
    assert corner > 0.02
    assert center < 1e-3


@pytest.mark.slow
def test_run_euroc_end_to_end(tmp_path):
    """The real `run_euroc.py` flow over the fixture: must initialize,
    track, and beat the ATE gate. This is the EuRoC-path accuracy
    statement of BASELINE.md, exercised on the exact dataset code."""
    from examples import run_euroc

    from conftest import asl_fixture_cached

    root, _ = asl_fixture_cached(n_frames=80, seed=5)
    result = run_euroc.main(["--root", root, "--no-loop",
                             "--out", str(tmp_path / "out")])
    assert result["frames"] == 79
    assert "ate_rmse" in result, "system never initialized on the fixture"
    # Measured ~0.07 on this fixture (r4); 0.10 = measured + ~40% so a
    # 1.5x accuracy regression fails CI (VERDICT r4 item 6; the old 0.15
    # gate would have passed a 2x regression).
    assert result["ate_rmse"] < 0.10, result


@pytest.mark.slow
def test_run_euroc_revisit_loop_closure(tmp_path):
    """VERDICT r2 item 4: loop closure exercised END TO END on the
    EuRoC code path (distorted 752x480 PNGs, 200 Hz IMU with bias walk,
    calibrated R_bc) in STREAMING block mode, on a revisit trajectory
    (1.2 laps of the circle). Gates: (i) >=1 verified loop, (ii) the
    drift-corrected trajectory is no worse than the raw VIO trajectory
    of the same run, (iii) the end-of-run global BA (the product call
    site for LoopCloser.global_ba) does not degrade keyframe ATE.
    Reference equivalent: ViewController.mm:888-983 on recorded
    sequences."""
    from examples import run_euroc

    from conftest import asl_fixture_cached

    # w=0.42 rad/s at 20 Hz: lap = 15 s = 299 frames; 360 frames give a
    # ~60-frame revisit window. loop_freq=1 inserts every keyframe so
    # the default dislocal window (20 rows ~ 4 s) stays well inside the
    # lap time.
    root, _ = asl_fixture_cached(
        n_frames=360, cam_hz=20.0, seed=9,
        traj_kwargs=dict(w=0.42, bob=0.2, bob_w=1.9))
    result = run_euroc.main(["--root", root, "--stream", "--global-ba",
                             "--loop-freq", "1",
                             "--out", str(tmp_path / "out")])
    assert result["frames"] == 359
    assert "ate_rmse" in result, "system never initialized on the fixture"
    assert result["loop_hits"] >= 1, result
    # Live published poses: loop correction must not hurt (detections on
    # this short fixture cluster at the end, so the live improvement is
    # bounded; the retroactive map correction below is the real gate).
    assert result["ate_rmse"] <= result["ate_rmse_raw"] * 1.05 + 1e-3, \
        result
    # Measured 0.146 (ACCURACY_r04); 0.18 = measured + ~25% margin
    # (VERDICT r4 item 6 — the old 0.3 gate passed a 2x regression).
    assert result["ate_rmse"] < 0.18, result
    # The pose-graph-corrected keyframe map must BEAT the raw odometry
    # keyframes (the reference's loop-closure accuracy effect:
    # keyfame_database.cpp:140-356 corrects the past trajectory).
    assert "kf_ate_raw" in result and "kf_ate_pre_ba" in result, result
    assert result["kf_ate_pre_ba"] <= result["kf_ate_raw"] * 1.02, result
    # Global BA ran over the real map and did not degrade the keyframe
    # trajectory (metric scale pinned by the pose prior).
    assert result.get("global_ba_cost") is not None, result
    assert result["kf_ate_post_ba"] <= result["kf_ate_pre_ba"] * 1.1 \
        + 5e-3, result
    # Under the test harness's 8-device virtual mesh the product call
    # site must take the SHARDED path (landmark-sharded psum Schur over
    # the mesh's block axis) — VERDICT r3 item 8.
    import jax as _jax
    assert result["global_ba_devices"] == len(_jax.devices()), result


@pytest.mark.slow
def test_run_euroc_drift_correction_improves_published_path(tmp_path):
    """VERDICT r4 item 3: loop closure must IMPROVE the published
    trajectory, not merely not hurt it. The fixture carries a 1.5% gyro
    scale-factor error — an un-modeled systematic the estimator's
    online bias states cannot absorb — so raw VIO accrues real yaw
    drift over 2 laps; the pose-graph drift correction applied to the
    published poses (update_loop_correction, VINS.cpp:307-331 +
    keyfame_database.cpp:140-356) must cut ATE by a real margin."""
    from examples import run_euroc

    from conftest import asl_fixture_cached

    # gyr_walk 1e-3 (500x the modeled euroc gyr_w=2e-6): a bias random
    # walk the estimator tracks with lag, integrating into yaw drift —
    # the r4 fixture's gyro SCALE error alone was absorbed by the online
    # bias state on this constant-rate circle (measured raw ATE 0.16).
    # 1200 frames = 4 laps: loop-closure correction engages from lap 2,
    # covering most of the published path.
    root, _ = asl_fixture_cached(
        n_frames=1200, seed=11, cam_hz=20.0,
        traj_kwargs=dict(w=0.42, bob=0.2, bob_w=1.9),
        gyr_scale=1.015, gyr_walk=1e-3)
    # No --global-ba here: without cross-lap landmark associations a
    # reprojection-only BA drags the map back toward the drift-consistent
    # raw geometry (measured: post-BA keyframe ATE 0.18 vs 0.13 pose-
    # graph-corrected on a drifted run). The reference has no global BA
    # at all; BA's benefit on a drift-light map is gated by the revisit
    # test above.
    result = run_euroc.main(["--root", root, "--stream",
                             "--loop-freq", "1",
                             "--out", str(tmp_path / "out")])
    assert result["frames"] == 1199
    assert "ate_rmse" in result, "system never initialized on the fixture"
    assert result["loop_hits"] >= 1, result
    # Drift must actually be VISIBLE on this fixture — otherwise the
    # correction gate below is vacuous (the r4 revisit fixture measured
    # ate == ate_raw to 4 decimals because raw VIO barely drifted).
    assert result["ate_rmse_raw"] >= 0.25, result
    # The published (drift-corrected) trajectory beats raw VIO by >=30%.
    assert result["ate_rmse"] <= 0.7 * result["ate_rmse_raw"], result
    # And the pose-graph-corrected keyframe map beats the raw odometry
    # keyframes by at least as much.
    assert result["kf_ate_corrected"] <= 0.7 * result["kf_ate_raw"], \
        result
