"""Calibrate the drift-visible fixture (VERDICT r4 item 3 follow-up).

The r4 fixture's 1.5% gyro scale error produced only 0.16 m raw ATE:
on a CONSTANT-rate circle a scale error is exactly a constant rate
bias, which the estimator's online bias state absorbs. The honest
un-absorbable drift source is a gyro bias RANDOM WALK faster than the
modeled density (euroc_config gyr_w = 2e-6): the estimator tracks the
wandering bias with lag and the lag integrates into yaw error — the
classic drift the 4-DoF pose graph exists to remove.

  JAX_PLATFORMS=cpu python tools/debug_drift_fixture.py [gyr_walk] [n]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(gyr_walk=1e-3, n_frames=600):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from examples import run_euroc
    from vins_tpu.config import euroc_config
    from vins_tpu.io.asl_fixture import generate_asl_fixture

    cfg = euroc_config()
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "seq")
        generate_asl_fixture(root, cfg, n_frames=n_frames, cam_hz=20.0,
                             seed=11, gyr_scale=1.015,
                             gyr_walk=gyr_walk,
                             traj_kwargs=dict(w=0.42, bob=0.2,
                                              bob_w=1.9))
        result = run_euroc.main(["--root", root, "--stream",
                                 "--global-ba", "--loop-freq", "1",
                                 "--out", os.path.join(tmp, "out")])
    print("RESULT", json.dumps(result))


if __name__ == "__main__":
    gw = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    main(gw, n)
