"""Scale-out layer tests on the virtual 8-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu import default_config
from vins_tpu.core.estimator import BackendState, FrameInput
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.io import synthetic
from vins_tpu.parallel import (BAProblem, BAState, make_batched_step,
                               make_mesh, solve_ba, solve_ba_sharded,
                               stack_inputs, stack_states)
from vins_tpu.parallel.mesh import batch_sharding, shard_leading
from vins_tpu.utils import lie


def tiny_config():
    cfg = default_config()
    return cfg.replace(
        window=cfg.window.__class__(window_size=4, max_imu_per_edge=8,
                                    max_landmarks=32),
        frontend=cfg.frontend.__class__(max_features=32, target_features=16),
    )


def test_mesh_construction():
    mesh = make_mesh(batch=4, block=2)
    assert mesh.shape == {"batch": 4, "block": 2}
    mesh = make_mesh(block=4)
    assert mesh.shape == {"batch": 2, "block": 4}


def test_dist_ba_matches_single_device():
    """Sharded BA must produce the same solution as the dense solver."""
    gt, init, prob = synthetic.make_ba_problem(
        n_poses=8, n_landmarks=64, seed=1, pose_noise=0.05, point_noise=0.2)
    st_1, cost_1, _ = jax.jit(lambda s, p: solve_ba(s, p, iters=8))(init, prob)

    mesh = make_mesh(batch=1, block=8)
    st_8, cost_8, _ = solve_ba_sharded(init, prob, mesh, iters=8)

    np.testing.assert_allclose(np.asarray(cost_8), np.asarray(cost_1),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_8.p), np.asarray(st_1.p),
                               rtol=1e-3, atol=1e-4)


def test_dist_ba_converges_to_ground_truth():
    gt, init, prob = synthetic.make_ba_problem(
        n_poses=8, n_landmarks=64, seed=2, pose_noise=0.05, point_noise=0.2)
    mesh = make_mesh(batch=1, block=8)
    st, cost, hist = solve_ba_sharded(init, prob, mesh, iters=12)
    ate = float(jnp.sqrt(jnp.mean(jnp.sum((st.p - gt.p) ** 2, -1))))
    assert ate < 1e-2, f"ATE {ate} too high, cost {cost}"
    assert float(cost) < 1e-6


def test_batched_backend_step_runs_sharded():
    """B=8 independent windows, one per device, single jitted step."""
    cfg = tiny_config()
    B = 8
    wins = [synthetic.make_synthetic_window(cfg, n_landmarks=24, seed=s,
                                            noise_px=0.3)
            for s in range(2)]  # two distinct worlds, tiled
    ext, gravity = wins[0].ext, wins[0].gravity

    states, inputs = [], []
    for b in range(B):
        w = wins[b % 2]
        est = BackendState.bootstrap(cfg, w.state, w.feats, w.chunks,
                                     w.ext, w.gravity)
        states.append(est)
        F = cfg.window.num_frames
        inputs.append(FrameInput(
            chunk=jax.tree.map(lambda x: x[-1], w.chunks),
            ids=w.feats.track_id,
            obs=w.feats.obs[F - 1],
            obs_valid=w.feats.mask[F - 1] & w.feats.valid))

    mesh = make_mesh(batch=8, block=1)
    step = make_batched_step(cfg, ext, gravity, mesh)
    est_b = shard_leading(stack_states(states), batch_sharding(mesh))
    inp_b = shard_leading(stack_inputs(inputs), batch_sharding(mesh))

    est2, out = step(est_b, inp_b)
    assert out.pose_p.shape == (B, 3)
    assert bool(jnp.all(jnp.isfinite(out.pose_p)))
    # Streams with the same world must produce identical outputs.
    np.testing.assert_allclose(np.asarray(out.pose_p[0]),
                               np.asarray(out.pose_p[2]), rtol=1e-5)
