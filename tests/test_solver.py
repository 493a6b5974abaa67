"""Sliding-window LM/Schur solver tests (SURVEY.md §7.2 stage 3 — the
minimum-slice decision point): noiseless synthetic window must converge to
ground truth, residuals must vanish at ground truth, Jacobians must match
finite differences."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.core import solver as solver_mod
from vins_tpu.core.factors import Extrinsics, projection_residual, \
    projection_factor_local
from vins_tpu.core.state import PriorFactor, WindowState
from vins_tpu.core.solver import WindowProblem, solve_window
from vins_tpu.io.synthetic import make_synthetic_window
from vins_tpu.utils import lie

CFG = VinsConfig()


def build_problem(syn, cfg=CFG, frame_free=None):
    F = cfg.window.num_frames
    preints = jax.vmap(
        lambda c: pre_mod.propagate(c, jnp.zeros(3), jnp.zeros(3), cfg.imu)
    )(syn.chunks)
    if frame_free is None:
        frame_free = jnp.ones(F)
    return WindowProblem(
        feats=syn.feats, preints=preints, prior=PriorFactor.empty(F),
        ext=syn.ext, gravity=syn.gravity,
        sqrt_info_proj=jnp.asarray(cfg.camera.focal / 1.5),
        frame_free=frame_free)


@pytest.fixture(scope="module")
def syn():
    return make_synthetic_window(CFG, n_landmarks=60, seed=3)


def test_ground_truth_has_near_zero_cost(syn):
    prob = build_problem(syn)
    S_imu = jax.vmap(pre_mod.sqrt_information)(prob.preints)
    sel = solver_mod.select_proj_factors(prob, CFG.solver.max_proj_factors)
    cost, (r_prior, r_imu, r_proj, w_valid) = solver_mod._residuals_only(
        syn.state, prob, CFG, S_imu, sel)
    assert float(jnp.abs(r_proj * w_valid[:, None]).max()) < 1e-3
    # IMU residual small (midpoint discretization error only).
    assert float(jnp.abs(r_imu).max()) < 0.2
    assert np.isfinite(float(cost))


def test_projection_jacobian_matches_fd(syn):
    """Analytic (jacfwd) projection Jacobian vs central differences."""
    m = int(np.flatnonzero(np.asarray(syn.feats.valid))[0])
    a = int(syn.feats.anchor[m])
    js = np.flatnonzero(np.asarray(syn.feats.mask[:, m]))
    j = int(js[js != a][0])
    args = (syn.feats.obs[a, m], syn.feats.obs[j, m],
            syn.state.p[a], syn.state.q[a], syn.state.p[j], syn.state.q[j],
            syn.state.inv_depth[m], syn.ext, jnp.asarray(1.0))
    _, J = projection_factor_local(*args)

    def res_at(delta):
        obs_i, obs_j, p_i, q_i, p_j, q_j, inv, ext, si = args
        pi, qi = lie.pose_retract(p_i, q_i, delta[0:6])
        pj, qj = lie.pose_retract(p_j, q_j, delta[6:12])
        return projection_residual(obs_i, obs_j, pi, qi, pj, qj,
                                   inv + delta[12], ext)

    eps = 1e-4
    J_fd = np.zeros((2, 13), np.float64)
    for k in range(13):
        d = np.zeros(13, np.float32)
        d[k] = eps
        rp = np.asarray(res_at(jnp.asarray(d)), np.float64)
        rm = np.asarray(res_at(jnp.asarray(-d)), np.float64)
        J_fd[:, k] = (rp - rm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=2e-2, rtol=1e-2)


def test_solver_converges_from_perturbed_init(syn):
    """Perturb all but frame 0, solve, recover ground truth (gauge fixed by
    freezing frame 0)."""
    rng = np.random.default_rng(0)
    F = CFG.window.num_frames
    gt = syn.state

    dp = np.zeros((F, 3), np.float32)
    dth = np.zeros((F, 3), np.float32)
    dp[1:] = rng.normal(size=(F - 1, 3)) * 0.05
    dth[1:] = rng.normal(size=(F - 1, 3)) * 0.02
    p0 = gt.p + jnp.asarray(dp)
    q0 = lie.quat_mul(gt.q, lie.so3_exp_quat(jnp.asarray(dth)))
    v0 = gt.v + jnp.asarray(
        np.float32(np.where(np.arange(F)[:, None] > 0,
                            rng.normal(size=(F, 3)) * 0.05, 0)))
    lam0 = gt.inv_depth * (1.0 + jnp.asarray(
        np.float32(rng.normal(size=gt.inv_depth.shape) * 0.05)))
    init = WindowState(p=p0, q=q0, v=v0, ba=gt.ba, bg=gt.bg, inv_depth=lam0)

    frame_free = jnp.ones(F).at[0].set(0.0)
    prob = build_problem(syn, frame_free=frame_free)
    solved, stats = jax.jit(
        lambda s, pr: solve_window(s, pr, CFG))(init, prob)

    ate = np.sqrt(np.mean(np.sum(
        (np.asarray(solved.p) - np.asarray(gt.p)) ** 2, -1)))
    init_ate = np.sqrt(np.mean(np.sum(
        (np.asarray(init.p) - np.asarray(gt.p)) ** 2, -1)))
    assert stats.accepted_iters > 0
    assert float(stats.final_cost) < float(stats.initial_cost)
    assert ate < init_ate * 0.12, (ate, init_ate)
    assert ate < 5e-3, ate

    # Depth recovery on valid slots.
    valid = np.asarray(syn.feats.valid)
    derr = np.abs(np.asarray(solved.inv_depth) - np.asarray(gt.inv_depth))
    assert float(derr[valid].max()) < 2e-2


def test_invalid_slots_untouched(syn):
    F = CFG.window.num_frames
    prob = build_problem(syn, frame_free=jnp.ones(F).at[0].set(0.0))
    init = syn.state._replace(
        inv_depth=syn.state.inv_depth + 0.01 * (~syn.feats.valid))
    solved, _ = solve_window(init, prob, CFG)
    invalid = ~np.asarray(syn.feats.valid)
    np.testing.assert_allclose(
        np.asarray(solved.inv_depth)[invalid],
        np.asarray(init.inv_depth)[invalid], atol=1e-7)


def test_solve_is_jittable_and_stable(syn):
    prob = build_problem(syn)
    f = jax.jit(lambda s, p: solve_window(s, p, CFG))
    out1, st1 = f(syn.state, prob)
    out2, st2 = f(out1, prob)  # solving from the solution stays put
    assert float(st2.final_cost) <= float(st1.final_cost) + 1e-3
    assert np.all(np.isfinite(np.asarray(out2.p)))


def test_iter_budget_backpressure(syn):
    """Runtime iteration budget (the reference's queue-depth-scaled
    solver cap, VINS.cpp:646-653): a traced budget of 1 must bound the
    accepted iterations without recompiling, and still reduce cost."""
    rng = np.random.default_rng(3)
    F = CFG.window.num_frames
    prob = build_problem(syn)
    dp = np.zeros((F, 3), np.float32)
    dp[1:] = rng.normal(size=(F - 1, 3)) * 0.05
    init = syn.state._replace(p=syn.state.p + jnp.asarray(dp))
    f = jax.jit(lambda s, p, b: solve_window(s, p, CFG, iter_budget=b))
    _, st1 = f(init, prob, jnp.asarray(1, jnp.int32))
    _, st8 = f(init, prob, jnp.asarray(8, jnp.int32))
    assert int(st1.accepted_iters) <= 1
    assert int(st8.accepted_iters) >= int(st1.accepted_iters)
    assert float(st1.final_cost) < float(st1.initial_cost)
    assert float(st8.final_cost) <= float(st1.final_cost) + 1e-6
