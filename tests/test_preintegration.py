"""Preintegration tests (SURVEY.md §7.2 stage 2): closed-form checks,
repropagation consistency, covariance PSD, padding no-ops."""
import numpy as np
import jax.numpy as jnp
import pytest

from vins_tpu.config import ImuConfig
from vins_tpu.core import preintegration as pre
from vins_tpu.utils import lie

IMU = ImuConfig()
G = np.array([0.0, 0.0, IMU.gravity], dtype=np.float32)


def make_chunk(n, dt, acc_body, gyr_body, max_samples=64):
    """Constant body-frame acc/gyr sampled n times at step dt (row 0 seeds)."""
    assert n + 1 <= max_samples, "chunk capacity too small for n samples"
    dts = np.zeros(max_samples, np.float32)
    dts[1:n + 1] = dt
    accs = np.tile(np.asarray(acc_body, np.float32), (max_samples, 1))
    gyrs = np.tile(np.asarray(gyr_body, np.float32), (max_samples, 1))
    return pre.ImuChunk(jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs))


def test_static_chunk_integrates_gravity():
    # Body at rest, accelerometer measures +g in body z.
    chunk = make_chunk(20, 0.01, [0, 0, IMU.gravity], [0, 0, 0])
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    T = 0.2
    np.testing.assert_allclose(p.sum_dt, T, atol=1e-6)
    np.testing.assert_allclose(p.dv, [0, 0, IMU.gravity * T], atol=1e-4)
    np.testing.assert_allclose(p.dp, [0, 0, 0.5 * IMU.gravity * T * T], atol=1e-4)
    np.testing.assert_allclose(p.dq, [1, 0, 0, 0], atol=1e-6)


def test_constant_rotation_closed_form():
    w = np.array([0.3, -0.2, 0.5], np.float32)
    chunk = make_chunk(100, 0.005, [0, 0, 0], w, max_samples=128)
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    T = 0.5
    q_expected = lie.so3_exp_quat(jnp.asarray(w * T))
    dot = np.abs(np.sum(np.asarray(p.dq) * np.asarray(q_expected)))
    assert dot > 1.0 - 1e-6


def test_constant_accel_no_rotation():
    a = np.array([1.0, -2.0, 0.5], np.float32)
    chunk = make_chunk(50, 0.01, a, [0, 0, 0])
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    T = 0.5
    np.testing.assert_allclose(p.dv, a * T, atol=1e-4)
    np.testing.assert_allclose(p.dp, 0.5 * a * T * T, atol=1e-4)


def test_padding_is_noop():
    chunk_small = make_chunk(20, 0.01, [0.1, 0.2, 9.8], [0.05, 0, 0.1],
                             max_samples=24)
    chunk_big = make_chunk(20, 0.01, [0.1, 0.2, 9.8], [0.05, 0, 0.1],
                           max_samples=64)
    a = pre.propagate(chunk_small, jnp.zeros(3), jnp.zeros(3), IMU)
    b = pre.propagate(chunk_big, jnp.zeros(3), jnp.zeros(3), IMU)
    np.testing.assert_allclose(a.dp, b.dp, atol=1e-6)
    np.testing.assert_allclose(a.dq, b.dq, atol=1e-7)
    np.testing.assert_allclose(a.covariance, b.covariance, rtol=1e-5, atol=1e-8)


def test_covariance_psd_and_growing():
    chunk = make_chunk(40, 0.01, [0.3, 0.1, 9.9], [0.2, -0.1, 0.3])
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    eig = np.linalg.eigvalsh(np.asarray(p.covariance, np.float64))
    assert eig.min() > -1e-8
    assert eig.max() > 0


def test_bias_jacobian_first_order():
    """Jacobian bias-correction in evaluate ≈ repropagation with new bias."""
    rng = np.random.default_rng(1)
    acc = np.array([0.3, -0.4, 9.9], np.float32)
    gyr = np.array([0.1, 0.2, -0.15], np.float32)
    chunk = make_chunk(30, 0.01, acc, gyr)
    dbg = np.float32(rng.normal(size=3) * 1e-3)
    dba = np.float32(rng.normal(size=3) * 1e-3)

    p0 = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    p1 = pre.propagate(chunk, jnp.asarray(dba), jnp.asarray(dbg), IMU)

    J = np.asarray(p0.jacobian)
    dp_corr = np.asarray(p0.dp) + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
    dv_corr = np.asarray(p0.dv) + J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
    dq_corr = lie.quat_mul(p0.dq, lie.delta_q(jnp.asarray(J[3:6, 12:15] @ dbg)))

    np.testing.assert_allclose(dp_corr, p1.dp, atol=5e-5)
    np.testing.assert_allclose(dv_corr, p1.dv, atol=5e-5)
    dot = np.abs(np.sum(np.asarray(dq_corr) * np.asarray(p1.dq)))
    assert dot > 1.0 - 1e-6


def test_evaluate_zero_residual_on_consistent_states():
    """States exactly consistent with the preintegrated deltas ⇒ residual 0."""
    acc = np.array([0.5, 0.0, 9.805], np.float32)
    gyr = np.array([0.0, 0.0, 0.4], np.float32)
    chunk = make_chunk(25, 0.01, acc, gyr)
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)

    # Frame i at origin; derive frame j by world-frame dead reckoning.
    p_i = jnp.zeros(3); q_i = lie.quat_identity(); v_i = jnp.array([0.2, 0, 0.1])
    pj, qj, vj = pre.propagate_state(
        p_i, q_i, v_i, jnp.zeros(3), jnp.zeros(3), chunk, jnp.asarray(G))
    r = pre.evaluate(p, p_i, q_i, v_i, jnp.zeros(3), jnp.zeros(3),
                     pj, qj, vj, jnp.zeros(3), jnp.zeros(3), jnp.asarray(G))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-4)


def test_evaluate_detects_position_error():
    chunk = make_chunk(25, 0.01, [0, 0, 9.805], [0, 0, 0])
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    p_i = jnp.zeros(3); q_i = lie.quat_identity(); v_i = jnp.zeros(3)
    pj, qj, vj = pre.propagate_state(
        p_i, q_i, v_i, jnp.zeros(3), jnp.zeros(3), chunk, jnp.asarray(G))
    r = pre.evaluate(p, p_i, q_i, v_i, jnp.zeros(3), jnp.zeros(3),
                     pj + jnp.array([0.1, 0, 0]), qj, vj,
                     jnp.zeros(3), jnp.zeros(3), jnp.asarray(G))
    assert abs(float(r[0]) - 0.1) < 1e-4


def test_sqrt_information_whitens():
    chunk = make_chunk(30, 0.01, [0.1, 0.1, 9.8], [0.05, 0.02, 0.1])
    p = pre.propagate(chunk, jnp.zeros(3), jnp.zeros(3), IMU)
    S = np.asarray(pre.sqrt_information(p), np.float64)
    P = np.asarray(p.covariance, np.float64) + 1e-8 * np.eye(15)
    # SᵀS ≈ P⁻¹
    np.testing.assert_allclose(S.T @ S @ P, np.eye(15), atol=5e-2)


def test_parallel_matches_sequential_propagate():
    """The associative-scan formulation must match the reference-order
    sequential scan (same midpoint math, different association)."""
    rng = np.random.default_rng(7)
    N = 32
    dt = np.zeros(N, np.float32)
    dt[1:25] = rng.uniform(0.004, 0.012, 24)
    acc = rng.normal(0, 2.0, (N, 3)).astype(np.float32) + [0, 0, 9.8]
    gyr = rng.normal(0, 0.8, (N, 3)).astype(np.float32)
    chunk = pre.ImuChunk(jnp.asarray(dt), jnp.asarray(acc), jnp.asarray(gyr))
    ba = jnp.asarray([0.05, -0.02, 0.03])
    bg = jnp.asarray([0.01, 0.02, -0.015])
    a = pre.propagate(chunk, ba, bg, IMU)
    b = pre.propagate_sequential(chunk, ba, bg, IMU)
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.dq), np.asarray(b.dq),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.jacobian), np.asarray(b.jacobian),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.covariance),
                               np.asarray(b.covariance),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(a.sum_dt), float(b.sum_dt), rtol=1e-6)
