"""Unit tests for the SO(3)/quaternion substrate (SURVEY.md §7.2 stage 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_tpu.utils import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_identity(rng):
    q = random_quats(rng, 16)
    ident = np.tile(lie.quat_identity(), (16, 1))
    np.testing.assert_allclose(lie.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(lie.quat_mul(ident, q), q, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    R = lie.quat_to_rotmat(q)
    np.testing.assert_allclose(
        lie.quat_rotate(q, v), np.einsum("nij,nj->ni", R, v), atol=1e-5
    )


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    q2 = np.asarray(lie.rotmat_to_quat(lie.quat_to_rotmat(q)))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_rotmat_quat_roundtrip_near_pi(rng):
    # Near-180° rotations stress the trace-based extraction path.
    axis = rng.normal(size=(16, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = axis * (np.pi - 1e-3)
    q = np.asarray(lie.so3_exp_quat(theta))
    R = lie.quat_to_rotmat(q)
    q2 = np.asarray(lie.rotmat_to_quat(R))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)


def test_exp_log_roundtrip(rng):
    theta = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
    theta2 = np.asarray(lie.so3_log(lie.so3_exp_quat(theta)))
    np.testing.assert_allclose(theta2, theta, atol=1e-5)


def test_exp_small_angle_matches_delta_q():
    theta = jnp.array([[1e-5, -2e-5, 3e-6]], dtype=jnp.float32)
    np.testing.assert_allclose(
        lie.so3_exp_quat(theta), lie.delta_q(theta), atol=1e-9
    )


def test_qleft_qright(rng):
    a, b = random_quats(rng, 8), random_quats(rng, 8)
    ab = lie.quat_mul(a, b)
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", lie.quat_left(a), b), ab, atol=1e-6
    )
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", lie.quat_right(b), a), ab, atol=1e-6
    )


def test_ypr_roundtrip(rng):
    ypr = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
    R = lie.ypr_to_rotmat(ypr)
    ypr2 = np.asarray(lie.rotmat_to_ypr(R))
    np.testing.assert_allclose(ypr2, ypr, atol=1e-5)


def test_g2r_aligns_gravity(rng):
    g = rng.normal(size=(8, 3)).astype(np.float32)
    g = g / np.linalg.norm(g, axis=-1, keepdims=True) * 9.81
    R0 = np.asarray(lie.gravity_to_rotmat(jnp.asarray(g)))
    g_rot = np.einsum("nij,nj->ni", R0, g / np.linalg.norm(g, axis=-1, keepdims=True))
    np.testing.assert_allclose(g_rot, np.tile([0, 0, 1.0], (8, 1)), atol=1e-5)
    # Yaw of R0 is zero.
    yaw = np.asarray(lie.rotmat_to_ypr(R0))[:, 0]
    np.testing.assert_allclose(yaw, 0.0, atol=1e-5)


def test_pose_retract_matches_exact_for_small(rng):
    q = random_quats(rng, 8)
    p = rng.normal(size=(8, 3)).astype(np.float32)
    delta = rng.normal(size=(8, 6)).astype(np.float32) * 1e-4
    p2, q2 = lie.pose_retract(p, q, delta)
    q_exact = lie.quat_mul(q, lie.so3_exp_quat(delta[:, 3:6]))
    np.testing.assert_allclose(p2, p + delta[:, :3], atol=1e-7)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(q2) * np.asarray(q_exact), axis=-1)), 1.0,
        atol=1e-6)


def test_boxminus_inverse_of_retract(rng):
    q = random_quats(rng, 8)
    dtheta = rng.normal(size=(8, 3)).astype(np.float32) * 1e-3
    q2 = lie.quat_mul(q, lie.so3_exp_quat(dtheta))
    np.testing.assert_allclose(lie.quat_boxminus(q2, q), dtheta, atol=1e-5)


def test_jit_and_vmap_compose():
    f = jax.jit(jax.vmap(lambda q, v: lie.quat_rotate(q, v)))
    q = jnp.tile(lie.quat_identity(), (4, 1))
    v = jnp.ones((4, 3))
    np.testing.assert_allclose(f(q, v), v, atol=1e-6)
