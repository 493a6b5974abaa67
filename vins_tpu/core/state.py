"""Fixed-shape window state and factor tables.

The single biggest architectural transformation vs the reference
(SURVEY.md §7.1): the reference's dynamic containers
(`list<FeaturePerId>` in VINS_ios/feature_manager.hpp:30-60, per-frame
`vector<FeaturePerFrame>`) become dense fixed-size arrays with validity
masks, making every stage jittable, batchable, and shardable.

Shapes use:
  F = window frames (cfg.window.num_frames, 11)
  M = landmark slots (cfg.window.max_landmarks, 256)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class WindowState(NamedTuple):
    """Estimator state over the sliding window (reference Ps/Vs/Rs/Bas/Bgs
    arrays, VINS_ios/VINS.hpp:73-77, plus inverse depths)."""

    p: jax.Array           # [F, 3] world positions
    q: jax.Array           # [F, 4] wxyz world-from-body
    v: jax.Array           # [F, 3] world velocities
    ba: jax.Array          # [F, 3] accel bias
    bg: jax.Array          # [F, 3] gyro bias
    inv_depth: jax.Array   # [M] inverse depth at anchor frame

    @staticmethod
    def identity(F: int, M: int, dtype=jnp.float32) -> "WindowState":
        return WindowState(
            p=jnp.zeros((F, 3), dtype),
            q=jnp.tile(lie.quat_identity(dtype), (F, 1)),
            v=jnp.zeros((F, 3), dtype),
            ba=jnp.zeros((F, 3), dtype),
            bg=jnp.zeros((F, 3), dtype),
            inv_depth=jnp.full((M,), 0.2, dtype),
        )


class FeatureTable(NamedTuple):
    """Per-slot feature tracks over the window (reference FeatureManager's
    data model, VINS_ios/feature_manager.hpp:30-60, flattened to a dense
    [F, M] observation grid with masks)."""

    obs: jax.Array      # [F, M, 2] normalized image-plane observations
    mask: jax.Array     # [F, M] bool: frame f observes slot m
    anchor: jax.Array   # [M] int32: anchor (start) frame per slot
    valid: jax.Array    # [M] bool: slot holds a live track with >=2 obs
    track_id: jax.Array  # [M] int32: global track id (-1 = free slot)

    @staticmethod
    def empty(F: int, M: int, dtype=jnp.float32) -> "FeatureTable":
        return FeatureTable(
            obs=jnp.zeros((F, M, 2), dtype),
            mask=jnp.zeros((F, M), bool),
            anchor=jnp.zeros((M,), jnp.int32),
            valid=jnp.zeros((M,), bool),
            track_id=jnp.full((M,), -1, jnp.int32),
        )


class PriorFactor(NamedTuple):
    """Dense linearized marginalization prior over the pose-part tangent.

    Replay semantics match MarginalizationFactor::Evaluate
    (VINS_ios/marginalization_factor.cpp:336-384): residual
    r(x) = r0 + J0 · (x ⊟ x̄), with quaternion-aware boxminus.
    Tangent layout per frame: [δp, δθ, δv, δba, δbg] (15), frames stacked.
    """

    J: jax.Array        # [D, D] whitened Jacobian (D = 15*F)
    r: jax.Array        # [D] whitened residual at linearization point
    lin_p: jax.Array    # [F, 3]
    lin_q: jax.Array    # [F, 4]
    lin_v: jax.Array    # [F, 3]
    lin_ba: jax.Array   # [F, 3]
    lin_bg: jax.Array   # [F, 3]
    weight: jax.Array   # [] 1.0 if active, 0.0 before first marginalization

    @staticmethod
    def empty(F: int, dtype=jnp.float32) -> "PriorFactor":
        D = 15 * F
        return PriorFactor(
            J=jnp.zeros((D, D), dtype),
            r=jnp.zeros((D,), dtype),
            lin_p=jnp.zeros((F, 3), dtype),
            lin_q=jnp.tile(lie.quat_identity(dtype), (F, 1)),
            lin_v=jnp.zeros((F, 3), dtype),
            lin_ba=jnp.zeros((F, 3), dtype),
            lin_bg=jnp.zeros((F, 3), dtype),
            weight=jnp.zeros((), dtype),
        )


def state_boxminus(s: WindowState, prior: PriorFactor) -> jax.Array:
    """Tangent of the current state around the prior linearization point,
    [15*F], in the layout described on PriorFactor."""
    dp = s.p - prior.lin_p
    dth = lie.quat_boxminus(s.q, prior.lin_q)
    dv = s.v - prior.lin_v
    dba = s.ba - prior.lin_ba
    dbg = s.bg - prior.lin_bg
    return jnp.concatenate([dp, dth, dv, dba, dbg], axis=-1).reshape(-1)


def retract_window(s: WindowState, delta_c: jax.Array,
                   delta_l: jax.Array) -> WindowState:
    """Apply a pose-tangent step [F*15] and landmark step [M]."""
    F = s.p.shape[0]
    d = delta_c.reshape(F, 15)
    p, q = lie.pose_retract(s.p, s.q, d[:, 0:6])
    return WindowState(
        p=p, q=q,
        v=s.v + d[:, 6:9],
        ba=s.ba + d[:, 9:12],
        bg=s.bg + d[:, 12:15],
        inv_depth=s.inv_depth + delta_l,
    )
