"""Whole-pipeline streaming scan: N camera frames through ONE device
program.

The reference hides latency with five threads sharing mutable state
(ViewController.mm:276-294); the TPU-native equivalent of that latency
architecture is to remove the host from the per-frame path entirely:
stage a block of frames in HBM and `lax.scan` the full per-frame pipeline
— CLAHE → pyramid → fused-Pallas KLT → F-RANSAC → top-up (frontend), the
30 Hz motion-only solve, and (every `freq`-th frame, under `lax.cond`) the
complete sliding-window backend with marginalization + slide + pnp resync.
Host dispatch, which dominates per-frame latency over a tunneled chip, is
paid once per block instead of ~10 times per frame; loop-closure work
(infrequent, ~1 Hz) stays on the host and overlaps the NEXT block's scan
(see pipeline.VinsSystem.process_block).

This is both the throughput path (bench.py "system_frames_per_s") and the
offline/dataset-rate processing mode.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import VinsConfig
from .core import feature_manager as fm
from .core import marginalization as marg
from .core import pnp as pnp_mod
from .core import preintegration as pre_mod
from .core.estimator import (BackendState, FrameInput, LoopInput,
                             backend_step, landmark_world_points)
from .core.factors import Extrinsics
from .frontend import tracker as tr_mod
from .ops import image as image_mod


def precompute_block(imgs: jax.Array, cfg: VinsConfig):
    """Batched per-block image prep: CLAHE, pyramid, Scharr gradients for
    every frame in ONE vmapped program.

    These stages are frame-independent (only LK is sequential), so
    running them inside the scan serializes work the chip could batch:
    the banded-matmul filters (ops/image.py) become [N·H, W]-scale MXU
    matmuls here instead of 48 small sequential ones — measured ~2x
    cheaper per frame — and each frame's prep is computed exactly once
    (the scan previously recomputed gradients for the fwd/bwd passes).

    Returns (pyrs, grads): tuples over levels of [N, h, w] stacks /
    ([N,h,w],[N,h,w]) pairs, fed to the scan as xs.
    """
    fe = cfg.frontend
    eq = jax.vmap(lambda im: image_mod.clahe(im, fe.clahe_clip,
                                             fe.clahe_grid,
                                             fe.clahe_bins))(imgs)
    pyrs = [eq]
    for _ in range(fe.pyramid_levels - 1):
        pyrs.append(jax.vmap(image_mod.pyr_down)(pyrs[-1]))
    grads = tuple(jax.vmap(image_mod.sobel_gradients)(p) for p in pyrs)
    return tuple(pyrs), grads


class ScanState(NamedTuple):
    """Everything carried frame-to-frame by the fused pipeline scan."""

    tracker: tr_mod.TrackerState
    pnp: pnp_mod.PnpWindow
    est: BackendState
    pending: pre_mod.ImuChunk    # IMU accumulated since last backend frame
    has_pending: jax.Array       # [] bool
    phase: jax.Array             # [] int32; 0 = backend frame
    # Active loop-closure constraint block (weight 0 = inactive). Staged
    # by the host from the previous block's detection — one block of
    # latency, the streaming analog of the reference's async loop thread
    # feeding retrive_pose_data into the next solve (VINS.cpp:571-637).
    # The scan owns the TTL/track-support lifecycle.
    loop: LoopInput
    # Runtime LM iteration budget for the window solves (backpressure:
    # the host lowers it when blocks fall behind the camera rate,
    # mirroring the reference's 60→40→30 ms cap, VINS.cpp:646-653).
    solver_budget: jax.Array     # [] int32


class ScanOutput(NamedTuple):
    """Per-frame outputs (stacked [N, ...] by the scan)."""

    p: jax.Array             # [3] published pose (backend or 30 Hz pnp)
    q: jax.Array             # [4]
    is_backend: jax.Array    # [] bool
    is_keyframe: jax.Array   # [] bool (meaningful on backend frames)
    failure: jax.Array       # [] bool
    solver_cost: jax.Array   # []
    n_tracked: jax.Array     # [] int32
    # Keyframe harvest (tracker-slot order) for host-side loop closure:
    # pixel positions, world points, track ids and masks of the tracked
    # features at this frame — what LoopCloser.add_keyframe consumes.
    kf_pts_px: jax.Array     # [Mw, 2]
    kf_valid: jax.Array      # [Mw]
    kf_pts_w: jax.Array      # [Mw, 3]
    kf_w_ok: jax.Array       # [Mw]
    kf_ids: jax.Array        # [Mw] int32
    # Sparse map at backend frames (zeros otherwise): the reference
    # publishes the drift-corrected cloud too (update_loop_correction,
    # VINS.cpp:307-331); drift is applied host-side at publish time.
    point_cloud: jax.Array   # [M, 3]
    point_valid: jax.Array   # [M]
    # Loop-edge lifecycle (meaningful while a loop block is active):
    # refined relative pose read off the solved window (VINS.cpp:663-680)
    # and the retirement event that triggers the 4-DoF pose graph
    # (ViewController.mm:850-875).
    loop_good: jax.Array     # [] bool
    loop_rel_t: jax.Array    # [3]
    loop_rel_yaw: jax.Array  # []
    loop_retired: jax.Array  # [] bool
    # All small per-frame leaves packed into ONE row (see PACK_* column
    # constants): the streaming sync fetches this single [N, 18] buffer
    # instead of eleven separate ones — per-buffer transfer overhead on
    # the tunneled link measured ~2 ms each.
    packed: jax.Array        # [18] float32


# Column layout of ScanOutput.packed.
PACK_P = slice(0, 3)
PACK_Q = slice(3, 7)
PACK_COST = 7
PACK_IS_BE = 8
PACK_IS_KF = 9
PACK_FAIL = 10
PACK_NTRACK = 11
PACK_LGOOD = 12
PACK_LYAW = 13
PACK_LRET = 14
PACK_LREL_T = slice(15, 18)


def _gather_by_id(dst_ids, src_ids, src_vals, src_valid):
    """For each dst id, pull the matching src slot's value."""
    eq = ((dst_ids[:, None] == src_ids[None, :])
          & (src_ids[None, :] >= 0) & src_valid[None, :]
          & (dst_ids[:, None] >= 0))
    has = jnp.any(eq, axis=1)
    j = jnp.argmax(eq, axis=1)
    return jax.tree.map(lambda v: v[j], src_vals), has


def _sync_pnp(pnp: pnp_mod.PnpWindow, est: BackendState, cfg: VinsConfig,
              ext: Extrinsics) -> pnp_mod.PnpWindow:
    """Anchor the pnp window at the newest backend solution and refresh
    its fixed landmark map (ViewController.mm:731-758)."""
    F = cfg.window.num_frames
    S = cfg.window.pnp_size + 1
    win = est.window
    pnp = pnp_mod.anchor_from_backend(
        pnp, jnp.asarray(S - 1), win.p[F - 1], win.q[F - 1],
        win.v[F - 1], win.ba[F - 1], win.bg[F - 1])
    pts_w = landmark_world_points(win, est.feats, ext)
    valid = est.feats.valid & (win.inv_depth > 1e-3)
    track_len = jnp.sum(est.feats.mask, axis=0)
    return pnp_mod.update_features(pnp, pts_w, valid, track_len)


def vio_scan_step(state: ScanState, pyr, grads,
                  chunk: pre_mod.ImuChunk, cfg: VinsConfig,
                  ext: Extrinsics, gravity: jax.Array,
                  use_pnp: bool = True) -> Tuple[ScanState, ScanOutput]:
    """One camera frame of the fused pipeline (pure, scan-able).

    pyr/grads: this frame's block-precomputed image prep
    (precompute_block) — per-level pyramid images and gradients."""
    F = cfg.window.num_frames
    Mw = cfg.frontend.max_features
    dtype = gravity.dtype

    is_backend = state.phase == 0
    # Top-up on backend frames only when configured (the reference's
    # cadence, feature_tracker.cpp:231-307 img_cnt==0).
    do_topup = (True if cfg.frontend.topup_every_frame else is_backend)
    tracker, front = tr_mod.track_step_pre(state.tracker, pyr, grads, cfg,
                                           do_topup=do_topup)

    merged = jax.lax.cond(
        state.has_pending,
        lambda: marg.merge_chunks(state.pending, chunk),
        lambda: chunk)

    # 30 Hz motion-only pose on every frame (reference USE_PNP path).
    # On backend frames the published pose is the backend's and the pnp
    # window is immediately re-anchored to it (_sync_pnp below), so the
    # motion-only SOLVE is skipped there — the window still slides,
    # ingests, and dead-reckons for continuity.
    if use_pnp:
        mode = cfg.solver.pnp_stream_solve
        do_solve = (True if mode == "all"
                    else False if mode == "deadreckon"
                    else ~is_backend)
        obs_l, has_l = _gather_by_id(
            state.est.feats.track_id, front.ids, front.obs, front.obs_valid)
        pnp, (p30, q30, _v30) = pnp_mod.pnp_step(
            state.pnp, chunk, obs_l, has_l, cfg, ext, gravity,
            do_solve=do_solve,
            update_preints=(mode != "deadreckon"))
    else:
        pnp = state.pnp
        p30 = state.est.window.p[F - 1]
        q30 = state.est.window.q[F - 1]
    M = cfg.window.max_landmarks

    def do_backend(operand):
        est, pnp_in, loop_in = operand
        inp = FrameInput(chunk=merged, ids=front.ids, obs=front.obs,
                         obs_valid=front.obs_valid, loop=loop_in,
                         iter_budget=state.solver_budget)
        est2, out = backend_step(est, inp, cfg, ext, gravity)
        # Freeze on failure (host decides recovery between blocks).
        est2 = jax.tree.map(
            lambda a, b: jnp.where(out.failure, a, b), est, est2)
        pnp2 = _sync_pnp(pnp_in, est2, cfg, ext)
        # Keyframe harvest in tracker-slot order (pipeline._kf_prep_impl).
        win = est2.window
        pts_w = landmark_world_points(win, est2.feats, ext)
        pts_w_t, has_t = _gather_by_id(
            tracker.ids, est2.feats.track_id, pts_w,
            est2.feats.valid & (win.inv_depth > 1e-3))
        # Loop-constraint lifecycle (track-anchored, see LoopInput): the
        # constraint persists while enough matched tracks survive in the
        # landmark table and its TTL (≈ a window's worth of solves, the
        # reference's in-window residence) hasn't run out; retirement
        # triggers the host-side 4-DoF pose graph between blocks.
        active = loop_in.weight > 0
        ttl2 = jnp.where(active, loop_in.ttl - 1, loop_in.ttl)
        retired = active & ((ttl2 <= 0) | (out.loop_support < 10))
        loop2 = loop_in._replace(
            ttl=ttl2,
            weight=jnp.where(retired | out.failure, 0.0, loop_in.weight))
        # Published cloud in fp16: the per-block [N,M,3] host fetch is
        # bandwidth-bound over the tunneled link and mm-level precision
        # is ample for the viz/AR consumers.
        return (est2, pnp2, loop2, out.pose_p, out.pose_q,
                out.is_keyframe, out.failure, out.stats.final_cost,
                pts_w_t, has_t & tracker.valid,
                out.point_cloud.astype(jnp.float16),
                out.point_valid, out.loop_good & active, out.loop_rel_t,
                out.loop_rel_yaw, retired)

    def skip_backend(operand):
        est, pnp_in, loop_in = operand
        return (est, pnp_in, loop_in, p30, q30, jnp.asarray(False),
                jnp.asarray(False), jnp.zeros((), dtype),
                jnp.zeros((Mw, 3), dtype), jnp.zeros((Mw,), bool),
                jnp.zeros((M, 3), jnp.float16), jnp.zeros((M,), bool),
                jnp.asarray(False), jnp.zeros((3,), dtype),
                jnp.zeros((), dtype), jnp.asarray(False))

    (est, pnp, loop, p_out, q_out, is_kf, failure, cost, kf_pts_w,
     kf_w_ok, pcl, pcl_ok, loop_good, loop_rel_t, loop_rel_yaw,
     loop_retired) = jax.lax.cond(is_backend, do_backend, skip_backend,
                                  (state.est, pnp, state.loop))

    new_state = ScanState(
        tracker=tracker, pnp=pnp, est=est,
        pending=jax.tree.map(
            lambda m, z: jnp.where(is_backend, z, m), merged,
            jax.tree.map(jnp.zeros_like, merged)),
        has_pending=~is_backend,
        phase=(state.phase + 1) % cfg.freq,
        loop=loop,
        solver_budget=state.solver_budget)

    f32 = jnp.float32
    packed = jnp.concatenate([
        p_out.astype(f32), q_out.astype(f32),
        jnp.stack([cost.astype(f32), is_backend.astype(f32),
                   is_kf.astype(f32), failure.astype(f32),
                   front.n_tracked.astype(f32), loop_good.astype(f32),
                   loop_rel_yaw.astype(f32), loop_retired.astype(f32)]),
        loop_rel_t.astype(f32)])
    out = ScanOutput(
        p=p_out, q=q_out, is_backend=is_backend, is_keyframe=is_kf,
        failure=failure, solver_cost=cost, n_tracked=front.n_tracked,
        kf_pts_px=tracker.pts, kf_valid=tracker.valid,
        kf_pts_w=kf_pts_w, kf_w_ok=kf_w_ok, kf_ids=tracker.ids,
        point_cloud=pcl, point_valid=pcl_ok,
        loop_good=loop_good, loop_rel_t=loop_rel_t,
        loop_rel_yaw=loop_rel_yaw, loop_retired=loop_retired,
        packed=packed)
    return new_state, out


def run_vio_scan(state: ScanState, imgs: jax.Array,
                 chunks: pre_mod.ImuChunk, cfg: VinsConfig,
                 ext: Extrinsics, gravity: jax.Array,
                 use_pnp: bool = True,
                 unroll: int = 1) -> Tuple[ScanState, ScanOutput]:
    """Scan a whole staged block of frames: imgs [N,H,W], chunks [N,...].
    ONE compiled program; jit and reuse across blocks. Frame-independent
    image prep runs batched up front (precompute_block); only the truly
    sequential per-frame pipeline runs in the scan.

    unroll: lax.scan body unroll factor (freq unrolls one full backend
    period per scan iteration, trading compile time for per-step
    overhead)."""
    pyrs, grads = precompute_block(imgs, cfg)

    def f(s, xs):
        pyr, grad, chunk = xs
        return vio_scan_step(s, pyr, grad, chunk, cfg, ext, gravity,
                             use_pnp)

    return jax.lax.scan(f, state, (pyrs, grads, chunks), unroll=unroll)
