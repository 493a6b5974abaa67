"""KLT front-end: the FeatureTracker equivalent as a pure jitted step.

Re-design of FeatureTracker::readImage (reference
feature_tracker.cpp:162-310): CLAHE equalization → pyramid build →
pyramidal LK tracking → fundamental-RANSAC outlier culling →
track-length-prioritized occupancy mask → Shi–Tomasi top-up to the
feature budget → id assignment → normalized outputs for the backend.

All per-frame state (previous pyramid, tracked points, ids, track
lengths) lives in a `TrackerState` pytree; one compiled `track_step`
replaces the reference's stateful class, and the slot tables line up 1:1
with the backend's `FrameInput` (ids match across frames, which is how
`ingest_frame` associates observations into tracks).
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import VinsConfig
from ..utils import camera as cam_mod
from ..ops import corners as corners_mod
from ..ops import image as image_mod
from ..ops import klt as klt_mod
from ..ops import ransac as ransac_mod


class TrackerState(NamedTuple):
    pyr: Tuple[jax.Array, ...]   # previous frame pyramid (static tuple)
    # Previous frame's per-level (gx, gy) Scharr gradients: cached so the
    # forward LK pass never recomputes them (each frame's gradients are
    # computed once — when it enters as the CURRENT frame) and the
    # streaming scan can feed block-precomputed gradients.
    grads: Tuple[Tuple[jax.Array, jax.Array], ...]
    pts: jax.Array               # [M, 2] pixel positions
    ids: jax.Array               # [M] int32 (-1 free)
    track_cnt: jax.Array         # [M] frames tracked
    valid: jax.Array             # [M] bool
    next_id: jax.Array           # [] int32
    key: jax.Array               # PRNG key for RANSAC sampling


class FrontendOutput(NamedTuple):
    ids: jax.Array        # [M]
    obs: jax.Array        # [M, 2] normalized camera-plane coords
    obs_valid: jax.Array  # [M]
    pts_px: jax.Array     # [M, 2] pixel coords (viz)
    n_tracked: jax.Array  # []


def _empty_pyramid(cfg: VinsConfig):
    H, W = cfg.camera.height, cfg.camera.width
    return tuple(jnp.zeros((H >> l, W >> l), jnp.float32)
                 for l in range(cfg.frontend.pyramid_levels))


def _empty_grads(cfg: VinsConfig):
    return tuple((jnp.zeros_like(p), jnp.zeros_like(p))
                 for p in _empty_pyramid(cfg))


def fresh_state(cfg: VinsConfig, seed: int = 0) -> TrackerState:
    M = cfg.frontend.max_features
    return TrackerState(
        pyr=_empty_pyramid(cfg),
        grads=_empty_grads(cfg),
        pts=jnp.zeros((M, 2), jnp.float32),
        ids=jnp.full((M,), -1, jnp.int32),
        track_cnt=jnp.zeros((M,), jnp.int32),
        valid=jnp.zeros((M,), bool),
        next_id=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed))


def _top_up(pts, ids, track_cnt, valid, next_id, img_eq, cfg: VinsConfig):
    """Detect new corners in unoccupied areas and fill free slots."""
    fe = cfg.frontend
    M = fe.max_features
    need = fe.target_features - jnp.sum(valid)

    occ = corners_mod.occupancy_cells(img_eq.shape, pts, valid,
                                      fe.min_distance)
    resp = corners_mod.shi_tomasi_response(img_eq)
    pick = corners_mod.select_corners_grid(resp, occ, fe.target_features,
                                           fe.min_distance)
    want = pick.valid & (jnp.arange(pick.pts.shape[0]) < need)

    # Allocate into free slots.
    is_free = ~valid
    order = jnp.argsort(~is_free, stable=True).astype(jnp.int32)
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    n_free = jnp.sum(is_free.astype(jnp.int32))
    can = want & (rank < n_free)
    slot = order[jnp.clip(rank, 0, M - 1)]
    slot_c = jnp.where(can, slot, M)

    K = pick.pts.shape[0]
    new_ids = next_id + jnp.cumsum(can.astype(jnp.int32)) - 1
    pts = pts.at[slot_c].set(pick.pts, mode="drop")
    ids = ids.at[slot_c].set(new_ids, mode="drop")
    track_cnt = track_cnt.at[slot_c].set(jnp.ones(K, jnp.int32), mode="drop")
    valid = valid.at[slot_c].set(jnp.ones(K, bool), mode="drop")
    next_id = next_id + jnp.sum(can.astype(jnp.int32))
    return pts, ids, track_cnt, valid, next_id


def init_step(state: TrackerState, img: jax.Array,
              cfg: VinsConfig) -> Tuple[TrackerState, FrontendOutput]:
    """First frame: equalize, build pyramid, detect initial corners."""
    fe = cfg.frontend
    img_eq = image_mod.clahe(img, fe.clahe_clip, fe.clahe_grid,
                            fe.clahe_bins)
    pyr = tuple(image_mod.build_pyramid(img_eq, fe.pyramid_levels))
    grads = tuple(image_mod.sobel_gradients(p) for p in pyr)
    M = fe.max_features
    pts = jnp.zeros((M, 2), jnp.float32)
    ids = jnp.full((M,), -1, jnp.int32)
    cnt = jnp.zeros((M,), jnp.int32)
    valid = jnp.zeros((M,), bool)
    pts, ids, cnt, valid, next_id = _top_up(
        pts, ids, cnt, valid, state.next_id, img_eq, cfg)
    new_state = TrackerState(pyr=pyr, grads=grads, pts=pts, ids=ids,
                             track_cnt=cnt, valid=valid, next_id=next_id,
                             key=state.key)
    out = _make_output(new_state, cfg)
    return new_state, out


def _make_output(state: TrackerState, cfg: VinsConfig) -> FrontendOutput:
    obs = cam_mod.pixel_to_normalized(cfg.camera, state.pts)
    return FrontendOutput(
        ids=jnp.where(state.valid, state.ids, -1),
        obs=obs, obs_valid=state.valid, pts_px=state.pts,
        n_tracked=jnp.sum(state.valid))


def track_step(state: TrackerState, img: jax.Array, cfg: VinsConfig,
               do_topup=True) -> Tuple[TrackerState, FrontendOutput]:
    """Track the previous features into `img`, cull, top-up.

    Per-frame image prep (CLAHE, pyramid, gradients) is computed here;
    the streaming scan precomputes it for a whole block in one batched
    program and calls track_step_pre instead."""
    fe = cfg.frontend
    img_eq = image_mod.clahe(img, fe.clahe_clip, fe.clahe_grid,
                            fe.clahe_bins)
    pyr = tuple(image_mod.build_pyramid(img_eq, fe.pyramid_levels))
    grads = tuple(image_mod.sobel_gradients(p) for p in pyr)
    return track_step_pre(state, pyr, grads, cfg, do_topup)


def track_step_pre(state: TrackerState, pyr, grads, cfg: VinsConfig,
                   do_topup=True) -> Tuple[TrackerState, FrontendOutput]:
    """track_step with the frame's image prep (pyramid + gradients)
    already computed — the scan path feeds block-precomputed prep.

    do_topup: detect replacement corners only when set (bool or traced
    scalar). The reference tops up only every FREQ-th frame — the frames
    handed to the backend (feature_tracker.cpp:231-307, img_cnt==0) —
    and the Shi-Tomasi sweep is ~20% of the per-frame front-end cost, so
    the streaming scan gates it on the backend cadence."""
    fe = cfg.frontend
    img_eq = pyr[0]

    res = klt_mod.track_pyramid_fb(list(state.pyr), list(pyr), state.pts,
                                   state.valid, fe,
                                   grads_prev=list(state.grads),
                                   grads_next=list(grads))
    valid = res.status

    # Fundamental-RANSAC outlier rejection on normalized coords
    # (reference rejectWithF, feature_tracker.cpp:89-105).
    prev_n = cam_mod.pixel_to_normalized(cfg.camera, state.pts)
    cur_n = cam_mod.pixel_to_normalized(cfg.camera, res.pts)
    key, sub = jax.random.split(state.key)
    thresh = (fe.f_ransac_thresh / cfg.camera.focal) ** 2
    rr = ransac_mod.ransac_fundamental(prev_n, cur_n, valid, sub,
                                       fe.f_ransac_hyps, thresh)
    # Only cull when RANSAC is meaningful (enough tracks).
    use_f = jnp.sum(valid) >= 12
    valid = jnp.where(use_f, valid & rr.inliers, valid)

    ids = jnp.where(valid, state.ids, -1)
    cnt = jnp.where(valid, state.track_cnt + 1, 0)
    if isinstance(do_topup, bool) and do_topup:
        pts, ids, cnt, valid2, next_id = _top_up(
            res.pts, ids, cnt, valid, state.next_id, img_eq, cfg)
    elif isinstance(do_topup, bool):
        pts, valid2, next_id = res.pts, valid, state.next_id
    else:
        pts, ids, cnt, valid2, next_id = jax.lax.cond(
            do_topup,
            lambda a: _top_up(*a, img_eq, cfg),
            lambda a: a,
            (res.pts, ids, cnt, valid, state.next_id))

    new_state = TrackerState(pyr=tuple(pyr), grads=tuple(grads), pts=pts,
                             ids=ids, track_cnt=cnt, valid=valid2,
                             next_id=next_id, key=key)
    return new_state, _make_output(new_state, cfg)


class FeatureTracker:
    """Host shell holding the compiled init/track steps."""

    def __init__(self, cfg: VinsConfig, seed: int = 0):
        self.cfg = cfg
        self.state = fresh_state(cfg, seed)
        self.started = False
        self._init = jax.jit(lambda s, i: init_step(s, i, cfg))
        self._track = jax.jit(
            lambda s, i, t: track_step(s, i, cfg, do_topup=t))

    def process(self, img: jax.Array,
                do_topup: bool = True) -> FrontendOutput:
        if not self.started:
            self.state, out = self._init(self.state, img)
            self.started = True
        else:
            self.state, out = self._track(self.state, img,
                                          jnp.asarray(do_topup))
        return out
