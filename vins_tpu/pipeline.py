"""Full-system orchestration: camera/IMU in → poses, map, loops out.

The functional equivalent of the reference's ViewController
(ViewController.mm, SURVEY.md §2.1 "Orchestrator"): where the reference
wires five threads with queues and mutexes, this pipeline is an explicit
per-frame host loop over jitted device programs:

  per camera frame (30 Hz):
    FeatureTracker.track_step  (frontend)           feature_tracker.cpp:162
    vinsPnP pnp_step           (30 Hz pose)         vins_pnp.cpp:264
  every `freq`-th frame (10 Hz):
    backend_step               (window solve)       VINS.cpp:377-830
    feedback: solved pose/biases anchor the pnp window; solved landmark
    world points refresh its fixed map               ViewController.mm:731-758
  every LOOP_FREQ-th keyframe (~1 Hz):
    LoopCloser.add_keyframe + detect                ViewController.mm:786-983
    on hit: optimize 4-DoF pose graph → drift       keyfame_database.cpp:140

State machine: INITIAL (accumulate frames, attempt visual-inertial
bootstrap) → NON_LINEAR (sliding-window VIO) → on failure: clearState,
new trajectory segment, re-enter INITIAL (VINS.cpp:463-467).
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import VinsConfig
from .core import feature_manager as fm
from .core import initialization as init_mod
from .core import pnp as pnp_mod
from .core import preintegration as pre_mod
from .core.estimator import BackendState, FrameInput, backend_step, \
    landmark_world_points
from .core.factors import Extrinsics
from .core.state import FeatureTable
from .frontend.tracker import FeatureTracker
from .loop.keyframe_db import LoopCloser
from .utils import lie


def _np_quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Host-side quaternion (w,x,y,z) → rotation matrix (numpy only: the
    drift-correct path runs per frame and must not dispatch device ops)."""
    w, x, y, z = [float(v) for v in q]
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def _np_rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Host-side rotation matrix → quaternion (w,x,y,z), Shepperd's
    branch-free-enough variant."""
    t = float(np.trace(R))
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        v = np.zeros(3)
        v[i] = 0.25 * s
        v[j] = (R[j, i] + R[i, j]) / s
        v[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = v
    q = np.array([w, x, y, z], np.float32)
    return q / np.linalg.norm(q)


class PipelineOutput(NamedTuple):
    """Per-frame result published to the consumer (viz/AR/eval)."""

    t: float
    p: np.ndarray            # [3] drift-corrected position
    q: np.ndarray            # [4]
    p_raw: np.ndarray        # [3] raw VIO position (pre loop correction)
    is_keyframe: bool
    initialized: bool
    n_tracked: int
    solver_cost: float
    loop_hit: Optional[int]  # matched old keyframe index, if any


@dataclasses.dataclass
class _BootFrame:
    ids: jnp.ndarray
    obs: jnp.ndarray
    valid: jnp.ndarray
    chunk: pre_mod.ImuChunk


class VinsSystem:
    """End-to-end VIO/SLAM system on one device."""

    def __init__(self, cfg: VinsConfig, seed: int = 0,
                 use_pnp: bool = True, use_loop: bool = True,
                 ext: Optional[Extrinsics] = None):
        self.cfg = cfg
        cam = cfg.camera
        self.ext = ext if ext is not None else Extrinsics(
            tic=jnp.asarray(cam.tic, jnp.float32),
            qic=lie.rotmat_to_quat(lie.ypr_to_rotmat(
                jnp.asarray(cam.ric_ypr, jnp.float32))))
        self.gravity = jnp.array([0.0, 0.0, cfg.imu.gravity], jnp.float32)

        self.tracker = FeatureTracker(cfg, seed)
        self.use_pnp = use_pnp
        self.use_loop = use_loop and cfg.loop.enabled
        self.loop = LoopCloser(cfg, seed, ext=(self.ext.tic, self.ext.qic)) \
            if self.use_loop else None

        self._backend_step = jax.jit(
            lambda est, inp: backend_step(est, inp, cfg, self.ext,
                                          self.gravity))
        self._pnp_step = jax.jit(
            lambda w, c, o, m: pnp_mod.pnp_step(w, c, o, m, cfg, self.ext,
                                                self.gravity))
        self._ingest = jax.jit(fm.ingest_frame)
        self._refine_init = None  # compiled lazily on first init attempt

        from .core import marginalization as marg
        self._merge_jit = jax.jit(marg.merge_chunks)

        F = cfg.window.num_frames
        S = cfg.window.pnp_size + 1

        def _sync_pnp_impl(pnp, est):
            win = est.window
            pnp = pnp_mod.anchor_from_backend(
                pnp, jnp.asarray(S - 1), win.p[F - 1], win.q[F - 1],
                win.v[F - 1], win.ba[F - 1], win.bg[F - 1])
            pts_w = landmark_world_points(win, est.feats, self.ext)
            valid = est.feats.valid & (win.inv_depth > 1e-3)
            track_len = jnp.sum(est.feats.mask, axis=0)
            return pnp_mod.update_features(pnp, pts_w, valid, track_len)

        self._sync_pnp_jit = jax.jit(_sync_pnp_impl)

        def _kf_prep_impl(est, tracker_state):
            """World points in tracker-slot order + newest pose, one
            device program (feeds LoopCloser.add_keyframe)."""
            win = est.window
            pts_w = landmark_world_points(win, est.feats, self.ext)
            pts_w_t, has_t = VinsSystem._gather_by_id(
                tracker_state.ids, est.feats.track_id, pts_w,
                est.feats.valid & (win.inv_depth > 1e-3))
            return (pts_w_t, has_t & tracker_state.valid,
                    win.p[F - 1], win.q[F - 1])

        self._kf_prep_jit = jax.jit(_kf_prep_impl)

        self.reset()

    # -- lifecycle ----------------------------------------------------------

    def reset(self):
        cfg = self.cfg
        F = cfg.window.num_frames
        S = cfg.window.pnp_size + 1
        # The motion-only tracker's fixed map lives in BACKEND landmark
        # slot order (update_features copies the backend table wholesale).
        L = cfg.window.max_landmarks
        self.initialized = False
        self.est = BackendState.fresh(cfg)
        self.boot: List[_BootFrame] = []
        self.pnp = pnp_mod.PnpWindow(
            state=pnp_mod.PnpState.identity(S),
            feats=pnp_mod.PnpFeatures.empty(S, L),
            chunks=jax.tree.map(
                lambda x: jnp.tile(x[None], (S - 1,) + (1,) * x.ndim),
                pre_mod.ImuChunk.empty(cfg.window.max_imu_per_edge)),
            anchored=jnp.zeros((S,), bool))
        self.frame_idx = 0
        self.kf_count = 0
        self._pending_chunk: Optional[pre_mod.ImuChunk] = None
        self.trajectory: List[np.ndarray] = []

    def _fail_reset(self):
        """Failure recovery (VINS.cpp:463-467 + segment bump)."""
        if self.loop is not None:
            self.loop.new_segment()
        self.reset()

    # -- helpers ------------------------------------------------------------

    def _merge_pending(self, chunk: pre_mod.ImuChunk) -> pre_mod.ImuChunk:
        if self._pending_chunk is None:
            return chunk
        return self._merge_jit(self._pending_chunk, chunk)

    @staticmethod
    @jax.jit
    def _gather_by_id(dst_ids, src_ids, src_vals, src_valid):
        """For each dst id, pull the matching src slot's value.
        Returns (vals_in_dst_order, found_mask)."""
        eq = ((dst_ids[:, None] == src_ids[None, :])
              & (src_ids[None, :] >= 0) & src_valid[None, :]
              & (dst_ids[:, None] >= 0))
        has = jnp.any(eq, axis=1)
        j = jnp.argmax(eq, axis=1)
        return jax.tree.map(lambda v: v[j], src_vals), has

    def _drift_correct(self, p: np.ndarray, q: np.ndarray):
        """Apply the pose-graph drift on HOST arrays (numpy only — this
        runs every frame; device ops here would cost a dispatch round
        trip each)."""
        if self.loop is None:
            return p, q
        R = self.loop.r_drift
        t = self.loop.t_drift
        p2 = (R @ p + t).astype(np.float32)
        q2 = _np_rotmat_to_quat(R @ _np_quat_to_rotmat(q))
        return p2, q2

    # -- main entry ---------------------------------------------------------

    def process_frame(self, img: jnp.ndarray, chunk: pre_mod.ImuChunk,
                      t: float = 0.0) -> PipelineOutput:
        """One camera frame + the IMU chunk since the previous frame."""
        cfg = self.cfg
        F = cfg.window.num_frames

        front = self.tracker.process(img)

        is_backend_frame = (self.frame_idx % cfg.freq) == 0
        self.frame_idx += 1

        if not self.initialized:
            out = self._process_boot(img, front, chunk, t, is_backend_frame)
        else:
            out = self._process_nonlinear(img, front, chunk, t,
                                          is_backend_frame)
        self.trajectory.append(out.p)
        return out

    # -- INITIAL ------------------------------------------------------------

    def _process_boot(self, img, front, chunk, t, is_backend_frame
                      ) -> PipelineOutput:
        cfg = self.cfg
        F = cfg.window.num_frames
        merged = self._merge_pending(chunk)
        if not is_backend_frame:
            self._pending_chunk = merged
            return self._null_output(t, front)
        self._pending_chunk = None

        self.boot.append(_BootFrame(ids=front.ids, obs=front.obs,
                                    valid=front.obs_valid, chunk=merged))
        if len(self.boot) > F:
            self.boot.pop(0)
        if len(self.boot) < F:
            return self._null_output(t, front)

        # Assemble the boot window and attempt initialization.
        L = cfg.window.max_landmarks
        feats = FeatureTable.empty(F, L)
        for f, bf in enumerate(self.boot):
            feats = self._ingest(feats, jnp.asarray(f), bf.ids, bf.obs,
                                 bf.valid)
        chunks = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[bf.chunk for bf in self.boot[1:]])
        res = init_mod.initialize(feats, chunks, self.ext, cfg)
        if res.status is not init_mod.InitStatus.SUCCESS:
            self.boot.pop(0)  # slide and retry next backend frame
            return self._null_output(t, front, status=res.status.name)

        # Accepting solve (VINS.cpp:415-443): joint refinement rounds pull
        # the alignment's approximate scale into IMU consistency; gate on
        # the final cost.
        if self._refine_init is None:
            self._refine_init = jax.jit(
                lambda w, fe, ch: init_mod.refine_init_window(
                    w, fe, ch, self.ext, cfg))
        window, cost = self._refine_init(res.window, feats, chunks)
        if not np.isfinite(float(cost)) or float(cost) > cfg.init_max_cost:
            self.boot.pop(0)
            return self._null_output(t, front, status="FAIL_CHECK")

        self.est = BackendState.bootstrap(cfg, window, feats, chunks,
                                          self.ext, self.gravity)
        self.initialized = True
        self.boot.clear()
        self._sync_pnp_from_backend()
        p_raw, q_raw, ntr = jax.device_get(
            (window.p[F - 1], window.q[F - 1], front.n_tracked))
        p, q = self._drift_correct(p_raw, q_raw)
        return PipelineOutput(
            t=t, p=p, q=q, p_raw=p_raw,
            is_keyframe=True, initialized=True, n_tracked=int(ntr),
            solver_cost=float(cost), loop_hit=None)

    # -- NON_LINEAR ---------------------------------------------------------

    def _process_nonlinear(self, img, front, chunk, t, is_backend_frame
                           ) -> PipelineOutput:
        cfg = self.cfg
        F = cfg.window.num_frames
        merged = self._merge_pending(chunk)

        # 30 Hz motion-only pose on every frame (reference USE_PNP path).
        if self.use_pnp:
            # Re-order the frontend's observations into backend landmark
            # slots (the pnp map lives in that order).
            obs_l, has_l = self._gather_by_id(
                self.est.feats.track_id, front.ids, front.obs,
                front.obs_valid)
            self.pnp, (p30, q30, v30) = self._pnp_step(
                self.pnp, chunk, obs_l, has_l)

        if not is_backend_frame:
            self._pending_chunk = merged
            if self.use_pnp:
                # ONE host↔device round trip for everything this frame
                # needs on the host.
                p30_h, q30_h, ntr = jax.device_get(
                    (p30, q30, front.n_tracked))
                p, q = self._drift_correct(p30_h, q30_h)
                return PipelineOutput(
                    t=t, p=p, q=q, p_raw=p30_h, is_keyframe=False,
                    initialized=True, n_tracked=int(ntr),
                    solver_cost=0.0, loop_hit=None)
            return self._null_output(t, front, initialized=True)

        self._pending_chunk = None
        inp = FrameInput(chunk=merged, ids=front.ids, obs=front.obs,
                         obs_valid=front.obs_valid)
        self.est, out = self._backend_step(self.est, inp)

        # Single combined fetch of every scalar/pose the host logic reads.
        failure, is_kf, pose_p, pose_q, cost, ntr = jax.device_get(
            (out.failure, out.is_keyframe, out.pose_p, out.pose_q,
             out.stats.final_cost, front.n_tracked))

        if bool(failure):
            self._fail_reset()
            return self._null_output(t, front, status="FAILURE")

        self._sync_pnp_from_backend()

        loop_hit = None
        if self.use_loop and bool(is_kf):
            self.kf_count += 1
            if self.kf_count % cfg.loop.loop_freq == 0:
                loop_hit = self._handle_keyframe(img, out)

        p, q = self._drift_correct(pose_p, pose_q)
        return PipelineOutput(
            t=t, p=p, q=q, p_raw=pose_p,
            is_keyframe=bool(is_kf), initialized=True,
            n_tracked=int(ntr), solver_cost=float(cost),
            loop_hit=loop_hit)

    def _sync_pnp_from_backend(self):
        """Anchor the pnp window with the newest backend solution and
        refresh its fixed landmark map (ViewController.mm:731-758)."""
        if not self.use_pnp:
            return
        self.pnp = self._sync_pnp_jit(self.pnp, self.est)

    def _handle_keyframe(self, img, out) -> Optional[int]:
        """Insert keyframe + loop detect + pose-graph optimize."""
        pts_w_t, ok_t, kf_p, kf_q = self._kf_prep_jit(
            self.est, self.tracker.state)
        idx = self.loop.add_keyframe(
            img, kf_p, kf_q, self.tracker.state.pts,
            self.tracker.state.valid, pts_w_t, ok_t)
        hit = self.loop.detect(idx)
        if hit is not None:
            self.loop.optimize()
            return hit.old_idx
        return None

    def _null_output(self, t, front, status: str = "",
                     initialized: bool = False) -> PipelineOutput:
        return PipelineOutput(
            t=t, p=np.zeros(3, np.float32), q=np.array([1, 0, 0, 0],
                                                       np.float32),
            p_raw=np.zeros(3, np.float32), is_keyframe=False,
            initialized=initialized, n_tracked=int(front.n_tracked),
            solver_cost=0.0, loop_hit=None)
