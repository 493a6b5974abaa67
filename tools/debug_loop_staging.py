"""Diagnose why streaming-mode pose-graph runs are rare (r5).

Runs a shortened soak (600 frames, 240x320) through process_stream and
prints, per block: verified hits, staging attempts + the slot-join
support each saw, pending-loop rides/retirements, and pose-graph runs.

  JAX_PLATFORMS=cpu python tools/debug_loop_staging.py [n_frames]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main(n_frames=600):
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from conftest import render_cached
    from test_soak import soak_config
    from vins_tpu.pipeline import VinsSystem

    cfg = soak_config()
    seq, imgs = render_cached(cfg, n_frames=n_frames, seed=29,
                              frame_dt=1.0 / 30.0,
                              traj_kwargs=dict(w=0.7, bob=0.2),
                              imu_per_frame=4)

    sys_ = VinsSystem(cfg, use_loop=True, ext=seq.ext)

    # --- instrumentation ---------------------------------------------------
    stats = dict(stage_try=0, stage_ok=0, supports=[], retire=0,
                 opt_calls=0, edge_refines=0)
    orig_stage = sys_._stage_anchor_from_hit

    def stage_spy(hit):
        stats["stage_try"] += 1
        out = orig_stage(hit)
        stats["stage_ok"] += 1
        return out

    sys_._stage_anchor_from_hit = stage_spy

    orig_upd = sys_.loop.update_loop_edge

    def upd_spy(e, t_rel, yaw_rel, j=None):
        stats["edge_refines"] += 1
        return orig_upd(e, t_rel, yaw_rel, j=j)

    sys_.loop.update_loop_edge = upd_spy

    orig_opt = sys_.loop.optimize

    def opt_spy(*a, **k):
        stats["opt_calls"] += 1
        out = orig_opt(*a, **k)
        sys_.loop.sync_drift()
        print(f"[opt {stats['opt_calls']}] t_drift="
              f"{np.round(sys_.loop.t_drift, 3)} "
              f"|t_drift|={np.linalg.norm(sys_.loop.t_drift):.3f}")
        return out

    sys_.loop.optimize = opt_spy

    outs = sys_.process_stream(jnp.asarray(imgs),
                               jax.tree.map(jnp.asarray, seq.chunks),
                               block=48, ts=seq.timestamps)
    lc = sys_.loop
    from vins_tpu.io import evaluate
    init_at = next((i for i, o in enumerate(outs) if o.initialized), 0)
    est_p = np.stack([o.p for o in outs[init_at:]])
    raw_p = np.stack([o.p_raw for o in outs[init_at:]])
    gt = np.asarray(seq.p[init_at:len(outs)])
    print(f"published ATE={evaluate.ate_rmse(est_p, gt).rmse:.3f} "
          f"raw ATE={evaluate.ate_rmse(raw_p, gt).rmse:.3f} "
          f"|t_drift|end={np.linalg.norm(lc.t_drift):.3f}")
    sup = stats["supports"]
    print(f"frames={len(outs)} kf_uids={lc._next_uid} "
          f"db_count={lc.count} gen={lc.generation}")
    print(f"verified edges: n_loops={lc.n_loops} "
          f"evicted={lc.n_edges_evicted}")
    print(f"stage attempts={stats['stage_try']} ok={stats['stage_ok']} "
          f"edge_refines={stats['edge_refines']}")
    if sup:
        print(f"slot-join support: min={min(sup)} med={np.median(sup)} "
              f"max={max(sup)} all={sup[:50]}")
    print(f"optimize calls={stats['opt_calls']} "
          f"n_optimizes={lc.n_optimizes}")
    w = float(np.asarray(lc.graph.loop_w[:lc.n_loops]).max()) \
        if lc.n_loops else 0.0
    print(f"max loop edge weight={w} (1.0 = refined)")

    # Refined-edge quality vs ground truth: for every full-weight edge
    # (i, j), compare its measured (t_rel, yaw_rel) against the GT
    # relative pose at the two keyframes' capture stamps.
    ts = np.asarray(seq.timestamps)
    gt_p = np.asarray(seq.p)
    def yaw_of(q):
        w_, x, y, z = q
        return np.arctan2(2 * (w_ * z + x * y), 1 - 2 * (y * y + z * z))
    gt_yaw = np.array([yaw_of(np.asarray(q)) for q in np.asarray(seq.q)])
    li = np.asarray(lc.graph.loop_i[:lc.n_loops])
    lj = np.asarray(lc.graph.loop_j[:lc.n_loops])
    lt = np.asarray(lc.graph.loop_t[:lc.n_loops])
    ly = np.asarray(lc.graph.loop_yaw[:lc.n_loops])
    lw = np.asarray(lc.graph.loop_w[:lc.n_loops])
    for e in np.flatnonzero(lw > 0.5):
        i, j = int(li[e]), int(lj[e])
        fi = int(np.argmin(np.abs(ts - lc._kf_t_np[i])))
        fj = int(np.argmin(np.abs(ts - lc._kf_t_np[j])))
        yi = gt_yaw[fi]
        c, s = np.cos(yi), np.sin(yi)
        RzT = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
        t_gt = RzT @ (gt_p[fj] - gt_p[fi])
        y_gt = gt_yaw[fj] - yi
        y_gt = np.arctan2(np.sin(y_gt), np.cos(y_gt))
        dy = float(ly[e]) - y_gt
        dy = np.arctan2(np.sin(dy), np.cos(dy))
        print(f"refined edge {e}: i={i}(f{fi}) j={j}(f{fj}) "
              f"t_err={np.linalg.norm(lt[e] - t_gt):.3f} "
              f"yaw_err={np.degrees(dy):.2f}deg "
              f"|t_meas|={np.linalg.norm(lt[e]):.2f} "
              f"|t_gt|={np.linalg.norm(t_gt):.2f}")
    print(f"stage_queue leftover={len(sys_._stage_queue)} "
          f"pending_loop={sys_._pending_loop is not None}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
