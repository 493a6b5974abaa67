"""Run the full VIO/SLAM pipeline on a EuRoC MAV sequence (ASL layout).

Usage:
  python examples/run_euroc.py --root /data/euroc/MH_01_easy \
      [--frames 500] [--out /tmp/vins_euroc]

Evaluates ATE-RMSE against the sequence ground truth when present
(the BASELINE.md accuracy metric).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--out", default="/tmp/vins_euroc")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--native-loader", action="store_true",
                    help="use the C++ prefetching dataset loader")
    ap.add_argument("--stream", action="store_true",
                    help="fused block-scan replay once initialized "
                         "(one device program per 48 frames)")
    ap.add_argument("--dislocal", type=int, default=0,
                    help="override loop dislocal window (keyframe rows); "
                         "short fixtures need a smaller exclusion than "
                         "the minute-scale default")
    ap.add_argument("--loop-freq", type=int, default=0,
                    help="override loop insertion cadence (every Nth "
                         "keyframe)")
    ap.add_argument("--global-ba", action="store_true",
                    help="end-of-run global bundle adjustment over the "
                         "keyframe map (LoopCloser.global_ba — the role "
                         "of keyfame_database.cpp:140-356's global "
                         "optimization); reports keyframe ATE before/"
                         "after when ground truth is present")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    from vins_tpu import euroc_config
    from vins_tpu.io import euroc, evaluate
    from vins_tpu.io.replay import Recorder
    from vins_tpu.pipeline import VinsSystem

    cfg = euroc_config()
    if args.dislocal or args.loop_freq:
        import dataclasses
        over = {}
        if args.dislocal:
            over["dislocal"] = args.dislocal
        if args.loop_freq:
            over["loop_freq"] = args.loop_freq
        cfg = cfg.replace(loop=dataclasses.replace(cfg.loop, **over))
    data = euroc.load_euroc(args.root)
    n = len(data.cam_ts) - args.start if args.frames == 0 else args.frames
    print(f"{len(data.cam_ts)} frames, {len(data.imu_ts)} IMU samples; "
          f"running {n} from {args.start}")

    if args.native_loader:
        from vins_tpu.io.native_loader import NativeEurocLoader
        frames = NativeEurocLoader(data, cfg, start=args.start, count=n)
    else:
        frames = euroc.align_measurements(data, cfg, start=args.start,
                                          count=n)
        frames = ((f, euroc.load_gray_png(f.image_path)) for f in frames)

    sys_ = VinsSystem(cfg, use_loop=not args.no_loop)
    rec = Recorder()
    gt_pairs = []
    gt_by_t = {}
    t0 = time.perf_counter()
    k = 0

    def publish(out, gt_p):
        nonlocal k
        rec.add(t=out.t, p=out.p, q=out.q, initialized=out.initialized)
        if out.initialized and gt_p is not None:
            # (drift-corrected p, raw VIO p, gt): the raw column is the
            # loop-closure-free baseline from the SAME run.
            gt_pairs.append((out.p, out.p_raw, gt_p))
            gt_by_t[round(float(out.t), 6)] = gt_p
        if k % 100 == 0 or (not out.initialized and out.status):
            print(f"  frame {k}: init={out.initialized} "
                  f"tracked={out.n_tracked} status={out.status}", flush=True)
        k += 1

    buf = []
    # --stream uses the overlapped, double-buffered process_stream (the
    # path bench.py measures), staging frames in super-blocks so several
    # 48-frame scans stay in flight; the pipeline drains only at
    # super-block boundaries.
    SUPER = 48 * 10

    def flush_block():
        if not buf:
            return
        fs, ims = zip(*buf)
        buf.clear()
        imgs = np.stack([np.asarray(i, np.float32) for i in ims])
        chunks = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[f.chunk for f in fs])
        outs = sys_.process_stream(imgs, chunks, block=48,
                                   ts=np.asarray([f.t for f in fs]))
        for out, f in zip(outs, fs):
            publish(out, f.gt_p)

    for f, img in frames:
        if args.stream and sys_.initialized:
            buf.append((f, img))
            if len(buf) == SUPER:
                flush_block()
        else:
            out = sys_.process_frame(jnp.asarray(img, jnp.float32),
                                     f.chunk, t=f.t)
            publish(out, f.gt_p)
    flush_block()
    if sys_.loop is not None:
        sys_.drain_loop_work()  # deferred block-mode detections
    wall = time.perf_counter() - t0
    print(f"{k} frames in {wall:.1f}s ({k / wall:.1f} fps incl. compile)")

    result = {"frames": k, "wall_s": round(wall, 1)}
    if gt_pairs:
        est_p = np.stack([a for a, _, _ in gt_pairs])
        raw_p = np.stack([b for _, b, _ in gt_pairs])
        gt_p = np.stack([c for _, _, c in gt_pairs])
        res = evaluate.ate_rmse(est_p, gt_p)
        result["ate_rmse"] = round(res.rmse, 4)
        result["ate_rmse_raw"] = round(
            evaluate.ate_rmse(raw_p, gt_p).rmse, 4)
        rpe_r, _ = evaluate.rpe(est_p, gt_p, delta=30)
        result["rpe_30"] = round(rpe_r, 4)
    if sys_.loop is not None:
        result["loop_hits"] = sys_.loop.n_loops
        result["keyframes"] = sys_.loop.count
        result["pose_graph_runs"] = sys_.loop.n_optimizes
        result["drift_t_norm"] = round(
            float(np.linalg.norm(sys_.loop.t_drift)), 4)

    lc = sys_.loop
    if lc is not None and lc.count >= 2 and gt_by_t:

        def kf_ate(p_all):
            est, gt = [], []
            for i in range(lc.count):
                g = gt_by_t.get(round(float(lc._kf_t_np[i]), 6))
                if g is not None:
                    est.append(p_all[i])
                    gt.append(g)
            if len(est) < 3:
                return None
            return evaluate.ate_rmse(np.stack(est), np.stack(gt)).rmse

        # Raw odometry keyframes vs the pose-graph-corrected map: the
        # pose graph corrects the PAST trajectory retroactively (the
        # published live pose only benefits going forward), so this pair
        # is where loop closure's accuracy effect is measured — with or
        # without the optional global-BA refinement pass.
        raw = kf_ate(np.asarray(lc.db.p_origin[:lc.count]))
        pre = kf_ate(np.asarray(lc.db.p[:lc.count]))
        if raw is not None:
            result["kf_ate_raw"] = round(raw, 4)
        if pre is not None:
            result["kf_ate_corrected"] = round(pre, 4)

    if args.global_ba and sys_.loop is not None and sys_.loop.count >= 2:
        # End-of-run global refinement over the real map — the live call
        # site for LoopCloser.global_ba (keyfame_database.cpp:140-356's
        # global optimization role). Keyframe ATE before/after quantifies
        # the refinement when ground truth is available.
        # Shard the BA's landmark blocks over every visible device
        # (SURVEY §2.3 scale-out; psum-reduced Schur over the mesh's
        # `block` axis). One device => plain single-device solve.
        mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1:
            from vins_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(block=n_dev)
        cost = lc.global_ba(mesh=mesh)
        result["global_ba_cost"] = (round(cost, 4)
                                    if cost is not None else None)
        result["global_ba_devices"] = n_dev
        if "kf_ate_corrected" in result:
            post = kf_ate(np.asarray(lc.db.p[:lc.count]))
            result["kf_ate_pre_ba"] = result["kf_ate_corrected"]
            if post is not None:
                result["kf_ate_post_ba"] = round(post, 4)

    print(json.dumps(result))
    rec.save(os.path.join(args.out, "run.npz"))
    if sys_.loop is not None and sys_.loop.count:
        # Corrected keyframe trajectory (the consumer-facing replay
        # artifact, keyfame_database.cpp:358 updateVisualization).
        kt, kp, kq = sys_.loop.trajectory()
        np.savez(os.path.join(args.out, "keyframe_trajectory.npz"),
                 t=kt, p=kp, q=kq)
    return result


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
