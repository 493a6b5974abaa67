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
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    from vins_tpu import euroc_config
    from vins_tpu.io import euroc, evaluate
    from vins_tpu.io.replay import Recorder
    from vins_tpu.pipeline import VinsSystem

    cfg = euroc_config()
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
    t0 = time.perf_counter()
    k = 0

    def publish(out, gt_p):
        nonlocal k
        rec.add(t=out.t, p=out.p, q=out.q, initialized=out.initialized)
        if out.initialized and gt_p is not None:
            gt_pairs.append((out.p, gt_p))
        if k % 100 == 0 or (not out.initialized and out.status):
            print(f"  frame {k}: init={out.initialized} "
                  f"tracked={out.n_tracked} status={out.status}", flush=True)
        k += 1

    buf = []

    def flush_block():
        if not buf:
            return
        fs, ims = zip(*buf)
        buf.clear()
        imgs = np.stack([np.asarray(i, np.float32) for i in ims])
        chunks = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[f.chunk for f in fs])
        outs = sys_.process_block(imgs, chunks, ts=[f.t for f in fs])
        for out, f in zip(outs, fs):
            publish(out, f.gt_p)

    for f, img in frames:
        if args.stream and sys_.initialized:
            buf.append((f, img))
            if len(buf) == 48:
                flush_block()
        else:
            out = sys_.process_frame(jnp.asarray(img, jnp.float32),
                                     f.chunk, t=f.t)
            publish(out, f.gt_p)
    flush_block()
    wall = time.perf_counter() - t0
    print(f"{k} frames in {wall:.1f}s ({k / wall:.1f} fps incl. compile)")

    result = {"frames": k, "wall_s": round(wall, 1)}
    if gt_pairs:
        est_p = np.stack([a for a, _ in gt_pairs])
        gt_p = np.stack([b for _, b in gt_pairs])
        res = evaluate.ate_rmse(est_p, gt_p)
        result["ate_rmse"] = round(res.rmse, 4)
        rpe_r, _ = evaluate.rpe(est_p, gt_p, delta=30)
        result["rpe_30"] = round(rpe_r, 4)
    print(json.dumps(result))
    rec.save(os.path.join(args.out, "run.npz"))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
