"""End-to-end demo: full VIO/SLAM on the rendered synthetic world.

Runs the complete pipeline — frontend KLT tracking on ray-cast images,
automatic visual-inertial initialization, sliding-window backend, 30 Hz
motion-only poses, loop closure — and writes a trajectory render + AR
overlay + ATE report.

Usage:  python examples/run_synthetic.py [--frames 120] [--out /tmp/vins_out]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--out", default="/tmp/vins_out")
    ap.add_argument("--loop", action="store_true", help="enable loop closure")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from vins_tpu.config import VinsConfig
    from vins_tpu.io import evaluate
    from vins_tpu.io.replay import Recorder, save_checkpoint
    from vins_tpu.io.synthetic import (make_synthetic_sequence,
                                       render_sequence_images)
    from vins_tpu.pipeline import VinsSystem
    from vins_tpu.viz import TrajectoryRenderer, draw_ar_overlay

    cfg = VinsConfig()
    seq = make_synthetic_sequence(
        cfg, n_frames=args.frames, n_landmarks=60, seed=13,
        frame_dt=1.0 / 30.0, traj_kwargs=dict(w=0.35, bob=0.15),
        imu_per_frame=4)
    print(f"rendering {args.frames} frames...", flush=True)
    imgs = render_sequence_images(seq, cfg, seed=13)

    sys_ = VinsSystem(cfg, use_loop=args.loop, ext=seq.ext)
    rec = Recorder()
    outs = []
    t0 = time.perf_counter()
    for k in range(args.frames):
        chunk = jax.tree.map(lambda x: x[k], seq.chunks)
        out = sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                                 t=float(seq.timestamps[k]))
        outs.append(out)
        rec.add(t=out.t, p=out.p, q=out.q, initialized=out.initialized)
        if k % 30 == 0:
            print(f"  frame {k}: init={out.initialized} "
                  f"tracked={out.n_tracked}", flush=True)
    wall = time.perf_counter() - t0
    print(f"processed {args.frames} frames in {wall:.1f}s "
          f"({args.frames / wall:.1f} fps incl. compile)")

    init_at = next((i for i, o in enumerate(outs) if o.initialized), None)
    if init_at is None:
        print("never initialized")
        return 1
    est_p = np.stack([o.p for o in outs[init_at:]])
    gt_p = np.asarray(seq.p[init_at:args.frames])
    res = evaluate.ate_rmse(est_p, gt_p)
    print(json.dumps({"init_frame": init_at, "ate_rmse": res.rmse,
                      "traj_len": evaluate.trajectory_length(gt_p)}))

    # Trajectory render.
    r = TrajectoryRenderer()
    img = r.render(est_p, points_w=None)
    _save_png(os.path.join(args.out, "trajectory.png"), img)

    # AR overlay on the last frame: cube on the detected ground plane.
    from vins_tpu.utils import lie
    k = args.frames - 1
    R_wb = np.asarray(lie.quat_to_rotmat(jnp.asarray(outs[k].q)))
    R_ic = np.asarray(lie.quat_to_rotmat(seq.ext.qic))
    R_wc = R_wb @ R_ic
    t_wc = outs[k].p + R_wb @ np.asarray(seq.ext.tic)
    center = outs[k].p + R_wc @ np.array([0.0, 0.5, 3.0])
    ar = draw_ar_overlay(imgs[k], R_wc, t_wc, cfg.camera.fx, cfg.camera.fy,
                         cfg.camera.cx, cfg.camera.cy, center)
    _save_png(os.path.join(args.out, "ar_overlay.png"), ar)

    rec.save(os.path.join(args.out, "run.npz"))
    save_checkpoint(os.path.join(args.out, "estimator.ckpt"), sys_.est)
    print(f"outputs in {args.out}")
    return 0


def _save_png(path, img):
    """Minimal PNG writer (8-bit RGB), no external deps."""
    import struct
    import zlib

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, 2)
    H, W, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(H))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


if __name__ == "__main__":
    sys.exit(main())
