"""Localize the mode-switch drift (VERDICT r4 weak #1).

Runs the same scenario as test_block_to_interactive_rebuilds_pnp_preints
but prints per-frame error during boot, block, and interactive tail, on
CPU like the test suite.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from conftest import render_cached
from vins_tpu.config import VinsConfig
from vins_tpu.pipeline import VinsSystem

CFG = VinsConfig()
print("pnp_stream_solve =", CFG.solver.pnp_stream_solve)

seq, imgs = render_cached(CFG, n_frames=110, seed=13, frame_dt=1.0 / 30.0,
                          traj_kwargs=dict(w=0.35, bob=0.15),
                          imu_per_frame=4)

n_frames = 100
sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
k = 0
while k < n_frames and not sys_.initialized:
    chunk = jax.tree.map(lambda x: x[k], seq.chunks)
    sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                       t=float(seq.timestamps[k]))
    k += 1
print("initialized at", k)

e = k + 36
outs_b = sys_.process_block(jnp.asarray(imgs[k:e]),
                            jax.tree.map(lambda x: x[k:e], seq.chunks),
                            ts=seq.timestamps[k:e])
gt_b = np.asarray(seq.p[k:e])
for j, o in enumerate(outs_b):
    err = np.linalg.norm(np.asarray(o.p) - gt_b[j])
    print(f"block frame {k+j}: err={err:.3f} is_be={j%3} cost={o.solver_cost:.2f}")

print("stale:", sys_._pnp_preints_stale)
outs = []
for j in range(e, n_frames):
    chunk = jax.tree.map(lambda x: x[j], seq.chunks)
    o = sys_.process_frame(jnp.asarray(imgs[j]), chunk,
                           t=float(seq.timestamps[j]))
    outs.append(o)
    err = np.linalg.norm(np.asarray(o.p) - np.asarray(seq.p[j]))
    print(f"inter frame {j}: err={err:.3f} cost={o.solver_cost:.2f}")

est_p = np.stack([o.p for o in outs])
gt_p = np.asarray(seq.p[e:n_frames])
err = np.linalg.norm(est_p - gt_p, axis=-1)
print("mean post-switch err:", float(err.mean()))
