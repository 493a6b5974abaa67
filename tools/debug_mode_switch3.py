"""Part 3: parity magnitude between (block + interactive tail) and an
uninterrupted interactive run — calibrates the rewritten test's gate.
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
from vins_tpu.io import evaluate
from vins_tpu.pipeline import VinsSystem

CFG = VinsConfig()
seq, imgs = render_cached(CFG, n_frames=110, seed=13, frame_dt=1.0 / 30.0,
                          traj_kwargs=dict(w=0.35, bob=0.15),
                          imu_per_frame=4)
n_frames = 100


def run_interactive(sys_, lo, hi):
    outs = []
    for j in range(lo, hi):
        chunk = jax.tree.map(lambda x: x[j], seq.chunks)
        outs.append(sys_.process_frame(jnp.asarray(imgs[j]), chunk,
                                       t=float(seq.timestamps[j])))
    return outs


# Twin A: all interactive.
sa = VinsSystem(CFG, use_loop=False, ext=seq.ext)
outs_a = run_interactive(sa, 0, n_frames)
init_at = next(i for i, o in enumerate(outs_a) if o.initialized)
print("init at", init_at)

# Twin B: interactive to init, block, interactive tail.
sb = VinsSystem(CFG, use_loop=False, ext=seq.ext)
k = 0
while k < n_frames and not sb.initialized:
    chunk = jax.tree.map(lambda x: x[k], seq.chunks)
    sb.process_frame(jnp.asarray(imgs[k]), chunk,
                     t=float(seq.timestamps[k]))
    k += 1
e = k + 36
outs_blk = sb.process_block(jnp.asarray(imgs[k:e]),
                            jax.tree.map(lambda x: x[k:e], seq.chunks),
                            ts=seq.timestamps[k:e])
print("stale:", sb._pnp_preints_stale)
outs_tail = run_interactive(sb, e, n_frames)

pa = np.stack([o.p for o in outs_a])
pb = np.stack([o.p for o in outs_blk] + [o.p for o in outs_tail])
diff = np.linalg.norm(pa[k:] - pb, axis=-1)
print("parity |A-B| during block: mean=%.4f max=%.4f"
      % (diff[:36].mean(), diff[:36].max()))
print("parity |A-B| after switch: mean=%.4f max=%.4f"
      % (diff[36:].mean(), diff[36:].max()))

res_b = evaluate.ate_rmse(pb, np.asarray(seq.p[k:n_frames]))
res_a = evaluate.ate_rmse(pa[init_at:], np.asarray(seq.p[init_at:n_frames]))
print("aligned ATE: interactive=%.4f  block+tail=%.4f"
      % (res_a.rmse, res_b.rmse))
