"""Part 2: is the 1.5 m offset from the block path or from the init
gauge? Run the SAME sequence fully interactively and compare raw error,
plus aligned ATE on both runs, plus the init window pose vs GT.
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
from vins_tpu.utils import lie

CFG = VinsConfig()
seq, imgs = render_cached(CFG, n_frames=110, seed=13, frame_dt=1.0 / 30.0,
                          traj_kwargs=dict(w=0.35, bob=0.15),
                          imu_per_frame=4)

n_frames = 100
sys_ = VinsSystem(CFG, use_loop=False, ext=seq.ext)
outs = []
for k in range(n_frames):
    chunk = jax.tree.map(lambda x: x[k], seq.chunks)
    outs.append(sys_.process_frame(jnp.asarray(imgs[k]), chunk,
                                   t=float(seq.timestamps[k])))
init_at = next(i for i, o in enumerate(outs) if o.initialized)
print("interactive run: initialized at", init_at)

# Window state right after init: frame poses vs GT.
F = CFG.window.num_frames
win_p = np.asarray(sys_.est.window.p)
win_q = np.asarray(sys_.est.window.q)
print("window frame0 p:", win_p[0], " newest p:", win_p[F - 1])
print("GT at init frame:", np.asarray(seq.p[init_at]))

est_p = np.stack([o.p for o in outs[init_at:]])
gt_p = np.asarray(seq.p[init_at:n_frames])
raw = np.linalg.norm(est_p - gt_p, axis=-1)
print("interactive RAW err: first=%.3f mean=%.3f last=%.3f"
      % (raw[0], raw.mean(), raw[-1]))
res = evaluate.ate_rmse(est_p, gt_p)
res_s = evaluate.ate_rmse(est_p, gt_p, with_scale=True)
print("interactive aligned ATE=%.4f  (scale fit s=%.3f, ate=%.4f)"
      % (res.rmse, res_s.s, res_s.rmse))

# GT yaw at the start of the boot window vs estimated yaw gauge.
def yaw_of(q):
    return float(lie.rotmat_to_ypr(lie.quat_to_rotmat(jnp.asarray(q)))[0])

print("est yaw newest:", yaw_of(win_q[F - 1]),
      " GT yaw at init frame:", yaw_of(np.asarray(seq.q[init_at])))
