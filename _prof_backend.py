"""Time backend_step sub-stages on the real TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
from vins_tpu import default_config
from vins_tpu.core import preintegration as pre_mod
from vins_tpu.core import marginalization as marg
from vins_tpu.core import feature_manager as fm
from vins_tpu.core.solver import WindowProblem, solve_window, _linearize, _residuals_only, _schur_solve
from vins_tpu.core.estimator import BackendState, FrameInput, backend_step
from vins_tpu.io import synthetic

cfg = default_config()
F = cfg.window.num_frames
W = F - 1
win_d = synthetic.make_synthetic_window(cfg, n_landmarks=64, seed=0, noise_px=0.5)
est = BackendState.fresh(cfg)._replace(window=win_d.state, feats=win_d.feats, chunks=win_d.chunks)
inp = FrameInput(chunk=jax.tree.map(lambda x: x[-1], win_d.chunks),
                 ids=win_d.feats.track_id, obs=win_d.feats.obs[F-1],
                 obs_valid=win_d.feats.mask[F-1] & win_d.feats.valid)
ext, gravity = win_d.ext, win_d.gravity

def timeit(name, fn, *args, n=20):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return r

# full step
step = jax.jit(lambda e,i: backend_step(e,i,cfg,ext,gravity))
timeit("backend_step (full)", step, est, inp)

# repropagation
reprop = jax.jit(lambda ch, ba, bg: jax.vmap(lambda c,a,b: pre_mod.propagate(c,a,b,cfg.imu))(ch, ba, bg))
preints = timeit("repropagate 10 edges", reprop, est.chunks, est.window.ba[:W], est.window.bg[:W])

prob = WindowProblem(feats=est.feats, preints=preints, prior=est.prior, ext=ext,
                     gravity=gravity, sqrt_info_proj=jnp.asarray(cfg.camera.focal/1.5),
                     frame_free=jnp.ones(F))
from vins_tpu.core.solver import select_proj_factors
S_imu = jax.jit(jax.vmap(pre_mod.sqrt_information))(preints)
sel = jax.jit(lambda p: select_proj_factors(p, cfg.solver.max_proj_factors))(prob)
# solve
solve_j = jax.jit(lambda w, p: solve_window(w, p, cfg))
timeit("solve_window (8 LM iters)", solve_j, est.window, prob)
# one linearize
lin_j = jax.jit(lambda w, p, s, q: _linearize(w, p, cfg, s, q))
timeit("one _linearize", lin_j, est.window, prob, S_imu, sel)
res_j = jax.jit(lambda w, p, s, q: _residuals_only(w, p, cfg, s, q)[0])
timeit("one _residuals_only", res_j, est.window, prob, S_imu, sel)
# marginalization
mo_j = jax.jit(lambda w, p: marg.marginalize_old(w, p, cfg))
timeit("marginalize_old", mo_j, est.window, prob)
# triangulate
tri_j = jax.jit(lambda w, f: fm.triangulate(w, f, ext, cfg))
timeit("triangulate", tri_j, est.window, est.feats)
