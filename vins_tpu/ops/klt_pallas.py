"""Pallas TPU kernel for one pyramid level of inverse-compositional LK.

The pure-XLA formulation in ops/klt.py vmaps a per-feature dynamic_slice
patch extraction, which XLA:TPU lowers to gathers (measured ~19 ms per
pyramid for 128 features at 640x480 on a v5e). This kernel keeps the
level images resident in VMEM and does the patch reads as direct VMEM
dynamic slices — one grid program per feature, all LK iterations inside
the kernel, no HBM traffic after the first block fetch.

Replaces the hot loop of cv::calcOpticalFlowPyrLK (reference
feature_tracker.cpp:181). Numerics match ops/klt._track_level: same
inverse-compositional updates, same min-eigenvalue gate, same bilinear
border clamping (patches are clamped inside the image like the XLA
path's dynamic_slice clamping).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_patch(ref, cx, cy, win: int, H: int, W: int):
    """[win,win] patch whose top-left lands at float (cx, cy); clamps
    like the XLA path (ops.klt._extract_patch).

    Mosaic requires vector loads at sublane-multiple-of-8 /
    lane-multiple-of-128 offsets, so the read is an aligned (rows, 256)
    block followed by a dynamic double `pltpu.roll` and a static window —
    the arbitrary-offset slice a CPU would do, expressed the TPU way.
    The ref's lane dim must be a multiple of 128 (see _pad_lanes), which
    keeps the right-edge clamp aligned.
    """
    win1 = win + 1
    Wp = ref.shape[1]
    cx = jnp.clip(cx, 0.0, W - win - 1.001)
    cy = jnp.clip(cy, 0.0, H - win - 1.001)
    ix = jnp.floor(cx).astype(jnp.int32)
    iy = jnp.floor(cy).astype(jnp.int32)
    fx = cx - ix.astype(cx.dtype)
    fy = cy - iy.astype(cy.dtype)

    rows = ((win1 + 7) // 8) * 8 + 8
    iy8 = jnp.minimum((iy // 8) * 8, H - rows)
    offy = iy - iy8

    if Wp > 256:
        lanes = 256
        ixa = jnp.minimum((ix // 128) * 128, Wp - lanes)
        offx = ix - ixa
        raw = ref[pl.ds(pl.multiple_of(iy8, 8), rows),
                  pl.ds(pl.multiple_of(ixa, 128), lanes)]
    else:
        offx = ix
        raw = ref[pl.ds(pl.multiple_of(iy8, 8), rows), :]
    raw = pltpu.roll(pltpu.roll(raw, -offy, 0), -offx, 1)
    raw = raw[:win1, :win1]
    top = (1 - fy) * ((1 - fx) * raw[:-1, :-1] + fx * raw[:-1, 1:])
    bot = fy * ((1 - fx) * raw[1:, :-1] + fx * raw[1:, 1:])
    return top + bot


def _klt_kernel(pts_ref, guess_ref, valid_ref,
                prev_ref, gx_ref, gy_ref, next_ref,
                flow_ref, ok_ref, err_ref,
                *, win: int, iters: int, H: int, W: int, eps: float):
    i = pl.program_id(0)
    r = (win - 1) / 2.0
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    g0x = guess_ref[i, 0]
    g0y = guess_ref[i, 1]
    ok_in = valid_ref[i, 0]

    t = _bilinear_patch(prev_ref, px - r, py - r, win, H, W)
    tx = _bilinear_patch(gx_ref, px - r, py - r, win, H, W)
    ty = _bilinear_patch(gy_ref, px - r, py - r, win, H, W)
    a = jnp.sum(tx * tx)
    b = jnp.sum(tx * ty)
    c = jnp.sum(ty * ty)
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    ok = (ok_in > 0) & (min_eig / (win * win) > 1e-4)
    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
    i00 = c * inv_det
    i01 = -b * inv_det
    i11 = a * inv_det

    # Early-exit iteration (cv::TermCriteria EPS semantics): stop once
    # the update shrinks below eps — typical tracks converge in 2-4
    # iterations, and the scalar loop is this kernel's critical path.
    def cond(carry):
        it, _fx, _fy, _err, d2 = carry
        return (it < iters) & (d2 > eps * eps)

    def body(carry):
        it, fx_, fy_, _err, _d2 = carry
        cur = _bilinear_patch(next_ref, px + fx_ - r, py + fy_ - r,
                              win, H, W)
        diff = cur - t
        rx = jnp.sum(diff * tx)
        ry = jnp.sum(diff * ty)
        dx = -(i00 * rx + i01 * ry)
        dy = -(i01 * rx + i11 * ry)
        return (it + 1, fx_ + dx, fy_ + dy, jnp.mean(jnp.abs(diff)),
                dx * dx + dy * dy)

    # Dead INPUT slots skip the iteration loop entirely: ~45% of the
    # padded feature slots are free in steady state and the scalar loop
    # is the kernel's critical path. (min-eig-failed templates still
    # iterate, matching the XLA path's unmasked fori_loop.)
    _, fx_, fy_, err, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), g0x, g0y,
                     jnp.zeros((), t.dtype),
                     jnp.where(ok_in > 0, jnp.inf, 0.0).astype(t.dtype)))
    flow_ref[i, 0] = fx_
    flow_ref[i, 1] = fy_
    ok_ref[i, 0] = ok.astype(jnp.int32)
    err_ref[i, 0] = err


@functools.lru_cache(maxsize=None)
def _build_klt_call(M: int, H: int, W: int, Wp: int, win: int, iters: int,
                    eps: float):
    kernel = functools.partial(_klt_kernel, win=win, iters=iters, H=H, W=W,
                               eps=eps)
    img_spec = pl.BlockSpec((H, Wp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            img_spec, img_spec, img_spec, img_spec,
        ],
        out_specs=(
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, 2), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
    )


def _pad_lanes(img: jax.Array) -> jax.Array:
    """Pad width to a multiple of 128 (pltpu.roll lane requirement).
    Edge padding keeps the clamped border reads identical to the
    unpadded image."""
    W = img.shape[1]
    Wp = ((W + 127) // 128) * 128
    if Wp == W:
        return img
    return jnp.pad(img, ((0, 0), (0, Wp - W)), mode="edge")


def track_level_pallas(img_prev: jax.Array, gx: jax.Array, gy: jax.Array,
                       img_next: jax.Array, pts_prev: jax.Array,
                       guess: jax.Array, valid: jax.Array,
                       win: int, iters: int, eps: float = 0.0
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ops.klt._track_level's per-level math.

    pts_prev/guess: [M,2] this level's pixels; valid: [M] bool.
    eps > 0 enables per-feature early exit (eps=0 reproduces the XLA
    path's fixed iteration count exactly).
    Returns (flow [M,2], ok [M] bool, err [M]).
    """
    M = pts_prev.shape[0]
    H, W = img_prev.shape
    imgs = [_pad_lanes(x) for x in (img_prev, gx, gy, img_next)]
    call = _build_klt_call(M, H, W, imgs[0].shape[1], win, iters, eps)
    flow, ok, err = call(
        pts_prev.astype(jnp.float32),
        guess.astype(jnp.float32),
        valid.astype(jnp.int32)[:, None],
        *imgs)
    return flow, ok[:, 0] > 0, err[:, 0]


def _klt_pyramid_kernel(pts_ref, guess_ref, valid_ref, *refs,
                        win: int, iters: int, eps: float, shapes):
    """Full pyramidal LK for one feature: all levels inside one kernel.

    refs layout: for each level l (coarsest last in `shapes` order):
      prev_l, gx_l, gy_l, next_l  (VMEM), then outputs
      flow_ref, ok_ref, err_ref (SMEM).
    Descends coarse→fine carrying the flow, exactly like
    ops.klt.track_pyramid's host loop, but with one kernel launch per
    image pair instead of one per level.
    """
    L = len(shapes)
    flow_ref, ok_ref, err_ref = refs[4 * L], refs[4 * L + 1], refs[4 * L + 2]
    i = pl.program_id(0)
    r = (win - 1) / 2.0
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    fx_ = guess_ref[i, 0]
    fy_ = guess_ref[i, 1]
    alive = valid_ref[i, 0] > 0   # input-valid: dead slots skip loops
    ok = alive
    err = jnp.zeros((), jnp.float32)

    for lvl in range(L - 1, -1, -1):   # coarsest → finest
        H, W = shapes[lvl]
        prev_ref = refs[4 * lvl + 0]
        gx_ref = refs[4 * lvl + 1]
        gy_ref = refs[4 * lvl + 2]
        next_ref = refs[4 * lvl + 3]
        scale = jnp.float32(2.0 ** lvl)
        plx = px / scale
        ply = py / scale

        t = _bilinear_patch(prev_ref, plx - r, ply - r, win, H, W)
        tx = _bilinear_patch(gx_ref, plx - r, ply - r, win, H, W)
        ty = _bilinear_patch(gy_ref, plx - r, ply - r, win, H, W)
        a = jnp.sum(tx * tx)
        b = jnp.sum(tx * ty)
        c = jnp.sum(ty * ty)
        det = a * c - b * b
        tr = a + c
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        ok = ok & (min_eig / (win * win) > 1e-4)
        inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
        i00 = c * inv_det
        i01 = -b * inv_det
        i11 = a * inv_det

        def cond(carry):
            it, _fx, _fy, _e, d2 = carry
            return (it < iters) & (d2 > eps * eps)

        def body(carry):
            it, fx_i, fy_i, _e, _d2 = carry
            cur = _bilinear_patch(next_ref, plx + fx_i - r, ply + fy_i - r,
                                  win, H, W)
            diff = cur - t
            rx = jnp.sum(diff * tx)
            ry = jnp.sum(diff * ty)
            dx = -(i00 * rx + i01 * ry)
            dy = -(i01 * rx + i11 * ry)
            return (it + 1, fx_i + dx, fy_i + dy, jnp.mean(jnp.abs(diff)),
                    dx * dx + dy * dy)

        # Dead INPUT slots skip the level's iteration loop (see
        # _klt_kernel; min-eig-failed templates still iterate).
        _, fx_, fy_, err, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), fx_, fy_,
                         jnp.zeros((), jnp.float32),
                         jnp.where(alive, jnp.float32(jnp.inf),
                                   jnp.float32(0.0))))
        if lvl > 0:
            fx_ = fx_ * 2.0
            fy_ = fy_ * 2.0

    flow_ref[i, 0] = fx_
    flow_ref[i, 1] = fy_
    ok_ref[i, 0] = ok.astype(jnp.int32)
    err_ref[i, 0] = err


@functools.lru_cache(maxsize=None)
def _build_klt_pyramid_call(M: int, shapes, pad_shapes, win: int,
                            iters: int, eps: float):
    kernel = functools.partial(_klt_pyramid_kernel, win=win, iters=iters,
                               eps=eps, shapes=shapes)
    img_specs = []
    for (H, Wp) in pad_shapes:
        img_specs += [pl.BlockSpec((H, Wp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 4
    return pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + img_specs,
        out_specs=(
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, 2), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
    )


def track_pyramid_pallas(pyr_prev, grads, pyr_next, pts_prev, valid,
                         win: int, iters: int, eps: float = 0.0,
                         init_flow=None):
    """Whole-pyramid LK in ONE kernel launch (vs one per level).

    pyr_prev/pyr_next: level lists (finest first); grads: [(gx, gy)] per
    level; pts_prev: [M,2] level-0 points. Returns (pts, ok, err) like
    ops.klt.track_pyramid.
    """
    M = pts_prev.shape[0]
    L = len(pyr_prev)
    shapes = tuple(tuple(p.shape) for p in pyr_prev)
    imgs = []
    for l in range(L):
        imgs += [_pad_lanes(pyr_prev[l]), _pad_lanes(grads[l][0]),
                 _pad_lanes(grads[l][1]), _pad_lanes(pyr_next[l])]
    pad_shapes = tuple(tuple(imgs[4 * l].shape) for l in range(L))
    call = _build_klt_pyramid_call(M, shapes, pad_shapes, win, iters, eps)
    guess = (jnp.zeros_like(pts_prev) if init_flow is None
             else init_flow / (2.0 ** (L - 1)))
    flow, ok, err = call(
        pts_prev.astype(jnp.float32), guess.astype(jnp.float32),
        valid.astype(jnp.int32)[:, None], *imgs)
    pts_next = pts_prev + flow
    return pts_next, ok[:, 0] > 0, err[:, 0]


def _patches_kernel(pts_ref, img_ref, out_ref, *, win: int, H: int,
                    W: int):
    """Subpixel-aligned [win,win] patch per keypoint (VMEM-resident
    image, aligned load + dynamic roll — the same read pattern as the
    LK kernel). Feeds the BRIEF one-hot-matmul extraction."""
    i = pl.program_id(0)
    r = (win - 1) / 2.0
    p = _bilinear_patch(img_ref, pts_ref[i, 0] - r, pts_ref[i, 1] - r,
                        win, H, W)
    out_ref[0] = p


@functools.lru_cache(maxsize=None)
def _build_patches_call(M: int, H: int, W: int, Wp: int, win: int):
    kernel = functools.partial(_patches_kernel, win=win, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H, Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, win, win), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, win, win), jnp.float32),
    )


def extract_patches_pallas(img: jax.Array, pts: jax.Array,
                           win: int) -> jax.Array:
    """[N, win, win] bilinear patches centered at pts ([N,2] pixel xy)."""
    M = pts.shape[0]
    H, W = img.shape
    imgp = _pad_lanes(img)
    call = _build_patches_call(M, H, W, imgp.shape[1], win)
    return call(pts.astype(jnp.float32), imgp)


def _ncc_kernel(pa_ref, pb_ref, a_ref, b_ref, out_ref,
                *, win: int, H: int, W: int):
    i = pl.program_id(0)
    r = (win - 1) / 2.0
    ta = _bilinear_patch(a_ref, pa_ref[i, 0] - r, pa_ref[i, 1] - r,
                         win, H, W)
    tb = _bilinear_patch(b_ref, pb_ref[i, 0] - r, pb_ref[i, 1] - r,
                         win, H, W)
    ta = ta - jnp.mean(ta)
    tb = tb - jnp.mean(tb)
    out_ref[i, 0] = jnp.sum(ta * tb) * jax.lax.rsqrt(
        jnp.sum(ta * ta) * jnp.sum(tb * tb) + 1e-12)


@functools.lru_cache(maxsize=None)
def _build_ncc_call(M: int, H: int, W: int, Wp: int, win: int):
    kernel = functools.partial(_ncc_kernel, win=win, H=H, W=W)
    img_spec = pl.BlockSpec((H, Wp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((M, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            img_spec, img_spec,
        ],
        out_specs=pl.BlockSpec((M, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
    )


def patch_ncc_pallas(img_a: jax.Array, img_b: jax.Array,
                     pts_a: jax.Array, pts_b: jax.Array,
                     win: int) -> jax.Array:
    """Zero-mean NCC of (win,win) patches centered at pts_a/pts_b."""
    M = pts_a.shape[0]
    H, W = img_a.shape
    imgs = [_pad_lanes(x) for x in (img_a, img_b)]
    call = _build_ncc_call(M, H, W, imgs[0].shape[1], win)
    out = call(pts_a.astype(jnp.float32), pts_b.astype(jnp.float32),
               *imgs)
    return out[:, 0]
