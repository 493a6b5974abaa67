"""Core image ops: separable Gaussian, pyramids, bilinear sampling, CLAHE.

TPU-native replacements for the OpenCV image plumbing the reference leans
on (SURVEY.md §2.2): `cv::buildOpticalFlowPyramid` feeding
calcOpticalFlowPyrLK (feature_tracker.cpp:181) and `cv::createCLAHE(3.0)`
(ViewController.mm:439-441). Convolutions map straight onto XLA's fused
conv kernels; CLAHE is expressed as per-tile histogram/CDF lookups with
bilinear LUT blending — all static-shape and batchable.

Images are [H, W] float32 in [0, 1] (single channel).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def _sep_conv(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with reflect padding (single channel)."""
    pad = k.shape[0] // 2
    x = img[None, None, :, :]
    kh = k.reshape(1, 1, -1, 1).astype(img.dtype)
    kw = k.reshape(1, 1, 1, -1).astype(img.dtype)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def gaussian_blur(img: jax.Array, sigma: float = 1.0,
                  radius: int = 2) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    return _sep_conv(img, k)


def pyr_down(img: jax.Array) -> jax.Array:
    """One pyramid level: 5-tap Gaussian then 2x decimation (cv::pyrDown)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    return _sep_conv(img, k)[::2, ::2]


def build_pyramid(img: jax.Array, levels: int) -> List[jax.Array]:
    """[level0=full, level1=half, ...] — static list, shapes halve."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample img at float (x, y) positions with border clamping.

    xy: [..., 2] in pixel coordinates (x = column, y = row).
    Returns [...] samples.
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * i00 + fx * i01)
            + fy * ((1 - fx) * i10 + fx * i11))


def sobel_gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scharr-weighted image gradients (what OpenCV LK uses internally)."""
    d = jnp.array([-1.0, 0.0, 1.0]) / 2.0
    s = jnp.array([3.0, 10.0, 3.0]) / 16.0
    pad = 1
    x = img[None, None]
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kx = (s.reshape(-1, 1) * d.reshape(1, -1))[None, None]
    ky = (d.reshape(-1, 1) * s.reshape(1, -1))[None, None]
    gx = jax.lax.conv_general_dilated(xp, kx.astype(img.dtype), (1, 1), "VALID")
    gy = jax.lax.conv_general_dilated(xp, ky.astype(img.dtype), (1, 1), "VALID")
    return gx[0, 0], gy[0, 0]


def clahe(img: jax.Array, clip_limit: float = 3.0, grid: int = 8,
          n_bins: int = 256) -> jax.Array:
    """Contrast-limited adaptive histogram equalization.

    Equivalent of cv::createCLAHE(clip, (8,8))->apply (the reference
    equalizes every camera frame before tracking, ViewController.mm:439).
    Static-shape: per-tile histograms via one-hot reduction, clipping with
    uniform redistribution, CDF LUTs, bilinear blend of the 4 neighboring
    tile LUTs per pixel.
    """
    H, W = img.shape
    th, tw = H // grid, W // grid
    img_c = img[: th * grid, : tw * grid]
    v = jnp.clip((img_c * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1)
    tiles = v.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(grid * grid, th * tw)

    # Histogram per tile: one fused scatter-add over (tile_id·bins + bin).
    tile_ids = jnp.arange(grid * grid, dtype=jnp.int32)[:, None]
    flat_idx = (tile_ids * n_bins + tiles).reshape(-1)
    hist = jnp.zeros(grid * grid * n_bins, jnp.float32).at[flat_idx].add(1.0)
    hist = hist.reshape(grid * grid, n_bins)

    # Clip + redistribute (cv::CLAHE semantics).
    limit = jnp.maximum(clip_limit * (th * tw) / n_bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=1)
    cdf = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1.0)
    luts = cdf.reshape(grid, grid, n_bins)  # [gy, gx, bins]

    # Bilinear blend of neighboring tile LUTs at every pixel.
    yy = (jnp.arange(th * grid, dtype=img.dtype) + 0.5) / th - 0.5
    xx = (jnp.arange(tw * grid, dtype=img.dtype) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    bins = v  # [H', W'] int bin index per pixel
    def lut_at(gy, gx):
        return luts[gy[:, None], gx[None, :], bins]

    out = ((1 - fy) * (1 - fx) * lut_at(y0, x0)
           + (1 - fy) * fx * lut_at(y0, x1)
           + fy * (1 - fx) * lut_at(y1, x0)
           + fy * fx * lut_at(y1, x1))

    # Paste back into the original frame size (edges beyond the tiled
    # region keep their equalized nearest value by padding replication).
    full = jnp.zeros_like(img)
    full = full.at[: th * grid, : tw * grid].set(out)
    if th * grid < H:
        full = full.at[th * grid:, :].set(full[th * grid - 1:th * grid, :])
    if tw * grid < W:
        full = full.at[:, tw * grid:].set(full[:, tw * grid - 1:tw * grid])
    return full
