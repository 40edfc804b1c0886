"""Image pyramid (parity: cv::cuda::ORB's internal pyramid,
reference src/adapters/gpu/OrbCudaExtractor.cpp:35-45 scaleFactor=1.2,
nlevels=8).

Static shapes: level sizes are derived from the config at trace time, so
the pyramid is a tuple of fixed-shape arrays and XLA compiles one
program for the whole front-end.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic bilinear interpolation matrix
    (align_corners=False convention, matching jax.image.resize)."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), n_in - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        a = src - lo
        m[i, lo] += 1.0 - a
        m[i, hi] += a
    return m


@functools.lru_cache(maxsize=None)
def _box_matrix(n: int, size: int) -> np.ndarray:
    """(n, n) banded box-filter matrix with edge clamping."""
    r = size // 2
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        for d in range(-r, r + 1):
            m[i, min(max(i + d, 0), n - 1)] += 1.0 / size
    return m


def _sep_matmul(img: jnp.ndarray, my: np.ndarray, mx: np.ndarray) -> jnp.ndarray:
    """out = My @ img @ Mx^T as bf16 MXU matmuls with f32 accumulation;
    img may carry leading batch axes.

    Separable resampling/filtering as dense matmuls: the gather-based
    lowerings of jax.image.resize and reduce_window cost ~40 ms/frame
    each on this stack; two skinny matmuls are sub-ms. bf16 rounding of
    0-255 intensities (<= 0.5 gray level) is far below the FAST
    threshold and BRIEF comparison noise.
    """
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    a = jnp.einsum("oh,...hw->...ow", jnp.asarray(my).astype(jnp.bfloat16),
                   img.astype(jnp.bfloat16), **kw)
    return jnp.einsum("...ow,xw->...ox", a.astype(jnp.bfloat16),
                      jnp.asarray(mx).astype(jnp.bfloat16), **kw)


def level_shape(h: int, w: int, scale_factor: float, level: int) -> Tuple[int, int]:
    s = scale_factor**level
    return max(int(round(h / s)), 8), max(int(round(w / s)), 8)


def build_pyramid(img: jnp.ndarray, num_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """img: (..., H, W) float32 -> list of (..., Hi, Wi), level 0 = input."""
    h, w = img.shape[-2:]
    levels = [img]
    for i in range(1, num_levels):
        hi, wi = level_shape(h, w, scale_factor, i)
        hp, wp = levels[-1].shape[-2:]
        # resize from the previous level (cascaded, like OpenCV) to keep
        # the lowpass chain and limit aliasing; bilinear as two matmuls
        levels.append(
            _sep_matmul(levels[-1], _bilinear_matrix(hi, hp), _bilinear_matrix(wi, wp))
        )
    return levels


def box_blur(img: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Separable box filter with edge replication (parity: ORB's 5x5
    integral-image smoothing before BRIEF sampling)."""
    r = size // 2
    k = jnp.ones((size,), img.dtype) / size
    padded = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    # vertical then horizontal 1-D convolutions via conv_general_dilated
    img4 = padded[None, None, :, :]
    kv = k.reshape(1, 1, size, 1)
    v = jax.lax.conv_general_dilated(img4, kv, (1, 1), "VALID")
    v = jnp.pad(v[0, 0], ((0, 0), (r, r)), mode="edge")[None, None]
    kh = k.reshape(1, 1, 1, size)
    out = jax.lax.conv_general_dilated(v, kh, (1, 1), "VALID")
    return out[0, 0]


def sobel_gradients(img: jnp.ndarray):
    """Returns (Ix, Iy) with 3x3 Sobel kernels, zero-padded."""
    sx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], img.dtype)
    sy = sx.T
    img4 = img[None, None, :, :]
    ix = jax.lax.conv_general_dilated(img4, sx.reshape(1, 1, 3, 3), (1, 1), "SAME")[0, 0]
    iy = jax.lax.conv_general_dilated(img4, sy.reshape(1, 1, 3, 3), (1, 1), "SAME")[0, 0]
    return ix, iy
