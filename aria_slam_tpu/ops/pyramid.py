"""Image pyramid (parity: cv::cuda::ORB's internal pyramid,
reference src/adapters/gpu/OrbCudaExtractor.cpp:35-45 scaleFactor=1.2,
nlevels=8).

Static shapes: level sizes are derived from the config at trace time, so
the pyramid is a tuple of fixed-shape arrays and XLA compiles one
program for the whole front-end.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shape(h: int, w: int, scale_factor: float, level: int) -> Tuple[int, int]:
    s = scale_factor**level
    return max(int(round(h / s)), 8), max(int(round(w / s)), 8)


def build_pyramid(img: jnp.ndarray, num_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """img: (H, W) float32 -> list of (Hi, Wi) float32, level 0 = input."""
    h, w = img.shape
    levels = [img]
    for i in range(1, num_levels):
        hi, wi = level_shape(h, w, scale_factor, i)
        # resize from the previous level (cascaded, like OpenCV) to keep
        # the lowpass chain and limit aliasing
        levels.append(jax.image.resize(levels[-1], (hi, wi), method="linear"))
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
