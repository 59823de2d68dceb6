"""Depth preprocessing: bilateral filter and disparity conversion.

Replaces `cv::cuda::bilateralFilter(depth, -1, 0.03, 4.5)`
(`core/src/supersurfel_fusion.cu:180`) and the `depth2disp*` kernels
(`core/src/TPS_RGBD_kernels.cu:278-316`). The bilateral filter is written as a
static stencil of shifted adds — XLA fuses the whole window into one
VPU loop, no gathers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def bilateral_filter(depth: Array, sigma_value: float = 0.03,
                     sigma_space: float = 4.5, radius: int = 6) -> Array:
    """Edge-preserving depth smoothing.

    Invalid (0) depths contribute ~zero weight to valid neighbours through the
    range kernel and remain 0 themselves, matching the reference's behaviour
    on TUM data.
    """
    inv2_sv = 0.5 / (sigma_value * sigma_value)
    inv2_ss = 0.5 / (sigma_space * sigma_space)

    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    H, W = depth.shape
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sw = math.exp(-(dy * dy + dx * dx) * inv2_ss)
            if sw < 1e-4:
                continue
            shifted = shift2d(depth, dy, dx, fill=0.0)
            diff = shifted - depth
            w = sw * jnp.exp(-(diff * diff) * inv2_sv)
            w = jnp.where(shifted > 0.0, w, 0.0)
            acc = acc + w * shifted
            wacc = wacc + w
    out = acc / jnp.maximum(wacc, 1e-12)
    return jnp.where((depth > 0.0) & (wacc > 1e-6), out, 0.0)


def depth_to_disp(depth: Array) -> Array:
    """depth (m) -> disparity 1/depth; invalid depth (<= 0) -> +inf so that
    downstream `isfinite` gates reject it (matches 1/0 in the reference)."""
    return jnp.where(depth > 0.0, 1.0 / jnp.maximum(depth, 1e-12), jnp.inf)


def shift2d(img: Array, dy: int, dx: int, fill=0.0) -> Array:
    """out[y, x] = img[y + dy, x + dx], `fill` outside. Static shifts only —
    lowers to pad+slice, never a gather."""
    H, W = img.shape[0], img.shape[1]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad_width = [(py1, py0), (px1, px0)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad_width, constant_values=fill)
    return jax.lax.slice(
        padded,
        [py0, px0] + [0] * (img.ndim - 2),
        [py0 + H, px0 + W] + list(img.shape[2:]),
    )
