"""Pinhole camera projection helpers (batched)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics

Array = jax.Array


def backproject(u: Array, v: Array, depth: Array, cam: CameraIntrinsics) -> Array:
    """Pixel (u, v) + depth (metres) -> camera-frame 3D point (..., 3)."""
    x = (u - cam.cx) * depth / cam.fx
    y = (v - cam.cy) * depth / cam.fy
    return jnp.stack([x, y, depth], axis=-1)


def project(p: Array, cam: CameraIntrinsics):
    """Camera-frame points (..., 3) -> (u, v) pixel coordinates (float)."""
    z = p[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = p[..., 0] * cam.fx / safe_z + cam.cx
    v = p[..., 1] * cam.fy / safe_z + cam.cy
    return u, v


def in_image(u: Array, v: Array, cam: CameraIntrinsics) -> Array:
    return (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)


def pixel_grid(cam: CameraIntrinsics):
    """(H, W) integer coordinate grids (u=x columns, v=y rows)."""
    v = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 1)
    return u, v
