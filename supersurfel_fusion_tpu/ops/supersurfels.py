"""Supersurfel generation: lift each superpixel to an oriented Gaussian
ellipse surfel.

TPU-native rewrite of `computeSupersurfelCoeffs` + `computeSupersurfels`
(`core/src/supersurfel_fusion_kernels.cu:113-224`): the per-pixel atomicAdd
scatter becomes the same cell-blocked einsum reduction used by TPS, and the
per-superpixel eigendecomposition is the batched branchless `eigh3x3`.

Numerical note: second moments are accumulated relative to a per-superpixel
anchor point (the plane-rendered 3D point at the cell centre), which keeps the
covariance free of the catastrophic cancellation the raw `E[pp^T]-mm^T` form
suffers in float32 — the reference pays this cancellation on GPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, GenerationConfig, TPSConfig
from supersurfel_fusion_tpu.ops.tps import TPSResult, cell_reduce, _cell_centers
from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.color import lab_to_rgb, rgb_to_lab
from supersurfel_fusion_tpu.utils.geometry import eigh3x3, outer3

Array = jax.Array


def generate_supersurfels(
    rgb: Array,
    plane_depth: Array,
    tps: TPSResult,
    cam: CameraIntrinsics,
    tps_cfg: TPSConfig,
    gen_cfg: GenerationConfig,
    z_min: float,
    z_max: float,
    stamp: Array,
) -> Supersurfels:
    """Build the frame's supersurfels (camera frame).

    Pixels contribute iff they are disparity-plane inliers, have finite
    positive plane depth and are not boundary pixels (bound == 0) — the same
    gates as computeSupersurfelCoeffs (supersurfel_fusion_kernels.cu:135-145).
    Validity gates per superpixel: >= 100 contributing pixels, mean z within
    [z_min, z_max], elongation <= 50 (supersurfel_fusion_kernels.cu:188-223).
    """
    H, W = plane_depth.shape
    cs = tps_cfg.cell_size
    gh, gw = H // cs, W // cs
    n_sp = gh * gw

    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    good = (
        tps.inliers
        & jnp.isfinite(plane_depth)
        & (plane_depth > 0.0)
        & (tps.boundary == 0)
    )
    w = good.astype(jnp.float32)
    d = jnp.where(good, plane_depth, 0.0)

    px = (x - cam.cx) * d / cam.fx
    py = (y - cam.cy) * d / cam.fy
    pos = jnp.stack([px, py, d], axis=-1)                       # (H, W, 3)

    # anchor: plane point at each superpixel's cell centre (via its theta)
    cx0, cy0 = _cell_centers(gh, gw, cs)
    theta = jnp.nan_to_num(tps.stats.theta, nan=0.0, posinf=0.0, neginf=0.0)
    disp0 = theta[..., 0] * cx0 + theta[..., 1] * cy0 + theta[..., 2]
    z0 = jnp.where(disp0 > 1e-6, 1.0 / jnp.maximum(disp0, 1e-6), 0.0)
    anchor = jnp.stack(
        [(cx0 - cam.cx) * z0 / cam.fx, (cy0 - cam.cy) * z0 / cam.fy, z0], axis=-1
    )  # (GH, GW, 3)

    # per-pixel anchor of the pixel's LABEL (3x3 locality -> lookup_cells)
    from supersurfel_fusion_tpu.ops.tps import _rel_code, lookup_cells

    code = _rel_code(tps.labels, gh, gw, cs)
    anchor_px = lookup_cells(anchor, code, gh, gw, cs)          # (H, W, 3)

    rel = jnp.where(good[..., None], pos - anchor_px, 0.0)
    lab = jnp.where(good[..., None], rgb_to_lab(rgb), 0.0)

    # features: [w, rel(3), lab(3), rel outer upper-tri(6)] = 13
    feats = jnp.concatenate(
        [
            w[..., None],
            rel,
            lab,
            jnp.stack(
                [
                    rel[..., 0] * rel[..., 0],
                    rel[..., 0] * rel[..., 1],
                    rel[..., 0] * rel[..., 2],
                    rel[..., 1] * rel[..., 1],
                    rel[..., 1] * rel[..., 2],
                    rel[..., 2] * rel[..., 2],
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )
    sums = cell_reduce(feats, tps.labels, gh, gw, cs)           # (GH, GW, 13)

    n = sums[..., 0]
    safe_n = jnp.maximum(n, 1.0)
    mean_rel = sums[..., 1:4] / safe_n[..., None]
    mean_lab = sums[..., 4:7] / safe_n[..., None]
    s = sums[..., 7:13]
    m2 = jnp.stack(
        [
            jnp.stack([s[..., 0], s[..., 1], s[..., 2]], axis=-1),
            jnp.stack([s[..., 1], s[..., 3], s[..., 4]], axis=-1),
            jnp.stack([s[..., 2], s[..., 4], s[..., 5]], axis=-1),
        ],
        axis=-2,
    ) / safe_n[..., None, None]
    cov = m2 - outer3(mean_rel)
    mean_pos = anchor + mean_rel

    vecs, vals = eigh3x3(cov.reshape(-1, 3, 3))
    vecs = vecs.reshape(gh, gw, 3, 3)
    vals = vals.reshape(gh, gw, 3)

    z = mean_pos[..., 2]
    elong = vals[..., 0] / jnp.where(
        jnp.abs(vals[..., 1]) > 1e-20, vals[..., 1], 1e-20
    )
    ok = (
        jnp.isfinite(z)
        & (n > gen_cfg.min_pixels)
        & (z > z_min)
        & (z < z_max)
        & (elong <= gen_cfg.max_elongation)
    )

    conf = jnp.where(ok, n, -1.0)
    color = lab_to_rgb(mean_lab)
    stamps = jnp.broadcast_to(
        jnp.asarray(stamp, jnp.int32), (gh, gw, 2)
    )

    return Supersurfels(
        positions=mean_pos.reshape(n_sp, 3),
        colors=color.reshape(n_sp, 3),
        stamps=stamps.reshape(n_sp, 2),
        orientations=vecs.reshape(n_sp, 3, 3),
        shapes=cov.reshape(n_sp, 3, 3),
        dims=vals[..., :2].reshape(n_sp, 2),
        confidences=conf.reshape(n_sp),
    )
