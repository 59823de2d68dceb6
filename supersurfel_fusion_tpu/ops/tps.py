"""TPS (Texture-, Plane- and Size-aware) superpixel segmentation, TPU-native.

Re-designs the reference's CUDA implementation (`core/src/TPS_RGBD.cu`,
`TPS_RGBD_kernels.{cu,cuh}`) as pure fixed-shape jnp stencil/einsum code:

* The 4-phase checkerboard label update (`updateTPSRGB(D)_kernel`,
  TPS_RGBD_kernels.cuh:235-651) becomes a masked, fully-parallel update over
  the whole image — same schedule, no shared-memory tiles, no races by
  construction.
* The incremental atomicAdd coefficient bookkeeping is replaced by a full
  per-phase recomputation of superpixel statistics with a cell-blocked
  one-hot einsum that runs on the MXU (deterministic, and cheaper than it
  sounds: 1200 batched (9 x 256) @ (256 x F) matmuls).
* Labels are constrained to the 3x3 cell neighbourhood of each pixel's grid
  cell (the gSLICr/SLIC search-window convention). This keeps every stat
  lookup expressible as 9 static shifts + a one-hot contraction — there are
  NO gathers or scatters anywhere in the hot loop.
* Plane-fit moments are accumulated in cell-centred coordinates and shifted
  analytically, which keeps the 3x3 normal equations well-conditioned in
  float32 (the reference accumulates raw pixel coordinates).
* The RANSAC plane init (`initSamples/evalSamples/selectSamples_kernel`,
  TPS_RGBD_kernels.cu:324-467) draws fixed pseudo-random point triplets per
  superpixel from a static table (seeded PRNG, reproducible), fits the 3-point
  plane, and scores all hypotheses for all pixels in a single cell-reduce.
* The inter-superpixel plane smoothing filter (`initFilter/iterateFilter/
  finishFilter_kernel`, TPS_RGBD_kernels.cu:510-614) is a 4-neighbour Jacobi
  relaxation on the (GH, GW) grid — a direct stencil.

Energy model (same terms/weights as updateTPSRGBD_kernel):
  E = |color - mean_c|^2 + l_pos |pos - centroid|^2 + l_disp * clamp((d - theta.p)^2)
      - l_size * min(size - min_size, 0) + l_bound * boundary_count
with the n/(n-1) leave-one-out factor for the pixel's own superpixel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import TPSConfig
from supersurfel_fusion_tpu.ops.depth import shift2d

Array = jax.Array

# 3x3 cell-neighbourhood offsets indexed by code k = (dy+1)*3 + (dx+1)
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

# checkerboard phase schedule, in the reference's launch order
# (TPS_RGBD.cu:188-277): (OFFSET_X, OFFSET_Y) = (0,0), (1,1), (0,1), (1,0)
_PHASES = [(0, 0), (1, 1), (0, 1), (1, 0)]

# 4-neighbour offsets in the reference's candidate order: up, left, right, down
# (TPS_RGBD_kernels.cuh:350)
_NEIGH4 = [(-1, 0), (0, -1), (0, 1), (1, 0)]


class SuperpixelStats(NamedTuple):
    """Per-superpixel statistics on the (GH, GW) grid."""

    centroid: Array    # (GH, GW, 2) mean pixel (x, y), absolute coords
    color: Array       # (GH, GW, 3) mean color (image color space, 0..255)
    size: Array        # (GH, GW) pixel count
    theta: Array       # (GH, GW, 3) disparity plane d = a*x + b*y + c (absolute)


class TPSResult(NamedTuple):
    labels: Array      # (H, W) int32 superpixel index = gy * GW + gx
    boundary: Array    # (H, W) int32 count of 4-neighbours with another label
    inliers: Array     # (H, W) bool disparity-plane inlier
    stats: SuperpixelStats
    disp: Array        # (H, W) disparity used (1/filtered depth)


# ---------------------------------------------------------------------------
# Cell-blocked reductions (the TPU replacement for atomicAdd scatters)
# ---------------------------------------------------------------------------


def _label_cells(labels: Array, gw: int):
    return labels // gw, labels % gw


def _rel_code(labels: Array, gh: int, gw: int, cs: int):
    """Relative 3x3 code of each pixel's label w.r.t. its own grid cell."""
    H, W = labels.shape
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) // cs
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // cs
    gy, gx = _label_cells(labels, gw)
    return (gy - py + 1) * 3 + (gx - px + 1)


def cell_reduce(features: Array, labels: Array, gh: int, gw: int, cs: int) -> Array:
    """Sum per-pixel feature vectors into their label's cell: (H,W,F) -> (GH,GW,F).

    Exploits the 3x3 label-locality invariant: reduce per (spatial cell,
    rel-code) with a one-hot contraction over the 256 pixels of each cell
    (runs on the MXU), then combine the 9 shifted partials.
    """
    H, W, F = features.shape
    code = _rel_code(labels, gh, gw, cs)
    onehot = jax.nn.one_hot(code, 9, dtype=features.dtype)
    fc = features.reshape(gh, cs, gw, cs, F)
    oc = onehot.reshape(gh, cs, gw, cs, 9)
    partial = jnp.einsum(
        "yaxbk,yaxbf->yxkf", oc, fc, preferred_element_type=jnp.float32
    )  # (GH, GW, 9, F)
    out = jnp.zeros((gh, gw, F), dtype=features.dtype)
    for k, (dy, dx) in enumerate(_OFFS):
        # cell (y, x)'s partial for code k belongs to label cell (y+dy, x+dx)
        out = out + shift2d(partial[:, :, k, :], -dy, -dx, fill=0.0)
    return out


def lookup_cells(table: Array, code: Array, gh: int, gw: int, cs: int) -> Array:
    """Per-pixel lookup of a (GH,GW,F) table at cell = pixel_cell + offs(code).

    code: (H,W) int in [0,9). Returns (H,W,F). Expressed as a one-hot
    contraction against the 9 statically-shifted tables — no gather.

    NaN/inf table entries (invalid plane fits) are mapped to 0 here: the
    contraction multiplies every neighbouring entry by its one-hot weight and
    0 * nan = nan would otherwise poison whole cells. A zero plane fails the
    `dp > 0` inlier gate exactly like the reference's nan theta does.
    """
    F = table.shape[-1]
    H, W = code.shape
    table = jnp.nan_to_num(table, nan=0.0, posinf=0.0, neginf=0.0)
    shifted = jnp.stack(
        [shift2d(table, dy, dx, fill=0.0) for dy, dx in _OFFS], axis=0
    )  # (9, GH, GW, F)
    onehot = jax.nn.one_hot(code, 9, dtype=table.dtype).reshape(gh, cs, gw, cs, 9)
    out = jnp.einsum(
        "yaxbk,kyxf->yaxbf", onehot, shifted, preferred_element_type=jnp.float32
    )
    return out.reshape(H, W, F)


# ---------------------------------------------------------------------------
# Statistics merge (replaces mergeTPSRGB(D)Coeffs_kernel)
# ---------------------------------------------------------------------------


def _cell_centers(gh: int, gw: int, cs: int):
    cx = (jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1) * cs) + (cs - 1) * 0.5
    cy = (jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0) * cs) + (cs - 1) * 0.5
    return cx, cy


def _pixel_local_coords(H: int, W: int, cs: int):
    """Pixel coords relative to their own cell centre (well-conditioned f32)."""
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x0 = (jnp.floor(x / cs) * cs) + (cs - 1) * 0.5
    y0 = (jnp.floor(y / cs) * cs) + (cs - 1) * 0.5
    return x - x0, y - y0, x, y


def _merge_rgb(rgb: Array, labels: Array, gh: int, gw: int, cs: int) -> SuperpixelStats:
    """Full RGB merge with correct absolute centroids."""
    H, W, _ = rgb.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ones = jnp.ones((H, W), dtype=jnp.float32)
    # absolute coords are fine for first moments in f32 (sum < 2^24)
    feats = jnp.stack([x, y, rgb[..., 0], rgb[..., 1], rgb[..., 2], ones], axis=-1)
    sums = cell_reduce(feats, labels, gh, gw, cs)
    n = sums[..., 5]
    safe_n = jnp.maximum(n, 1e-6)
    centroid = jnp.stack([sums[..., 0] / safe_n, sums[..., 1] / safe_n], axis=-1)
    color = sums[..., 2:5] / safe_n[..., None]
    theta = jnp.zeros((gh, gw, 3), dtype=jnp.float32)
    return SuperpixelStats(centroid, color, n, theta)


def fit_planes(disp: Array, labels: Array, inliers: Array,
               gh: int, gw: int, cs: int) -> Array:
    """LSQ disparity-plane fit per superpixel over inlier pixels
    (mergeTPSRGBDCoeffs_kernel + solvePlaneEquations), in label-cell-centred
    coordinates for conditioning. Returns absolute-frame theta (GH,GW,3);
    theta = (0, 0, nan) where the fit is singular.

    Moments are accumulated directly relative to the LABEL's cell centre
    (computable per pixel from the label id alone), so one cell_reduce
    suffices — no moment-translation pass."""
    from supersurfel_fusion_tpu.utils.geometry import solve3x3

    H, W = disp.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy_l = (labels // gw).astype(jnp.float32)
    gx_l = (labels % gw).astype(jnp.float32)
    xl = x - (gx_l * cs + (cs - 1) * 0.5)     # label-centred coords
    yl = y - (gy_l * cs + (cs - 1) * 0.5)
    w = inliers.astype(jnp.float32)
    d = jnp.where(jnp.isfinite(disp), disp, 0.0)
    feats = jnp.stack(
        [w, w * xl, w * yl, w * xl * xl, w * yl * yl, w * xl * yl,
         w * d, w * xl * d, w * yl * d],
        axis=-1,
    )
    sums = cell_reduce(feats, labels, gh, gw, cs)

    n_, sx, sy, sxx, syy, sxy, sd, sxd, syd = [sums[..., i] for i in range(9)]
    A = jnp.stack(
        [
            jnp.stack([sxx, sxy, sx], axis=-1),
            jnp.stack([sxy, syy, sy], axis=-1),
            jnp.stack([sx, sy, n_], axis=-1),
        ],
        axis=-2,
    )
    b = jnp.stack([sxd, syd, sd], axis=-1)
    theta_local, ok = solve3x3(A, b, eps=1e-12)
    # convert to absolute pixel frame: c_abs = c - a*x0 - b*y0
    cx0, cy0 = _cell_centers(gh, gw, cs)
    a_, b_ = theta_local[..., 0], theta_local[..., 1]
    c_abs = theta_local[..., 2] - a_ * cx0 - b_ * cy0
    theta = jnp.stack([a_, b_, c_abs], axis=-1)
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok[..., None], theta, jnp.stack(
        [jnp.zeros_like(c_abs), jnp.zeros_like(c_abs),
         jnp.full_like(c_abs, nan)], axis=-1))


def eval_plane(theta_px: Array, x: Array, y: Array) -> Array:
    """dp = a*x + b*y + c for per-pixel theta (H,W,3)."""
    return theta_px[..., 0] * x + theta_px[..., 1] * y + theta_px[..., 2]


def compute_inliers(disp: Array, theta_px: Array, x: Array, y: Array,
                    thresh: float):
    """Inlier gate + clamped disparity energy
    (updateTPSRGBD_kernel, TPS_RGBD_kernels.cuh:309-321)."""
    dp = eval_plane(theta_px, x, y)
    e = (dp - disp) ** 2
    good = jnp.isfinite(e) & (e <= thresh) & (dp > 0.0)
    return good, jnp.where(good, e, thresh)


# ---------------------------------------------------------------------------
# Boundary / connectivity stencils
# ---------------------------------------------------------------------------


def boundary_count(labels: Array) -> Array:
    """#4-neighbours with a different label; out-of-image counts as different
    (matches the init convention of initSuperpixelsRGBD_kernel and the
    shared-memory -1 padding of the update kernels)."""
    b = jnp.zeros(labels.shape, dtype=jnp.int32)
    for dy, dx in _NEIGH4:
        nb = shift2d(labels, dy, dx, fill=-1)
        b = b + (nb != labels).astype(jnp.int32)
    return b


def unchangeable(labels: Array) -> Array:
    """Connectivity guard: a pixel may not change label if the predicate
    (ring neighbour == own label) flips more than twice along the open 8-ring
    (isUnchangeable, TPS_RGBD_kernels.cuh:178-233)."""
    ring = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    eq = [shift2d(labels, dy, dx, fill=-1) == labels for dy, dx in ring]
    jumps = jnp.zeros(labels.shape, dtype=jnp.int32)
    for i in range(1, 8):
        jumps = jumps + (eq[i] != eq[i - 1]).astype(jnp.int32)
    return jumps > 2


# ---------------------------------------------------------------------------
# Label update (replaces updateTPSRGB(D)_kernel)
# ---------------------------------------------------------------------------


def _phase_mask(H: int, W: int, off_x: int, off_y: int) -> Array:
    """Active-pixel mask of one checkerboard phase. The CUDA indexing
    x = 2*raw + (raw+OFF_X)%2, y = 2*raw + OFF_Y selects rows y%2==OFF_Y and
    columns with x%4 in {0,3} (OFF_X=0) or {1,2} (OFF_X=1)."""
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    xm = x % 4
    col = (xm == 0) | (xm == 3) if off_x == 0 else (xm == 1) | (xm == 2)
    return (y % 2 == off_y) & col


def _candidate_energy(stat: Array, rgbv: Array, x: Array, y: Array,
                      disp: Array, cfg: TPSConfig, use_disp: bool,
                      own: bool, min_size: float):
    """Energy of assigning each pixel to the superpixel described by `stat`
    (fields: cx, cy, r, g, b, n, ta, tb, tc). Returns (E, inlier)."""
    cx, cy = stat[..., 0], stat[..., 1]
    mean_c = stat[..., 2:5]
    n = stat[..., 5]
    if own:
        s = n / jnp.maximum(n - 1.0, 1e-6)
        dsize = n - min_size
        dx_ = s * (x - cx)
        dy_ = s * (y - cy)
        dc = (rgbv - mean_c) * s[..., None]
    else:
        dsize = n + 1.0 - min_size
        dx_ = x - cx
        dy_ = y - cy
        dc = rgbv - mean_c
    E = (
        jnp.sum(dc * dc, axis=-1)
        + cfg.lambda_pos * (dx_ * dx_ + dy_ * dy_)
        - cfg.lambda_size * jnp.minimum(dsize, 0.0)
    )
    inl = jnp.ones(E.shape, dtype=bool)
    if use_disp:
        dp = stat[..., 6] * x + stat[..., 7] * y + stat[..., 8]
        e = (dp - disp) ** 2
        inl = jnp.isfinite(e) & (e <= cfg.thresh_disp) & (dp > 0.0)
        E = E + cfg.lambda_disp * jnp.where(inl, e, cfg.thresh_disp)
    return E, inl


def stat_image(stats: SuperpixelStats, labels: Array, gh: int, gw: int,
               cs: int) -> Array:
    """Per-pixel stat vector of each pixel's label: (H, W, 9) =
    [cx, cy, r, g, b, n, ta, tb, tc]."""
    table = jnp.concatenate(
        [stats.centroid, stats.color, stats.size[..., None], stats.theta], axis=-1
    )
    return lookup_cells(table, _rel_code(labels, gh, gw, cs), gh, gw, cs)


def phase_update(labels: Array, inliers: Array, own_stat: Array,
                 rgb: Array, disp: Array, phase: int, cfg: TPSConfig,
                 use_disp: bool, gh: int, gw: int):
    """One checkerboard phase of boundary-pixel label reassignment.

    `own_stat` is the per-pixel stat image (see `stat_image`); it is updated
    incrementally — a pixel that adopts a neighbour's label takes that
    candidate's (already gathered) stat vector — so the cell lookup runs only
    when the stats table itself changes (at merges).

    Returns (labels, inliers, own_stat).
    """
    H, W, _ = rgb.shape
    cs = cfg.cell_size
    min_size = cs * cs / 4.0
    off_x, off_y = _PHASES[phase]

    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) // cs
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // cs

    bounds = boundary_count(labels)
    frozen = unchangeable(labels)
    active = (
        _phase_mask(H, W, off_x, off_y) & (bounds > 0) & ~frozen
    )

    E_best, inl_best = _candidate_energy(
        own_stat, rgb, x, y, disp, cfg, use_disp, own=True, min_size=min_size
    )
    E_best = E_best + cfg.lambda_bound * bounds.astype(jnp.float32)
    best_label = labels
    best_stat = own_stat

    # 4-neighbour labels (shifted views of the label image).
    # Key identity: the stat of the label AT a neighbouring pixel is just the
    # shifted own-stat image — no lookups at all inside the phase.
    neigh_labels = [shift2d(labels, dy, dx, fill=-1) for dy, dx in _NEIGH4]
    neigh_stats = [
        shift2d(own_stat, dy, dx, fill=0.0) for dy, dx in _NEIGH4
    ]

    for nl, stat in zip(neigh_labels, neigh_stats):
        gyn, gxn = _label_cells(nl, gw)
        dyc = gyn - py + 1
        dxc = gxn - px + 1
        in_window = (dyc >= 0) & (dyc < 3) & (dxc >= 0) & (dxc < 3)
        valid = (nl >= 0) & (nl != labels) & in_window
        E, inl = _candidate_energy(
            stat, rgb, x, y, disp, cfg, use_disp, own=False, min_size=min_size
        )
        # boundary term of the candidate: #4-neighbours != candidate label
        b = jnp.zeros(labels.shape, dtype=jnp.int32)
        for nl2 in neigh_labels:
            b = b + (nl2 != nl).astype(jnp.int32)
        E = E + cfg.lambda_bound * b.astype(jnp.float32)
        take = active & valid & (E < E_best)
        E_best = jnp.where(take, E, E_best)
        best_label = jnp.where(take, nl, best_label)
        best_stat = jnp.where(take[..., None], stat, best_stat)
        inl_best = jnp.where(take, inl, inl_best)

    if use_disp:
        # inl_best is each pixel's inlier bit w.r.t. its (possibly adopted)
        # label's plane — the refresh comes free with the energy evaluation
        return best_label, inl_best, best_stat
    return best_label, inliers, best_stat


# ---------------------------------------------------------------------------
# RANSAC plane init (replaces initSamples/evalSamples/selectSamples_kernel)
# ---------------------------------------------------------------------------


def ransac_plane_init(disp: Array, labels: Array, stats: SuperpixelStats,
                      cfg: TPSConfig, gh: int, gw: int):
    """Robust per-superpixel disparity-plane hypotheses.

    For each superpixel: `nb_samples` planes, each fit through 3 pixels drawn
    from a fixed pseudo-random offset table around the superpixel centroid
    (points landing outside the superpixel fall back to constant-disparity,
    like the reference's failed walks). Hypotheses are scored by inlier count
    over the superpixel's own pixels in one cell-reduce and the argmax wins.
    Returns (theta (GH,GW,3), inliers (H,W))."""
    from supersurfel_fusion_tpu.utils.geometry import solve3x3

    H, W = disp.shape
    cs = cfg.cell_size
    S = cfg.nb_samples
    key = jax.random.PRNGKey(1234)
    # static offset table: (S, 3 points, 2) in [-cs/2, cs/2]
    offs = jax.random.uniform(
        key, (S, 3, 2), minval=-cs / 2.0, maxval=cs / 2.0, dtype=jnp.float32
    )

    cx = stats.centroid[..., 0]  # (GH, GW)
    cy = stats.centroid[..., 1]

    pxs = jnp.clip(jnp.round(cx[..., None, None] + offs[None, None, :, :, 0]),
                   0, W - 1).astype(jnp.int32)  # (GH, GW, S, 3)
    pys = jnp.clip(jnp.round(cy[..., None, None] + offs[None, None, :, :, 1]),
                   0, H - 1).astype(jnp.int32)

    # gather disparity + label at sample points (tiny: GH*GW*S*3 lookups)
    d_s = disp[pys, pxs]
    l_s = labels[pys, pxs]
    own = (jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) * gw
           + jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1))
    ok_pt = (l_s == own[..., None, None]) & jnp.isfinite(d_s)

    # 3-point plane through (x, y, 1) -> d; degenerate -> constant plane
    X = jnp.stack(
        [pxs.astype(jnp.float32), pys.astype(jnp.float32), jnp.ones_like(d_s)],
        axis=-1,
    )  # (GH, GW, S, 3, 3)
    dvec = jnp.where(ok_pt, d_s, jnp.nan)
    theta_s, solved = solve3x3(X, jnp.where(jnp.isfinite(dvec), dvec, 0.0))
    all_ok = jnp.all(ok_pt, axis=-1)
    # fallback: constant plane at the last valid point's disparity (reference
    # sets theta = (0, 0, d3) when the solve fails, TPS_RGBD_kernels.cu:387-395)
    d_fallback = jnp.where(jnp.isfinite(d_s[..., 2]), d_s[..., 2], 0.0)
    theta_fb = jnp.stack(
        [jnp.zeros_like(d_fallback), jnp.zeros_like(d_fallback), d_fallback],
        axis=-1,
    )
    theta_s = jnp.where((solved & all_ok)[..., None], theta_s, theta_fb)

    # score every hypothesis for every pixel of its superpixel
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    code = _rel_code(labels, gh, gw, cs)
    th_px = lookup_cells(theta_s.reshape(gh, gw, S * 3), code, gh, gw, cs)
    th_px = th_px.reshape(H, W, S, 3)
    dp = th_px[..., 0] * x[..., None] + th_px[..., 1] * y[..., None] + th_px[..., 2]
    dd = (disp[..., None] - dp) ** 2
    votes = (jnp.isfinite(dd) & (dd < cfg.thresh_disp)).astype(jnp.float32)
    scores = cell_reduce(votes, labels, gh, gw, cs)  # (GH, GW, S)

    best = jnp.argmax(scores, axis=-1)  # (GH, GW)
    theta = jnp.take_along_axis(theta_s, best[..., None, None], axis=2)[:, :, 0, :]

    # inliers w.r.t. the selected plane (initDispCoeffsRansacRGBD_kernel:
    # dd < threshold && dp > 0)
    th_sel = lookup_cells(theta, code, gh, gw, cs)
    dp_sel = eval_plane(th_sel, x, y)
    dd_sel = (dp_sel - disp) ** 2
    inliers = jnp.isfinite(dd_sel) & (dd_sel < cfg.thresh_disp) & (dp_sel > 0.0)
    return theta, inliers


# ---------------------------------------------------------------------------
# Plane smoothing filter (replaces initFilter/iterateFilter/finishFilter)
# ---------------------------------------------------------------------------


def smooth_planes(stats: SuperpixelStats, cfg: TPSConfig) -> Array:
    """Jacobi relaxation coupling neighbouring superpixels' planes
    (TPS_RGBD.cu:480-505, iterateFilter_kernel). State per node:
    X = (dp(centroid), a, b)."""
    from supersurfel_fusion_tpu.utils.geometry import inv3x3_sym

    th = stats.theta
    px_ = stats.centroid[..., 0]
    py_ = stats.centroid[..., 1]
    z0 = th[..., 0] * px_ + th[..., 1] * py_ + th[..., 2]
    X = jnp.stack([z0, th[..., 0], th[..., 1]], axis=-1)  # (GH, GW, 3)
    Z = X

    alpha, beta, thr = cfg.filter_alpha, cfg.filter_beta, cfg.filter_thresh

    def one_iter(_, X):
        A = jnp.zeros(X.shape[:-1] + (3, 3), dtype=jnp.float32)
        A = A + alpha * jnp.eye(3, dtype=jnp.float32)
        R = alpha * Z
        for dy, dx in _NEIGH4:
            Xj = shift2d(X, dy, dx, fill=jnp.nan)
            pxj = shift2d(px_, dy, dx, fill=jnp.nan)
            pyj = shift2d(py_, dy, dx, fill=jnp.nan)
            dx_ = px_ - pxj
            dy_ = py_ - pyj
            dz = X[..., 0] - Xj[..., 0]
            w = jnp.isfinite(dz) & (dz * dz < thr * thr) & jnp.isfinite(dx_)
            wb = jnp.where(w, beta, 0.0)
            dxw = jnp.where(w, dx_, 0.0)
            dyw = jnp.where(w, dy_, 0.0)
            Xj0 = jnp.where(w, Xj[..., 0], 0.0)
            Xj1 = jnp.where(w, Xj[..., 1], 0.0)
            Xj2 = jnp.where(w, Xj[..., 2], 0.0)
            dA = jnp.stack(
                [
                    jnp.stack([2 * wb, -wb * dxw, -wb * dyw], axis=-1),
                    jnp.stack([-wb * dxw, wb * (2 + dxw * dxw), wb * dxw * dyw],
                              axis=-1),
                    jnp.stack([-wb * dyw, wb * dxw * dyw, wb * (2 + dyw * dyw)],
                              axis=-1),
                ],
                axis=-2,
            )
            dR = jnp.stack(
                [
                    wb * (2 * Xj0 + dxw * Xj1 + dyw * Xj2),
                    wb * (-dxw * Xj0 + 2 * Xj1),
                    wb * (-dyw * Xj0 + 2 * Xj2),
                ],
                axis=-1,
            )
            A = A + dA
            R = R + dR
        Ainv, ok = inv3x3_sym(A)
        Xn = jnp.einsum("...ij,...j->...i", Ainv, R)
        return jnp.where(ok[..., None], Xn, X)

    X = jax.lax.fori_loop(0, cfg.filter_iter, one_iter, X)
    a_, b_ = X[..., 1], X[..., 2]
    c_ = X[..., 0] - px_ * a_ - py_ * b_
    return jnp.stack([a_, b_, c_], axis=-1)


def render_plane_depth(theta: Array, labels: Array, gh: int, gw: int,
                       cs: int) -> Array:
    """Slanted-plane depth image: depth = 1 / (theta . (x, y, 1))
    (renderDepthImage_kernel, TPS_RGBD_kernels.cu:469-508)."""
    H, W = labels.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    th_px = lookup_cells(theta, _rel_code(labels, gh, gw, cs), gh, gw, cs)
    disp = eval_plane(th_px, x, y)
    return 1.0 / disp


# ---------------------------------------------------------------------------
# Top-level segmentation
# ---------------------------------------------------------------------------


def segment(rgb: Array, disp: Array, cfg: TPSConfig) -> TPSResult:
    """Full TPS segmentation (TPS_RGBD::compute, TPS_RGBD.cu:101-478):
    grid init -> nb_iters/2 RGB-only iterations (4 phases each) -> RANSAC
    plane init -> nb_iters/2 RGBD iterations -> final merge.
    `rgb` is (H, W, 3) float32 in [0, 255]; `disp` is (H, W) 1/depth."""
    H, W, _ = rgb.shape
    cs = cfg.cell_size
    assert H % cs == 0 and W % cs == 0, "image must tile by cell_size"
    gh, gw = H // cs, W // cs

    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    labels = (y // cs) * gw + (x // cs)
    inliers = jnp.zeros((H, W), dtype=bool)

    stats = _merge_rgb(rgb, labels, gh, gw, cs)
    S = stat_image(stats, labels, gh, gw, cs)

    # RGB-only iterations
    for _ in range(cfg.nb_iters // 2):
        for phase in range(4):
            labels, inliers, S = phase_update(
                labels, inliers, S, rgb, disp, phase, cfg,
                use_disp=False, gh=gh, gw=gw,
            )
            if cfg.merge_every_phase:
                stats = _merge_rgb(rgb, labels, gh, gw, cs)
                S = stat_image(stats, labels, gh, gw, cs)
        if not cfg.merge_every_phase:
            stats = _merge_rgb(rgb, labels, gh, gw, cs)
            S = stat_image(stats, labels, gh, gw, cs)

    # plane init
    if cfg.use_ransac:
        _, inliers = ransac_plane_init(disp, labels, stats, cfg, gh, gw)
    else:
        inliers = jnp.isfinite(disp)
    theta = fit_planes(disp, labels, inliers, gh, gw, cs)
    stats = stats._replace(theta=theta)
    S = stat_image(stats, labels, gh, gw, cs)

    # RGBD iterations
    def remerge(labels, inliers):
        rgbm = _merge_rgb(rgb, labels, gh, gw, cs)
        theta = fit_planes(disp, labels, inliers, gh, gw, cs)
        st = SuperpixelStats(rgbm.centroid, rgbm.color, rgbm.size, theta)
        return st, stat_image(st, labels, gh, gw, cs)

    for _ in range(cfg.nb_iters - cfg.nb_iters // 2):
        for phase in range(4):
            labels, inliers, S = phase_update(
                labels, inliers, S, rgb, disp, phase, cfg,
                use_disp=True, gh=gh, gw=gw,
            )
            if cfg.merge_every_phase:
                stats, S = remerge(labels, inliers)
        if not cfg.merge_every_phase:
            stats, S = remerge(labels, inliers)

    return TPSResult(
        labels=labels,
        boundary=boundary_count(labels),
        inliers=inliers,
        stats=stats,
        disp=disp,
    )
