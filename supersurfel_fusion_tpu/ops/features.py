"""ORB-style feature extraction, TPU-native.

From-scratch replacement for the vendored ORB-SLAM2 extractor
(`third_party/ORB/ORBextractor.{h,cpp}`) used by the sparse VO front-end
(C6/T1). Same capabilities — 8-level image pyramid, FAST-9/16 corners with an
adaptive low threshold, spatially-spread keypoint selection, intensity-
centroid orientation, rotated 256-bit binary descriptors — but engineered for
XLA:

* FAST is a pure 16-offset stencil over the whole level (static shifts, VPU),
  with the contiguous-arc test expressed as 16 unrolled 9-term ANDs.
* The octree keypoint distribution becomes per-cell argmax + per-level top-k:
  fixed shapes, deterministic, spatially spread.
* Orientation + descriptors work on gathered fixed-size 41x41 patches
  (one vmapped dynamic_slice per keypoint).
* The 256 BRIEF point pairs are drawn from a seeded Gaussian (sigma ~ patch/5,
  the BRIEF construction) instead of copying ORB's learned table — matching is
  framework-internal so there is no interop constraint.

Descriptors are bit-packed to (K, 8) uint32; Hamming distance via XOR +
population_count (ops/matching.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import VOConfig
from supersurfel_fusion_tpu.ops.depth import shift2d

Array = jax.Array

# FAST-9/16 Bresenham circle (dx, dy), radius 3
_CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]

_PATCH_R = 20          # patch radius for orientation + descriptor sampling
_PATCH = 2 * _PATCH_R + 1
_ORI_R = 15            # intensity-centroid radius (ORB convention)


class Keypoints(NamedTuple):
    xy: Array        # (K, 2) float32 (x, y) at level-0 scale
    level: Array     # (K,) int32
    angle: Array     # (K,) float32 radians
    score: Array     # (K,) float32
    valid: Array     # (K,) bool
    desc: Array      # (K, 8) uint32 packed 256-bit descriptors

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def _level_budgets(total: int, n_levels: int, scale: float) -> List[int]:
    """Distribute the feature budget geometrically across levels
    (ORBextractor behaviour)."""
    f = 1.0 / scale
    w = [f**i for i in range(n_levels)]
    s = sum(w)
    out = [max(8, int(round(total * wi / s))) for wi in w]
    return out


def gaussian_blur(img: Array, sigma: float = 2.0, radius: int = 3) -> Array:
    """Separable Gaussian (the 7x7 sigma=2 blur ORB applies before BRIEF)."""
    ks = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
    s = sum(ks)
    ks = [k / s for k in ks]
    out = jnp.zeros_like(img)
    for i, k in enumerate(ks):
        out = out + k * shift2d(img, i - radius, 0, fill=0.0)
    out2 = jnp.zeros_like(out)
    for i, k in enumerate(ks):
        out2 = out2 + k * shift2d(out, 0, i - radius, fill=0.0)
    return out2


def fast_scores(img: Array, th_hi: float, th_lo: float):
    """FAST-9/16 corner test at two thresholds.

    Returns (corner_hi, corner_lo, score): boolean corner masks and a
    response score (max of summed bright/dark excesses over the circle).

    The contiguous-arc-of-9 test is a packed-bit run-length check: the 16
    circle comparisons are packed into one int32 lane per pixel, the mask is
    circularly doubled (m | m<<16), and run>=9 falls out of four AND+shift
    halving steps — ~10 integer VPU ops per polarity instead of the naive
    16x9 unrolled boolean ANDs (measured 1.9x faster whole-pipeline feature
    stage; bit-exact vs the unrolled form, tests/test_features.py)."""
    taps = [shift2d(img, dy, dx, fill=0.0) for dx, dy in _CIRCLE]
    diffs = [t - img for t in taps]

    def _pack(masks):
        m = masks[0].astype(jnp.int32)
        for k in range(1, 16):
            m = m | (masks[k].astype(jnp.int32) << k)
        return m

    def _run9(m):
        # circular doubling so arcs wrapping past index 15 are contiguous
        ext = m | (m << 16)
        r2 = ext & (ext >> 1)      # bit i: run >= 2 starting at i
        r4 = r2 & (r2 >> 2)        # run >= 4
        r8 = r4 & (r4 >> 4)        # run >= 8
        r9 = r8 & (ext >> 8)       # run >= 9
        return (r9 & 0xFFFF) != 0

    def arc_test(th):
        bright = _pack([d > th for d in diffs])
        dark = _pack([d < -th for d in diffs])
        return _run9(bright) | _run9(dark)

    H, W = img.shape
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (x >= 3) & (x < W - 3) & (y >= 3) & (y < H - 3)

    corner_hi = arc_test(th_hi) & interior
    corner_lo = arc_test(th_lo) & interior

    pos = sum(jnp.maximum(d - th_lo, 0.0) for d in diffs)
    neg = sum(jnp.maximum(-d - th_lo, 0.0) for d in diffs)
    score = jnp.maximum(pos, neg)
    return corner_hi, corner_lo, score


def harris_response(img: Array, k: float = 0.04, r: int = 3) -> Array:
    """Harris corner response (det - k tr^2 over a (2r+1)^2 block).

    ORB ranks FAST corners by Harris (ORB_HARRIS_SCORE default,
    `ORBextractor` keeps the best-response corners): the FAST arc score
    itself is noisy frame to frame, and ranking by it made our per-cell
    argmax pick DIFFERENT pixels in consecutive frames — measured 2.4x
    fewer GMS-consistent matches on fr3 than the same selection driven by
    Harris."""
    ix = 0.5 * (shift2d(img, 0, 1, fill=0.0) - shift2d(img, 0, -1, fill=0.0))
    iy = 0.5 * (shift2d(img, 1, 0, fill=0.0) - shift2d(img, -1, 0, fill=0.0))

    # Separable shift-chain box sum, kept deliberately: a reduce_window
    # formulation was tried (session 2) and reverted — on-device cost is
    # negligible either way (harris_L0 0.019 ms, tools/feat_bench.py), and
    # reduce_window changes float summation ORDER, which can flip per-cell
    # argmax selections and silently shift the validated fr1 trajectory.
    # This form is float-identical to the round-3-lineage code whose fr1
    # ATE (0.0195 m) is the committed headline.
    def box(t):
        for axis in (0, 1):
            acc = t
            for i in range(1, r + 1):
                acc = acc + (shift2d(t, i, 0) + shift2d(t, -i, 0)
                             if axis == 0 else
                             shift2d(t, 0, i) + shift2d(t, 0, -i))
            t = acc
        return t

    ixx = box(ix * ix)
    iyy = box(iy * iy)
    ixy = box(ix * iy)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _select_level_keypoints(corner_hi, corner_lo, score, harris, k_budget: int,
                            border: int, cell: int):
    """FAST-score 3x3 NMS + Harris-ranked per-cell argmax + top-k selection.
    Cells with a high-threshold corner prefer it; cells with only
    low-threshold corners fall back (the ORBextractor min_th redetection
    behaviour); ranking inside and across cells is by Harris response (the
    ORB_HARRIS_SCORE ordering), which is what makes the selection repeatable
    frame to frame."""
    H, W = score.shape
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (
        (x >= border) & (x < W - border) & (y >= border) & (y < H - border)
    )
    # 3x3 non-max suppression on the FAST score (cv::FAST nonmaxSuppression)
    nms = jnp.ones(score.shape, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nms &= score >= shift2d(score, dy, dx, fill=-1.0)
    # Harris magnitudes reach ~1e11 on uint8-scale images: squash to (0, 1]
    # (monotonic) so tier arithmetic below stays within f32
    h = jnp.maximum(harris, 0.0)
    hkey = (h + 1.0) / (h + 1e9)
    key_hi = jnp.where(corner_hi & in_border & nms, hkey, 0.0)
    key_lo = jnp.where(corner_lo & in_border & nms, hkey, 0.0)

    Hp = (H + cell - 1) // cell * cell
    Wp = (W + cell - 1) // cell * cell

    def cellify(key):
        keyp = jnp.pad(key, ((0, Hp - H), (0, Wp - W)))
        cells = keyp.reshape(Hp // cell, cell, Wp // cell, cell)
        cells = cells.transpose(0, 2, 1, 3).reshape(-1, cell * cell)
        idx = jnp.argmax(cells, axis=-1)
        val = jnp.take_along_axis(cells, idx[:, None], axis=-1)[:, 0]
        return idx, val

    # full-precision argmax inside each cell (position stability); the
    # hi/lo preference and the cross-cell top-k tier via +1000 (f32 eps at
    # 1e3 is 6e-5 — only the cell DROP order coarsens, not positions)
    ihi, vhi = cellify(key_hi)
    ilo, vlo = cellify(key_lo)
    use_hi = vhi > 0.0
    best_in_cell = jnp.where(use_hi, ihi, ilo)
    best_val = jnp.where(use_hi, vhi, vlo)
    rank = best_val + use_hi.astype(jnp.float32) * 1000.0

    k = min(k_budget, best_val.shape[0])
    top_rank, top_cell = jax.lax.top_k(rank, k)
    top_val = best_val[top_cell]
    flat = best_in_cell[top_cell]
    ncw = Wp // cell
    cy = (top_cell // ncw) * cell + flat // cell
    cx = (top_cell % ncw) * cell + flat % cell
    valid = top_val > 0.0
    return cx, cy, jnp.where(valid, top_val, 0.0), valid


# orientation masks (circular, radius 15 inside the 41x41 patch)
def _ori_masks():
    yy, xx = jnp.mgrid[-_PATCH_R:_PATCH_R + 1, -_PATCH_R:_PATCH_R + 1]
    circ = (xx**2 + yy**2) <= _ORI_R**2
    return (
        jnp.asarray(xx * circ, jnp.float32),
        jnp.asarray(yy * circ, jnp.float32),
    )


def _brief_pattern():
    """(256, 2, 2) int32 sampling-pair offsets: seeded BRIEF-style Gaussian
    pairs (sigma = patch/5), self-contained.

    A "learned" greedy variance/decorrelation pattern (ORB-paper style,
    trained on TUM patches) was tried in round 4 and REMOVED with evidence:
    it measured worse on every sequence, including the one it was trained
    on (fr1/300 ATE 0.0292 with vs 0.0248 without; fr3 window 0.2884 vs
    0.1297 at cell=32 — artifacts/exp1_features.log). Matching is
    framework-internal (no interop with external ORB descriptors), so the
    fixed seeded pattern has no compatibility cost."""
    import numpy as _np

    rng = _np.random.default_rng(5489)
    pts = rng.normal(0.0, 31.0 / 5.0, (256, 2, 2))
    return _np.clip(_np.round(pts), -13, 13).astype(_np.int32)


_PATTERN = _brief_pattern()


def _pattern():
    return jnp.asarray(_PATTERN)


def _extract_patches(img: Array, cx: Array, cy: Array) -> Array:
    """(K, 41, 41) patches centred on (cx, cy), clamped to the image."""
    H, W = img.shape

    def one(cyi, cxi):
        y0 = jnp.clip(cyi - _PATCH_R, 0, H - _PATCH)
        x0 = jnp.clip(cxi - _PATCH_R, 0, W - _PATCH)
        return jax.lax.dynamic_slice(img, (y0, x0), (_PATCH, _PATCH))

    return jax.vmap(one)(cy, cx)


def _orientations(patches: Array) -> Array:
    mx, my = _ori_masks()
    m10 = jnp.einsum("kij,ij->k", patches, mx)
    m01 = jnp.einsum("kij,ij->k", patches, my)
    return jnp.arctan2(m01, m10)


def _descriptors(patches_blur: Array, angle: Array) -> Array:
    """Rotated-BRIEF: sample the seeded pattern at orientation-rotated
    offsets (nearest neighbour, like ORB's cvRound) and pack 256 bits."""
    pat = _pattern().astype(jnp.float32)          # (256, 2, 2) (x, y)
    ca, sa = jnp.cos(angle), jnp.sin(angle)       # (K,)
    px = pat[None, :, :, 0]                       # (1, 256, 2)
    py = pat[None, :, :, 1]
    rx = jnp.round(ca[:, None, None] * px - sa[:, None, None] * py).astype(jnp.int32)
    ry = jnp.round(sa[:, None, None] * px + ca[:, None, None] * py).astype(jnp.int32)
    rx = jnp.clip(rx + _PATCH_R, 0, _PATCH - 1)
    ry = jnp.clip(ry + _PATCH_R, 0, _PATCH - 1)

    flat = patches_blur.reshape(patches_blur.shape[0], -1)     # (K, 41*41)
    idx = ry * _PATCH + rx                                     # (K, 256, 2)
    samples = jnp.take_along_axis(flat, idx.reshape(flat.shape[0], -1), axis=1)
    samples = samples.reshape(-1, 256, 2)
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # (K, 256)

    groups = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(groups * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def detect_and_describe(gray: Array, cfg: VOConfig) -> Keypoints:
    """Full ORB pipeline over the pyramid. Output capacity is the sum of the
    per-level budgets (static)."""
    budgets = _level_budgets(cfg.nb_features, cfg.nb_levels, cfg.scale_factor)
    H0, W0 = gray.shape

    all_xy, all_level, all_angle, all_score, all_valid, all_desc = (
        [], [], [], [], [], []
    )
    img = gray
    for lvl in range(cfg.nb_levels):
        scale = cfg.scale_factor**lvl
        if lvl > 0:
            Hl = max(int(round(H0 / scale)), _PATCH + 2)
            Wl = max(int(round(W0 / scale)), _PATCH + 2)
            img = jax.image.resize(gray, (Hl, Wl), method="bilinear")
        Hl, Wl = img.shape

        hi, lo, score = fast_scores(img, float(cfg.ini_th_fast),
                                    float(cfg.min_th_fast))
        harris = harris_response(img) if cfg.harris_rank else score
        cx, cy, val, valid = _select_level_keypoints(
            hi, lo, score, harris, budgets[lvl], border=_PATCH_R + 1,
            cell=int(cfg.detect_cell),
        )
        patches = _extract_patches(img, cx, cy)
        angle = _orientations(patches)
        blurred = gaussian_blur(img)
        patches_b = _extract_patches(blurred, cx, cy)
        desc = _descriptors(patches_b, angle)

        all_xy.append(
            jnp.stack([cx.astype(jnp.float32) * scale,
                       cy.astype(jnp.float32) * scale], axis=-1)
        )
        all_level.append(jnp.full((cx.shape[0],), lvl, jnp.int32))
        all_angle.append(angle)
        all_score.append(val)
        all_valid.append(valid)
        all_desc.append(desc)

    return Keypoints(
        xy=jnp.concatenate(all_xy),
        level=jnp.concatenate(all_level),
        angle=jnp.concatenate(all_angle),
        score=jnp.concatenate(all_score),
        valid=jnp.concatenate(all_valid),
        desc=jnp.concatenate(all_desc),
    )
