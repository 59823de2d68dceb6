"""Binary descriptor matching + GMS (Grid-based Motion Statistics) filtering.

Replaces the OpenCV CUDA brute-force Hamming matcher and the vendored GMS
matcher (`third_party/GMS/gms_matcher.{h,cpp}`, used with WithScale=false,
WithRotation=false everywhere in the reference). Everything is fixed-shape:

* Hamming distances: XOR + population_count, full (N, M) matrix — at VO scale
  (512 x 2048 x 8 words) this is microseconds of VPU work.
* GMS: matches vote into 20x20 cell-pair statistics via a one-hot einsum
  (MXU); the 4 half-cell-shifted grids, best-cell-pair selection, 3x3
  neighbourhood scoring and the THRESH_FACTOR * sqrt(mean support) rule follow
  the published algorithm (VerifyCellPairs, gms_matcher.cpp:102-150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_G = 20           # GMS grid is 20x20
_THRESH_FACTOR = 6.0


def hamming_distance_matrix(da: Array, db: Array) -> Array:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances."""
    x = jax.lax.population_count(da[:, None, :] ^ db[None, :, :])
    return jnp.sum(x.astype(jnp.int32), axis=-1)


def match_bruteforce(da: Array, valid_a: Array, db: Array, valid_b: Array):
    """Best match in b for each a (NORM_HAMMING, crossCheck=false like the
    reference). Returns (idx (N,), dist (N,), ok (N,))."""
    d = hamming_distance_matrix(da, db)
    d = jnp.where(valid_b[None, :], d, 512)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    dist = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    ok = valid_a & (dist < 512)
    return idx, dist, ok


def _cell_of(xy: Array, w: float, h: float, off_x: float, off_y: float):
    """20x20 grid cell index with optional half-cell offset (the 4 GMS grid
    types); out-of-grid -> -1."""
    cw, ch = w / _G, h / _G
    cx = jnp.floor(xy[:, 0] / cw + off_x).astype(jnp.int32)
    cy = jnp.floor(xy[:, 1] / ch + off_y).astype(jnp.int32)
    ok = (cx >= 0) & (cx < _G) & (cy >= 0) & (cy < _G)
    return jnp.where(ok, cy * _G + cx, -1)


def gms_filter(xy_a: Array, xy_b: Array, match_ok: Array,
               width: float, height: float) -> Array:
    """Inlier mask over matches (a[i] <-> b[i] pairs, already aligned).

    xy_a/xy_b: (N, 2) pixel coords of the two sides of each tentative match.
    """
    N = xy_a.shape[0]
    inlier = jnp.zeros((N,), dtype=bool)

    cb = _cell_of(xy_b, width, height, 0.0, 0.0)

    for off in ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)):
        ca = _cell_of(xy_a, width, height, off[0], off[1])
        ok = match_ok & (ca >= 0) & (cb >= 0)

        oh_a = jax.nn.one_hot(jnp.where(ok, ca, _G * _G), _G * _G,
                              dtype=jnp.float32)
        oh_b = jax.nn.one_hot(jnp.where(ok, cb, _G * _G), _G * _G,
                              dtype=jnp.float32)
        C = jnp.einsum("ni,nj->ij", oh_a, oh_b,
                       preferred_element_type=jnp.float32)   # (400, 400)
        npts = jnp.sum(oh_a, axis=0)                          # (400,)

        best_b = jnp.argmax(C, axis=1).astype(jnp.int32)      # (400,)
        has_any = jnp.sum(C, axis=1) > 0

        # 3x3 neighbourhood score: sum_k C[nk(a), nk(best_b(a))]
        C4 = C.reshape(_G, _G, _G, _G)
        score = jnp.zeros((_G * _G,), jnp.float32)
        thresh = jnp.zeros((_G * _G,), jnp.float32)
        numpair = jnp.zeros((_G * _G,), jnp.float32)
        ay = jnp.arange(_G * _G) // _G
        ax = jnp.arange(_G * _G) % _G
        by = best_b // _G
        bx = best_b % _G
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nay, nax = ay + dy, ax + dx
                nby, nbx = by + dy, bx + dx
                ok9 = (
                    (nay >= 0) & (nay < _G) & (nax >= 0) & (nax < _G)
                    & (nby >= 0) & (nby < _G) & (nbx >= 0) & (nbx < _G)
                )
                nayc = jnp.clip(nay, 0, _G - 1)
                naxc = jnp.clip(nax, 0, _G - 1)
                nbyc = jnp.clip(nby, 0, _G - 1)
                nbxc = jnp.clip(nbx, 0, _G - 1)
                val = C4[nayc, naxc, nbyc, nbxc]
                score = score + jnp.where(ok9, val, 0.0)
                thresh = thresh + jnp.where(ok9, npts[nayc * _G + naxc], 0.0)
                numpair = numpair + ok9.astype(jnp.float32)

        cell_pass = has_any & (
            score >= _THRESH_FACTOR * jnp.sqrt(
                thresh / jnp.maximum(numpair, 1.0)
            )
        )

        ca_c = jnp.clip(ca, 0, _G * _G - 1)
        m_in = ok & cell_pass[ca_c] & (cb == best_b[ca_c])
        inlier = inlier | m_in

    return inlier & match_ok
