"""Randomized-fern place recognition (loop-closure detection).

TPU-native rewrite of `Ferns` (`core/src/ferns.cu:45-195`,
`ferns_kernels.cu:27-72`): 500 random ferns, each a (pixel, r, g, b, depth)
threshold tuple over a downsampled RGB-D frame, produce a 4-bit code; frame
dissimilarity to a keyframe = fraction of differing codes.

The reference's host-side inverted index (`fernIds[fern][code] -> kf list`)
becomes a dense (MAX_KF, n_ferns) uint8 code matrix: co-occurrence scoring is
one vectorized compare+reduce — at the 512-keyframe cap this is exactly
equivalent and runs on-device with no dynamic lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import FernsConfig

Array = jax.Array


def make_fern_table(cfg: FernsConfig, width: int, height: int,
                    max_depth: float = 5.0, seed: int = 1234):
    """Static fern parameters at the downsampled resolution:
    (pos (n, 2) int32 [x, y], rgb thresholds (n, 3) f32, depth thresh (n,))."""
    rng = np.random.default_rng(seed)
    w = width >> cfg.pyramid_level
    h = height >> cfg.pyramid_level
    pos = np.stack(
        [rng.integers(0, w, cfg.nb_ferns), rng.integers(0, h, cfg.nb_ferns)],
        axis=-1,
    ).astype(np.int32)
    rgb = rng.integers(0, 256, (cfg.nb_ferns, 3)).astype(np.float32)
    depth = (rng.random(cfg.nb_ferns) * max_depth).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(rgb), jnp.asarray(depth)


class FernDB(NamedTuple):
    """Keyframe code store + pose graph (the fern side of `Ferns`)."""

    codes: Array       # (MAX_KF, n_ferns) uint8
    poses_R: Array     # (MAX_KF, 3, 3)
    poses_t: Array     # (MAX_KF, 3)
    stamps: Array      # (MAX_KF,) int32
    count: Array       # () int32

    @staticmethod
    def empty(max_kf: int, n_ferns: int) -> "FernDB":
        return FernDB(
            codes=jnp.zeros((max_kf, n_ferns), jnp.uint8),
            poses_R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (max_kf, 1, 1)),
            poses_t=jnp.zeros((max_kf, 3), jnp.float32),
            stamps=jnp.zeros((max_kf,), jnp.int32),
            count=jnp.int32(0),
        )


def compute_codes(rgb: Array, depth: Array, fern_pos: Array, fern_rgb: Array,
                  fern_depth: Array, level: int) -> Array:
    """Frame -> (n_ferns,) uint8 codes. rgb (H, W, 3) 0..255, depth (H, W)."""
    H, W, _ = rgb.shape
    h, w = H >> level, W >> level
    small_rgb = jax.image.resize(rgb, (h, w, 3), "bilinear")
    # nearest-neighbour depth downsample (reference uses INTER_NEAREST)
    s = 1 << level
    small_depth = depth[::s, ::s][:h, :w]

    px, py = fern_pos[:, 0], fern_pos[:, 1]
    c = small_rgb[py, px]                       # (n, 3) gather
    d = small_depth[py, px]
    code = (
        (c[:, 0] > fern_rgb[:, 0]).astype(jnp.uint8)
        | ((c[:, 1] > fern_rgb[:, 1]).astype(jnp.uint8) << 1)
        | ((c[:, 2] > fern_rgb[:, 2]).astype(jnp.uint8) << 2)
        | ((d > fern_depth).astype(jnp.uint8) << 3)
    )
    return code


def query(db: FernDB, codes: Array, threshold: float):
    """Score the frame against all keyframes.

    Returns (best_id, best_dissim, is_new) where is_new mirrors the
    reference's `minDiss > threshold` new-keyframe rule (ferns.cu:92-116).
    """
    n = codes.shape[0]
    max_kf = db.codes.shape[0]
    same = jnp.sum((db.codes == codes[None, :]).astype(jnp.int32), axis=1)
    dissim = (n - same).astype(jnp.float32) / float(n)
    kf_valid = jnp.arange(max_kf) < db.count
    dissim = jnp.where(kf_valid, dissim, 1.0)
    best_id = jnp.argmin(dissim).astype(jnp.int32)
    best = dissim[best_id]
    # empty DB: reference keeps minDiss at 1.0 -> new frame
    is_new = best > threshold
    return best_id, best, is_new


def add_keyframe(db: FernDB, codes: Array, R: Array, t: Array,
                 stamp: Array) -> FernDB:
    """Append a keyframe (masked no-op when full)."""
    k = db.count
    ok = k < db.codes.shape[0]
    kc = jnp.where(ok, k, db.codes.shape[0] - 1)
    return FernDB(
        codes=db.codes.at[kc].set(jnp.where(ok, codes, db.codes[kc])),
        poses_R=db.poses_R.at[kc].set(jnp.where(ok, R, db.poses_R[kc])),
        poses_t=db.poses_t.at[kc].set(jnp.where(ok, t, db.poses_t[kc])),
        stamps=db.stamps.at[kc].set(jnp.where(ok, stamp, db.stamps[kc])),
        count=jnp.where(ok, k + 1, k),
    )
