"""Global model fusion and maintenance.

TPU-native rewrite of the reference's model update pass
(`core/src/supersurfel_fusion.cu:350-483`) and its kernels
(`findBestMatches`, `updateSupersurfels`, `insertSupersurfels`,
`filterModel` — `core/src/supersurfel_fusion_kernels.cu:522-682, 348-467`):

* The racy atomicExch min-by-distance match selection becomes ONE
  deterministic scatter-min with an encoded key (quantized distance in the
  high bits, model id in the low bits — see `find_best_matches`), so ties
  break toward the lower id instead of by warp timing.
* The warp-aggregated insertion counter becomes a cumulative-sum compaction.
* The thrust sort_by_key compaction becomes a stable argsort over the state
  key followed by a gather of the SoA — identical active < inactive < invalid
  ordering.
* Counts (`nb_supersurfels`, `nb_visible`) stay on-device as int32 scalars;
  the reference round-trips them through cudaMemcpy every frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, FusionConfig
from supersurfel_fusion_tpu.types import ModelState, Supersurfels
from supersurfel_fusion_tpu.utils.color import lab_to_rgb, rgb_to_lab
from supersurfel_fusion_tpu.utils.geometry import eigh3x3, inv3x3_sym, mult_ABAt

Array = jax.Array

# plain int, not jnp.int32: a module-level jnp scalar is a device-resident
# constant that lowering must download through the (slow) remote-TPU tunnel
_BIG = 2**30


class MatchResult(NamedTuple):
    matched: Array        # (F,) bool — frame superpixel was hit by a projection
    model_match: Array    # (F,) int32 — best matching model id, or -1


def find_best_matches(model: Supersurfels, nb_visible: Array,
                      frame: Supersurfels, labels: Array,
                      R: Array, t: Array, cam: CameraIntrinsics,
                      cfg: FusionConfig) -> MatchResult:
    """Projective model->frame association with min-distance selection
    (findBestMatches, supersurfel_fusion_kernels.cu:522-599). (R, t) is the
    camera->world pose; the view transform is inverted internally.

    Only the active prefix matters: callers may pass a model SoA statically
    sliced to `visible_cap` rows — the returned `model_match` ids index that
    same prefix, which is also a valid global index (compaction keeps actives
    first)."""
    C = model.capacity
    F = frame.capacity
    H, W = labels.shape

    ids = jnp.arange(C, dtype=jnp.int32)
    live = (ids < jnp.minimum(nb_visible, C)) & (model.confidences > 0.0)

    Rv = R.T
    tv = -(Rv @ t)
    pm = model.positions @ Rv.T + tv
    z = pm[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = jnp.round(pm[:, 0] * cam.fx / safe_z + cam.cx).astype(jnp.int32)
    v = jnp.round(pm[:, 1] * cam.fy / safe_z + cam.cy).astype(jnp.int32)
    proj_ok = (
        live
        & (z > cfg.range_min) & (z < cfg.range_max)
        & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    )
    fid = labels[jnp.clip(v, 0, H - 1), jnp.clip(u, 0, W - 1)]
    fid_matched = jnp.where(proj_ok, fid, F)  # F == out-of-range sentinel

    # "matched" flag: any projection hit, before the similarity gates
    matched = (
        jnp.zeros((F,), jnp.int32)
        .at[fid_matched].max(1, mode="drop")
    ) > 0

    # similarity gates for fusion candidates
    fpos = (frame.positions @ R.T + t)[fid]           # frame surfel in world
    fnormal = (frame.orientations[:, 2, :] @ R.T)[fid]
    flab = rgb_to_lab(frame.colors)[fid]
    fconf = frame.confidences[fid]

    mlab = rgb_to_lab(model.colors)
    mnormal = model.orientations[:, 2, :]

    dist = jnp.linalg.norm(model.positions - fpos, axis=-1)
    lab_dist = jnp.linalg.norm(mlab - flab, axis=-1)
    ndot = jnp.abs(jnp.sum(mnormal * fnormal, axis=-1))

    gate = (
        proj_ok
        & (fconf > 0.0)
        & (lab_dist < cfg.match_max_color_dist)
        & (ndot > cfg.match_min_normal_dot)
        & (dist < cfg.match_max_dist)
    )
    # min-by-distance selection as ONE scatter-min with an encoded key:
    # top bits = quantized distance, low 17 bits = model id (tie -> lower id).
    # Replaces the reference's racy atomicExch pair deterministically.
    dq = jnp.clip(
        jnp.round(dist / cfg.match_max_dist * 4096.0), 0, 4095
    ).astype(jnp.int32)
    key = jnp.where(gate, (dq << 17) | ids, _BIG)
    fid_gated = jnp.where(gate, fid, F)
    best = jnp.full((F,), _BIG, jnp.int32).at[fid_gated].min(key, mode="drop")
    model_match = jnp.where(best < _BIG, best & ((1 << 17) - 1), -1)
    return MatchResult(matched=matched, model_match=model_match)


def _fuse(frame: Supersurfels, model: Supersurfels, match: MatchResult,
          R: Array, t: Array, stamp: Array) -> Supersurfels:
    """Confidence-weighted inverse-covariance fusion of matched pairs
    (updateSupersurfels, supersurfel_fusion_kernels.cu:601-682). Scatters
    exactly F (=#superpixels) rows into the model SoA."""
    F = frame.capacity
    mid = match.model_match
    do = (mid >= 0) & match.matched
    mid_c = jnp.clip(mid, 0, model.capacity - 1)

    m_pos = model.positions[mid_c]
    m_shape = model.shapes[mid_c]
    m_conf = model.confidences[mid_c]
    m_lab = rgb_to_lab(model.colors[mid_c])
    m_stamps = model.stamps[mid_c]

    f_pos = frame.positions @ R.T + t
    f_shape = mult_ABAt(R[None], frame.shapes)
    f_lab = rgb_to_lab(frame.colors)
    f_conf = frame.confidences

    ratio = 1.0 / jnp.maximum(m_conf + f_conf, 1e-12)
    w = (ratio * f_conf)[:, None, None]

    f_inv, f_ok = inv3x3_sym(f_shape)
    m_inv, m_ok = inv3x3_sym(m_shape)
    fused_inv = w * f_inv + (1.0 - w) * m_inv
    fused_shape_ic, ic_ok = inv3x3_sym(fused_inv)
    use_ic = f_ok & m_ok & ic_ok

    pos_ic = jnp.einsum(
        "nij,nj->ni",
        fused_shape_ic,
        jnp.einsum("nij,nj->ni", w * f_inv, f_pos)
        + jnp.einsum("nij,nj->ni", (1.0 - w) * m_inv, m_pos),
    )
    shape_lin = ratio[:, None, None] * (
        f_conf[:, None, None] * f_shape + m_conf[:, None, None] * m_shape
    )
    pos_lin = ratio[:, None] * (f_conf[:, None] * f_pos + m_conf[:, None] * m_pos)

    fused_shape = jnp.where(use_ic[:, None, None], fused_shape_ic, shape_lin)
    fused_pos = jnp.where(use_ic[:, None], pos_ic, pos_lin)
    fused_lab = ratio[:, None] * (f_conf[:, None] * f_lab + m_conf[:, None] * m_lab)
    fused_color = lab_to_rgb(fused_lab)
    fused_conf = m_conf + f_conf

    vecs, vals = eigh3x3(fused_shape)

    new_stamps = jnp.stack(
        [m_stamps[:, 0], jnp.full((F,), stamp, jnp.int32)], axis=-1
    )

    def scatter(dst, src):
        return dst.at[jnp.where(do, mid_c, model.capacity)].set(
            src, mode="drop"
        )

    return Supersurfels(
        positions=scatter(model.positions, fused_pos),
        colors=scatter(model.colors, fused_color),
        stamps=scatter(model.stamps, new_stamps),
        orientations=scatter(model.orientations, vecs),
        shapes=scatter(model.shapes, fused_shape),
        dims=scatter(model.dims, vals[:, :2]),
        confidences=scatter(model.confidences, fused_conf),
    )


def _insert(frame: Supersurfels, model: Supersurfels, match: MatchResult,
            nb_supersurfels: Array, R: Array, t: Array, stamp: Array):
    """Append unmatched valid frame surfels (insertSupersurfels,
    supersurfel_fusion_kernels.cu:348-395) via prefix-sum compaction."""
    F = frame.capacity
    C = model.capacity
    insert = (frame.confidences > 0.0) & ~match.matched
    slot_off = jnp.cumsum(insert.astype(jnp.int32)) - 1
    slot = nb_supersurfels + slot_off
    ok = insert & (slot < C)
    tgt = jnp.where(ok, slot, C)

    f_pos = frame.positions @ R.T + t
    f_shape = mult_ABAt(R[None], frame.shapes)
    f_rot = frame.orientations @ R.T  # rows transform: (M R^T) rows = R . row
    new_stamps = jnp.full((F, 2), stamp, jnp.int32)

    def scatter(dst, src):
        return dst.at[tgt].set(src, mode="drop")

    new_model = Supersurfels(
        positions=scatter(model.positions, f_pos),
        colors=scatter(model.colors, frame.colors),
        stamps=scatter(model.stamps, new_stamps),
        orientations=scatter(model.orientations, f_rot),
        shapes=scatter(model.shapes, f_shape),
        dims=scatter(model.dims, frame.dims),
        confidences=scatter(model.confidences, frame.confidences),
    )
    n_inserted = jnp.sum(ok.astype(jnp.int32))
    n_dropped = jnp.sum(insert.astype(jnp.int32)) - n_inserted
    return new_model, nb_supersurfels + n_inserted, n_dropped


def filter_and_compact(model: Supersurfels, nb_supersurfels: Array,
                       depth: Array, R: Array, t: Array,
                       cam: CameraIntrinsics, cfg: FusionConfig,
                       conf_thresh: float, stamp: Array):
    """Stale/free-space removal + stable compaction (filterModel +
    thrust::sort_by_key, supersurfel_fusion_kernels.cu:397-467 and
    supersurfel_fusion.cu:432-475). Returns (model, nb_supersurfels,
    nb_visible)."""
    C = model.capacity
    H, W = depth.shape
    ids = jnp.arange(C, dtype=jnp.int32)
    in_range = ids < nb_supersurfels

    time_diff = stamp - model.stamps[:, 1]
    stale = (
        (time_diff > cfg.delta_t)
        & (model.confidences < conf_thresh)
        & (stamp > cfg.delta_t)
    )
    dead = stale | (model.confidences <= 0.0)

    Rv = R.T
    tv = -(Rv @ t)
    p = model.positions @ Rv.T + tv
    z = p[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = p[:, 0] * cam.fx / safe_z + cam.cx
    v = p[:, 1] * cam.fy / safe_z + cam.cy
    z_ok = (z > cfg.range_min) & (z < cfg.range_max)
    img_ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    zobs = depth[vi, ui]
    free_space = (
        z_ok & img_ok & jnp.isfinite(zobs) & (z < cfg.free_space_ratio * zobs)
    )

    invalid = dead | (~dead & free_space)
    visible = ~invalid & z_ok & img_ok
    # states: 0 active, 1 inactive (out of view), 2 invalid
    state = jnp.where(invalid, 2, jnp.where(visible, 0, 1))
    state = jnp.where(in_range, state, 3)  # slots beyond count sort last

    conf = jnp.where((invalid & in_range) | ~in_range, -1.0, model.confidences)
    model = model._replace(confidences=conf)

    # stable 3-way partition (active < inactive < invalid/beyond) via
    # cumulative sums + one unique-index scatter per SoA field — replaces the
    # thrust::sort_by_key compaction without a device sort
    k0 = state == 0
    k1 = state == 1
    n0 = jnp.sum(k0.astype(jnp.int32))
    n1 = jnp.sum(k1.astype(jnp.int32))
    pos = jnp.where(
        k0, jnp.cumsum(k0.astype(jnp.int32)) - 1,
        jnp.where(
            k1, n0 + jnp.cumsum(k1.astype(jnp.int32)) - 1,
            n0 + n1 + jnp.cumsum((~k0 & ~k1).astype(jnp.int32)) - 1,
        ),
    )

    def permute(a):
        return jnp.zeros_like(a).at[pos].set(a, unique_indices=True)

    model = jax.tree.map(permute, model)

    nb_live = n0 + n1
    nb_vis = n0
    return model, nb_live, nb_vis


class FusionStats(NamedTuple):
    """Per-frame fusion telemetry (all () int32)."""

    n_fused: Array     # frame surfels fused into a matched model surfel
    n_inserted: Array  # frame surfels appended as new model surfels
    n_removed: Array   # model surfels evicted (stale / free-space)
    n_dropped: Array   # frame surfels NOT inserted: model at capacity


def update_model(state: ModelState, frame: Supersurfels, labels: Array,
                 plane_depth: Array, R: Array, t: Array,
                 cam: CameraIntrinsics, cfg: FusionConfig,
                 conf_thresh: float, stamp: Array,
                 allow_insert=None):
    """Full per-frame model maintenance, bootstrap included
    (supersurfel_fusion.cu:350-483). Returns (ModelState, FusionStats).

    allow_insert (optional () bool): when False, the INSERT step is skipped
    while fusion / visibility / filtering stay live — the measured-correct
    granularity for tracking-loss protection (a whole-update freeze goes
    into a stale-visibility death spiral, artifacts/ANALYSIS_r5.md §10;
    unconditional insertion from drifting VO-only poses displaces the map,
    §5 phase A). None (default) = reference behavior: always insert."""
    model, nb, nbv = state.surfels, state.nb_supersurfels, state.nb_visible
    F = frame.capacity

    def bootstrap(_):
        f_pos = frame.positions @ R.T + t
        f_shape = mult_ABAt(R[None], frame.shapes)
        f_rot = frame.orientations @ R.T
        boot = Supersurfels.empty(model.capacity)
        boot = Supersurfels(
            positions=boot.positions.at[:F].set(f_pos),
            colors=boot.colors.at[:F].set(frame.colors),
            stamps=boot.stamps.at[:F].set(frame.stamps),
            orientations=boot.orientations.at[:F].set(f_rot),
            shapes=boot.shapes.at[:F].set(f_shape),
            dims=boot.dims.at[:F].set(frame.dims),
            confidences=boot.confidences.at[:F].set(frame.confidences),
        )
        zero = jnp.int32(0)
        return (ModelState(boot, jnp.int32(F), jnp.int32(F)),
                FusionStats(zero, jnp.int32(F), zero, zero))

    def normal(_):
        vcap = min(cfg.visible_cap, model.capacity)
        vis_model = jax.tree.map(lambda a: a[:vcap], model)
        match = find_best_matches(vis_model, nbv, frame, labels, R, t, cam, cfg)
        fused = _fuse(frame, model, match, R, t, stamp)
        if allow_insert is None:
            inserted, nb_new, n_dropped = _insert(
                frame, fused, match, nb, R, t, stamp
            )
        else:
            inserted, nb_new, n_dropped = jax.lax.cond(
                allow_insert,
                lambda _: _insert(frame, fused, match, nb, R, t, stamp),
                lambda _: (fused, nb, jnp.int32(0)),
                operand=None,
            )
        compacted, nb_live, nb_vis = filter_and_compact(
            inserted, nb_new, plane_depth, R, t, cam, cfg, conf_thresh, stamp
        )
        stats = FusionStats(
            n_fused=jnp.sum(
                ((match.model_match >= 0) & match.matched).astype(jnp.int32)
            ),
            n_inserted=nb_new - nb,
            n_removed=nb_new - nb_live,
            n_dropped=n_dropped,
        )
        return ModelState(compacted, nb_live, nb_vis), stats

    return jax.lax.cond(nb > 0, normal, bootstrap, operand=None)
