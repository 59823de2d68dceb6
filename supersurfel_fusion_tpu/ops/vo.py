"""Sparse visual odometry: persistent 3D local map + robust motion-only PnP.

TPU-native rewrite of `SparseVO` + `LocalMap` + `PnPSolver`
(`core/src/sparse_vo.cpp`, `local_map.cpp`, `pnp_solver.cpp`):

* The local map is a fixed-capacity SoA (positions/descriptors/counters/valid)
  updated with masked writes and compaction — no std::vector growth.
* Matching: project map points into the view, brute-force Hamming, GMS grid
  filter, 100 px gate (`LocalMap::findMatches`, local_map.cpp:200-272).
* Pose: motion-only Gauss-Newton with a Cauchy robust kernel replaces the
  g2o Levenberg-Marquardt run (`PnPSolver::computePose`, pnp_solver.cpp:59-147,
  N_PASSES=2 x 5 iterations, chi2 gate 5.991): same objective, solved with a
  6x6 on-device solve per iteration — no sparse solver needed for one pose.
* Eviction: untracked counters exactly as the reference (counter++ on every
  visible projection, counter-- on every confirmed match, drop at >= 10).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, VOConfig
from supersurfel_fusion_tpu.ops.features import Keypoints
from supersurfel_fusion_tpu.ops.icp import _precond_solve
from supersurfel_fusion_tpu.ops.matching import gms_filter, match_bruteforce
from supersurfel_fusion_tpu.utils.geometry import (
    axis_angle_to_mat,
    orthonormalize,
)

Array = jax.Array


class LocalMap(NamedTuple):
    positions: Array     # (M, 3) world frame
    desc: Array          # (M, 8) uint32
    counters: Array      # (M,) int32 untracked counters
    valid: Array         # (M,) bool

    @staticmethod
    def empty(m: int) -> "LocalMap":
        return LocalMap(
            positions=jnp.zeros((m, 3), jnp.float32),
            desc=jnp.zeros((m, 8), jnp.uint32),
            counters=jnp.zeros((m,), jnp.int32),
            valid=jnp.zeros((m,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]


class VOMatches(NamedTuple):
    map_pos: Array       # (K, 3) matched map point (world)
    kp_xy: Array         # (K, 2) matched keypoint pixel
    map_idx: Array       # (K,) int32 matched map slot or -1
    ok: Array            # (K,) bool
    n: Array             # () int32


def find_matches(lmap: LocalMap, kp: Keypoints, R: Array, t: Array,
                 cam: CameraIntrinsics, cfg: VOConfig
                 ) -> Tuple[VOMatches, LocalMap]:
    """Match frame keypoints against visible local-map points.

    (R, t) is the camera->world pose; map points are projected with its
    inverse. Also applies the counter++ bookkeeping for visible points
    (LocalMap::findMatches, local_map.cpp:246)."""
    Rv = R.T
    tv = -(Rv @ t)
    p_view = lmap.positions @ Rv.T + tv
    z = p_view[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = p_view[:, 0] * cam.fx / safe_z + cam.cx
    v = p_view[:, 1] * cam.fy / safe_z + cam.cy
    vis = (
        lmap.valid
        & (z >= 0.2) & (z <= 5.0)
        & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    )
    proj = jnp.stack([u, v], axis=-1)

    # counters++ for every visible map point (reference increments ALL points
    # each findMatches call; visible-only is the meaningful superset we keep)
    counters = jnp.where(lmap.valid, lmap.counters + 1, lmap.counters)

    midx, dist, mok = match_bruteforce(kp.desc, kp.valid, lmap.desc, vis)
    mxy = proj[midx]
    inl = gms_filter(kp.xy, mxy, mok, float(cam.width), float(cam.height))
    px_dist = jnp.linalg.norm(kp.xy - mxy, axis=-1)
    ok = inl & (px_dist < cfg.match_max_px_dist)

    # counter-- for confirmed matches
    dec = jnp.zeros((lmap.capacity,), jnp.int32).at[
        jnp.where(ok, midx, lmap.capacity)
    ].add(1, mode="drop")
    counters = counters - dec

    matches = VOMatches(
        map_pos=lmap.positions[midx],
        kp_xy=kp.xy,
        map_idx=jnp.where(ok, midx, -1),
        ok=ok,
        n=jnp.sum(ok.astype(jnp.int32)),
    )
    return matches, lmap._replace(counters=counters)


def _pnp_system(R: Array, t: Array, p3d: Array, uv: Array, w_mask: Array,
                cam: CameraIntrinsics, delta2: float):
    """Gauss-Newton normal equations for the reprojection objective with
    Cauchy IRLS weights. Parameterization: left-multiplied view increment
    exp([w, v]) on the world->camera transform."""
    Rv = R.T
    tv = -(Rv @ t)
    pc = p3d @ Rv.T + tv                       # camera-frame points
    z = jnp.maximum(pc[:, 2], 1e-6)
    u_hat = pc[:, 0] * cam.fx / z + cam.cx
    v_hat = pc[:, 1] * cam.fy / z + cam.cy
    r_u = u_hat - uv[:, 0]
    r_v = v_hat - uv[:, 1]
    chi2 = r_u**2 + r_v**2

    w_cauchy = 1.0 / (1.0 + chi2 / delta2)     # IRLS weight rho'(s)
    w = jnp.where(w_mask & (pc[:, 2] > 0.05), w_cauchy, 0.0)

    x, y = pc[:, 0], pc[:, 1]
    iz = 1.0 / z
    iz2 = iz * iz
    # d(u,v)/d(pc)
    du = jnp.stack([cam.fx * iz, jnp.zeros_like(iz), -cam.fx * x * iz2], -1)
    dv = jnp.stack([jnp.zeros_like(iz), cam.fy * iz, -cam.fy * y * iz2], -1)
    # d(pc)/d(xi) for left increment: [I | -[pc]_x] with xi = (v, w)
    # Ju = [du | du . (-[pc]_x)] -> columns (3 trans, 3 rot)
    def cross_cols(dd):
        cx_ = dd[:, 1] * pc[:, 2] - dd[:, 2] * pc[:, 1]
        cy_ = dd[:, 2] * pc[:, 0] - dd[:, 0] * pc[:, 2]
        cz_ = dd[:, 0] * pc[:, 1] - dd[:, 1] * pc[:, 0]
        return jnp.stack([-cx_, -cy_, -cz_], -1)

    Ju = jnp.concatenate([du, cross_cols(du)], axis=-1)   # (N, 6)
    Jv = jnp.concatenate([dv, cross_cols(dv)], axis=-1)

    Juw = Ju * w[:, None]
    Jvw = Jv * w[:, None]
    JtJ = (
        jnp.einsum("ni,nj->ij", Juw, Ju, preferred_element_type=jnp.float32)
        + jnp.einsum("ni,nj->ij", Jvw, Jv, preferred_element_type=jnp.float32)
    )
    Jtr = jnp.einsum("ni,n->i", Juw, r_u) + jnp.einsum("ni,n->i", Jvw, r_v)
    return JtJ, Jtr, chi2


def pnp_solve(R0: Array, t0: Array, p3d: Array, uv: Array, ok: Array,
              cam: CameraIntrinsics, cfg: VOConfig):
    """Robust motion-only pose solve. Returns (R, t, valid, inlier_mask).

    Follows PnPSolver::computePose: `nb_passes` rounds of `nb_gn_iters`
    Gauss-Newton steps; after each round, points with chi2 > threshold are
    demoted and stay out; validity needs >= 20% inliers and < 0.5 m jump."""
    delta2 = cfg.chi2_threshold

    def gn_round(carry, _):
        R, t, active = carry

        def gn_step(carry2, _):
            R, t = carry2
            JtJ, Jtr, _ = _pnp_system(R, t, p3d, uv, active, cam, delta2)
            # Jacobi-preconditioned f32 solve (see ops/icp.py:_precond_solve)
            # — the raw JtJ mixes px^2-scale blocks and is too ill-conditioned
            # for a plain float32 solve (g2o solves in double).
            dx, _, _ = _precond_solve(JtJ, -Jtr, damping=1e-6)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            # left-increment on the view transform: view' = exp(xi) . view
            dv_, dw = dx[:3], dx[3:]
            ang = jnp.linalg.norm(dw)
            axis = dw / jnp.maximum(ang, 1e-12)
            dR = axis_angle_to_mat(axis, ang)
            Rv = R.T
            tv = -(Rv @ t)
            Rv_new = dR @ Rv
            tv_new = dR @ tv + dv_
            R_new = orthonormalize(Rv_new.T)
            t_new = -(R_new @ tv_new)
            return (R_new, t_new), None

        (R, t), _ = jax.lax.scan(gn_step, (R, t), None, length=cfg.nb_gn_iters)
        _, _, chi2 = _pnp_system(R, t, p3d, uv, active, cam, delta2)
        active = active & (chi2 <= cfg.chi2_threshold)
        return (R, t, active), None

    active0 = ok
    (R, t, active), _ = jax.lax.scan(
        gn_round, (R0, t0, active0), None, length=cfg.nb_passes
    )

    n_in = jnp.sum(active.astype(jnp.int32))
    n_all = jnp.maximum(jnp.sum(ok.astype(jnp.int32)), 1)
    jump = jnp.linalg.norm(t - t0)
    valid = (
        (n_in.astype(jnp.float32) >= cfg.min_inlier_ratio * n_all.astype(jnp.float32))
        & (jump < cfg.max_translation_jump)
        & jnp.all(jnp.isfinite(t))
    )
    R_out = jnp.where(valid, R, R0)
    t_out = jnp.where(valid, t, t0)
    return R_out, t_out, valid, active


def update_local_map(lmap: LocalMap, kp: Keypoints, depth0: Array,
                     matches: VOMatches, R: Array, t: Array,
                     cam: CameraIntrinsics, cfg: VOConfig,
                     static_kp: Array | None = None,
                     labels: Array | None = None,
                     static_sp: Array | None = None) -> LocalMap:
    """Insert/replace map points from the frame + untracked eviction
    (LocalMap::update + clean, local_map.cpp:40-83, 185-198).

    `static_kp`: optional per-keypoint static mask (MOD path).
    `labels`/`static_sp`: when given (MOD path), existing map points whose
    projection lands on a dynamic superpixel are evicted — a mover that
    slipped into the map while briefly undetected must not keep feeding
    PnP (LocalMap::updateMOD cleaning pass, local_map.cpp:116-133)."""
    K = kp.capacity
    M = lmap.capacity
    H, W = depth0.shape

    ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    z = depth0[vi, ui]
    has_depth = kp.valid & (z >= 0.2) & (z <= 5.0)
    if static_kp is not None:
        has_depth = has_depth & static_kp

    p_cam = jnp.stack(
        [z * (kp.xy[:, 0] - cam.cx) / cam.fx,
         z * (kp.xy[:, 1] - cam.cy) / cam.fy, z], axis=-1,
    )
    p_world = p_cam @ R.T + t

    # 1) replace matched map points (note reference quirk: `matches_idx[i] > 0`,
    # slot 0 is never replaced — we use >= 0)
    rep = has_depth & (matches.map_idx >= 0)
    rep_tgt = jnp.where(rep, matches.map_idx, M)
    positions = lmap.positions.at[rep_tgt].set(p_world, mode="drop")
    desc = lmap.desc.at[rep_tgt].set(kp.desc, mode="drop")

    # 2) eviction: drop untracked (counter >= threshold) and, on the MOD
    # path, points projecting onto currently-dynamic superpixels
    keep = lmap.valid & (lmap.counters < cfg.untracked_threshold)
    if labels is not None and static_sp is not None:
        Rv = R.T
        tv = -(Rv @ t)
        p_view = lmap.positions @ Rv.T + tv
        zm = p_view[:, 2]
        safe_zm = jnp.where(jnp.abs(zm) > 1e-9, zm, 1e-9)
        um = p_view[:, 0] * cam.fx / safe_zm + cam.cx
        vm = p_view[:, 1] * cam.fy / safe_zm + cam.cy
        in_img = (
            (zm > 0) & (um >= 0) & (um < cam.width)
            & (vm >= 0) & (vm < cam.height)
        )
        ui_m = jnp.clip(jnp.round(um).astype(jnp.int32), 0, W - 1)
        vi_m = jnp.clip(jnp.round(vm).astype(jnp.int32), 0, H - 1)
        on_dynamic = in_img & ~static_sp[labels[vi_m, ui_m]]
        keep = keep & ~on_dynamic

    # 3) insert unmatched new points into free slots (stable compaction:
    # free slots enumerated in order, new points appended)
    ins = has_depth & (matches.map_idx < 0)
    free = ~keep
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1          # rank per free slot
    ins_rank = jnp.cumsum(ins.astype(jnp.int32)) - 1            # rank per insert
    # slot of the r-th free slot: via sort of (occupied, index)
    order = jnp.argsort(jnp.where(free, 0, 1), stable=True)     # free slots first
    ins_slot_candidates = order                                  # (M,)
    n_free = jnp.sum(free.astype(jnp.int32))
    ins_slot = jnp.where(
        ins & (ins_rank < n_free),
        ins_slot_candidates[jnp.clip(ins_rank, 0, M - 1)],
        M,
    )
    positions = positions.at[ins_slot].set(p_world, mode="drop")
    desc = desc.at[ins_slot].set(kp.desc, mode="drop")
    counters = lmap.counters.at[ins_slot].set(0, mode="drop")
    inserted = jnp.zeros((M,), bool).at[ins_slot].set(True, mode="drop")

    valid = keep | inserted
    counters = jnp.where(keep, lmap.counters, counters)
    counters = jnp.where(inserted, 0, counters)
    return LocalMap(positions=positions, desc=desc, counters=counters,
                    valid=valid)


def reset_local_map(kp: Keypoints, depth0: Array, R: Array, t: Array,
                    cam: CameraIntrinsics, m: int) -> LocalMap:
    """Rebuild the map from the current frame (LocalMap::reset)."""
    H, W = depth0.shape
    ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    z = depth0[vi, ui]
    good = kp.valid & (z >= 0.2) & (z <= 5.0)
    p_cam = jnp.stack(
        [z * (kp.xy[:, 0] - cam.cx) / cam.fx,
         z * (kp.xy[:, 1] - cam.cy) / cam.fy, z], axis=-1,
    )
    p_world = p_cam @ R.T + t
    K = kp.capacity
    out = LocalMap.empty(m)
    k = min(K, m)
    return LocalMap(
        positions=out.positions.at[:k].set(p_world[:k]),
        desc=out.desc.at[:k].set(kp.desc[:k]),
        counters=out.counters,
        valid=out.valid.at[:k].set(good[:k]),
    )
