"""Dense frame-to-model registration: symmetric point-to-plane ICP.

TPU-native rewrite of `DenseRegistration::featureConstrainedSymmetricICP`
(`core/src/dense_registration.cu:245-424`) and its fused correspondence +
normal-equation kernel `computeSymmetricICPSystem`
(`core/include/supersurfel_fusion/dense_registration_kernels.cuh:175-291`).

Key differences from the CUDA design, driven by the hardware:

* The whole Gauss-Newton loop lives inside one jitted `lax.while_loop` —
  the reference synchronizes the device and round-trips the 29-float system
  through unified memory every iteration (dense_registration.cu:321-333); we
  never leave the chip, including the 6x6 solve.
* The block-tree reduction + atomicAdd becomes two (N,6) matmul contractions
  (J^T J = X1^T X1 + X2^T X2) that run on the MXU.
* Target lookups (frame surfel normal/color/confidence + slanted-plane depth
  at the projected pixel) are precomputed once as per-pixel maps; each GN
  iteration then does a single dynamic gather of 10 floats per source surfel.

The reference's optional sparse 3D-3D feature rows are dead code in the
shipped pipeline (the block filling `source_features3D` is commented out,
supersurfel_fusion.cu:244-295), so they are omitted here.

Parameterization (identical math): solve (J^T J) x = J^T r with
x = (rot_axis, tran); theta = 0.5*atan(|rot_axis|); tran *= cos(theta);
T_iter = R(theta) * T(tran) * R(theta); accumulate T_inc = T_iter * T_inc
(dense_registration.cu:367-386).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, ICPConfig
from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.color import rgb_to_lab
from supersurfel_fusion_tpu.utils.geometry import (
    axis_angle_to_mat,
    normalize,
    orthonormalize,
)

Array = jax.Array


class ICPResult(NamedTuple):
    R_rel: Array      # (3, 3)
    t_rel: Array      # (3,)
    valid: Array      # () bool
    inliers: Array    # () float — inlier count of the last iteration
    error: Array      # () float — sqrt(r / inliers) of the last iteration
    # () int32 gate bitmask: 1=min_inliers ok, 2=cov gate ok, 4=translation
    # gate ok, 8=ran >0 iterations. valid == (code == 15).
    code: Array = None
    cov_diag: Array = None  # (6,) pose covariance diagonal (gate input)


def build_target_maps(frame: Supersurfels, labels: Array, plane_depth: Array,
                      cam: CameraIntrinsics, cell_size: int,
                      z_min: float = 0.2, z_max: float = 5.0) -> Array:
    """Per-pixel target fields for projective association: (H, W, 10) =
    [pt(3), nt(3), lab(3), valid(1)].

    pt is the backprojected slanted-plane depth at the pixel (the reference
    reads tex_depth, not the surfel position — dense_registration_kernels.cuh
    :222-228); nt/color/validity come from the pixel's superpixel surfel.
    """
    from supersurfel_fusion_tpu.ops.tps import _rel_code, lookup_cells

    H, W = labels.shape
    gh, gw = H // cell_size, W // cell_size
    n_sp = gh * gw

    code = _rel_code(labels, gh, gw, cell_size)
    table = jnp.concatenate(
        [
            frame.orientations[:, 2, :].reshape(gh, gw, 3),   # normals
            rgb_to_lab(frame.colors).reshape(gh, gw, 3),
            (frame.confidences > 0.0).astype(jnp.float32).reshape(gh, gw, 1),
        ],
        axis=-1,
    )
    per_px = lookup_cells(table, code, gh, gw, cell_size)      # (H, W, 7)

    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    zt = plane_depth
    depth_ok = jnp.isfinite(zt) & (zt >= z_min) & (zt <= z_max)
    zts = jnp.where(depth_ok, zt, 0.0)
    pt = jnp.stack(
        [(x - cam.cx) * zts / cam.fx, (y - cam.cy) * zts / cam.fy, zts], axis=-1
    )
    valid = (per_px[..., 6] > 0.5) & depth_ok
    return jnp.concatenate(
        [pt, per_px[..., 0:3], per_px[..., 3:6], valid[..., None].astype(jnp.float32)],
        axis=-1,
    )


def _build_system(src_pos: Array, src_normal: Array, src_lab: Array,
                  src_mask: Array, target_maps: Array, R: Array, t: Array,
                  cam: CameraIntrinsics, cfg: ICPConfig):
    """One linearization: returns (JtJ (6,6), Jtr (6,), r, inliers)."""
    H, W, _ = target_maps.shape
    ps = src_pos @ R.T + t                                     # (N, 3)
    u = jnp.round(ps[:, 0] * cam.fx / jnp.where(ps[:, 2] != 0, ps[:, 2], 1e-9)
                  + cam.cx).astype(jnp.int32)
    v = jnp.round(ps[:, 1] * cam.fy / jnp.where(ps[:, 2] != 0, ps[:, 2], 1e-9)
                  + cam.cy).astype(jnp.int32)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (ps[:, 2] > 0)
    idx = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)

    tm = target_maps.reshape(H * W, 10)[idx]                   # (N, 10) gather
    pt, nt, tlab, tvalid = tm[:, 0:3], tm[:, 3:6], tm[:, 6:9], tm[:, 9]

    ns = normalize(src_normal @ R.T)
    color_dist = jnp.linalg.norm(src_lab - tlab, axis=-1)
    dist = jnp.linalg.norm(ps - pt, axis=-1)
    ndot = jnp.abs(jnp.sum(ns * nt, axis=-1))

    ok = (
        src_mask
        & inb
        & (tvalid > 0.5)
        & (color_dist < cfg.max_color_dist)
        & (dist < cfg.max_dist)
        & (ndot > cfg.min_normal_dot)
    )

    d = pt - ps
    c1 = jnp.cross(pt, ns)
    c2 = jnp.cross(ps, nt)
    dn1 = jnp.sum(d * ns, axis=-1, keepdims=True)
    dn2 = jnp.sum(d * nt, axis=-1, keepdims=True)

    # binary correspondence weights, like the reference's hard gates
    # (dense_registration_kernels.cuh:232-234). A Huber IRLS variant was
    # measured WORSE on both TUM sequences (see config.ICPConfig note).
    w = ok.astype(jnp.float32)[:, None]

    x1 = jnp.concatenate([c1, ns], axis=-1) * w                # (N, 6)
    x2 = jnp.concatenate([c2, nt], axis=-1) * w

    JtJ = (
        jnp.einsum("ni,nj->ij", x1, x1, preferred_element_type=jnp.float32)
        + jnp.einsum("ni,nj->ij", x2, x2, preferred_element_type=jnp.float32)
    )
    Jtr = jnp.einsum("ni,n->i", x1, dn1[:, 0] * w[:, 0]) + jnp.einsum(
        "ni,n->i", x2, dn2[:, 0] * w[:, 0]
    )
    r = jnp.sum((dn2[:, 0] ** 2) * w[:, 0])
    # gate/count semantics stay binary (the robust weight only shapes the
    # normal equations)
    inliers = jnp.sum(ok.astype(jnp.float32))
    return JtJ, Jtr, r, inliers


def _precond_solve(JtJ: Array, Jtr: Array, damping: float = 1e-7,
                   abs_damping: float = 0.0):
    """Jacobi-preconditioned 6x6 solve: S (S JtJ S) S^-1 x = S Jtr.

    The raw JtJ mixes rotation rows (scale ~ inliers * |p|^2) with
    translation rows (~ inliers), giving condition numbers that make a plain
    float32 solve/inverse garbage — the reference sidesteps this by casting
    to double (dense_registration.cu:329-395). Normalizing by diag^-1/2
    brings the condition number to O(1), recovering double-quality results
    in f32. Returns (x, S) so callers can form cov = S inv(A) S.

    `abs_damping`: Tikhonov term on the RAW (unnormalized) system,
    (JtJ + lambda I) x = Jtr — shrinks the step along directions whose raw
    curvature is below lambda (planar-scene degeneracies) while leaving
    well-constrained directions untouched (ICPConfig.solve_damping)."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(JtJ), 1e-20, None))
    S = 1.0 / d
    A = JtJ * S[:, None] * S[None, :]
    A = A + jnp.eye(6, dtype=JtJ.dtype) * damping
    if abs_damping:
        A = A + jnp.diag(abs_damping * S * S)
    y = jnp.linalg.solve(A, Jtr * S)
    return y * S, S, A


def _apply_solution(Xp: Array):
    """x = (rot_axis, tran) -> T_iter = R(theta)*T(tran*cos)*R(theta)."""
    rot_axis = Xp[0:3]
    tran = Xp[3:6]
    nrm = jnp.linalg.norm(rot_axis)
    angle = 0.5 * jnp.arctan(nrm)
    axis = rot_axis / jnp.maximum(nrm, 1e-12)
    Rh = axis_angle_to_mat(axis, angle)
    tc = tran * jnp.cos(angle)
    # R(theta) * T(t) * R(theta): R_total = Rh @ Rh ; t_total = Rh @ t
    R_iter = orthonormalize(Rh @ Rh)
    t_iter = Rh @ tc
    return R_iter, t_iter


def symmetric_icp(model: Supersurfels, nb_visible: Array, target_maps: Array,
                  R_view: Array, t_view: Array, cam: CameraIntrinsics,
                  cfg: ICPConfig, axis_name: str | None = None) -> ICPResult:
    """Frame-to-model refinement. `model` is in world frame; (R_view, t_view)
    is the current world->camera estimate. Returns the relative camera-frame
    correction (R_rel, t_rel) to compose into the pose exactly as the
    reference does (supersurfel_fusion.cu:313-318).

    `axis_name`: when called inside `shard_map` with the model SoA sharded on
    its capacity axis, pass the mesh axis name — each shard linearizes its
    own block and the 6x6 normal equations are `psum`-reduced, so every
    device runs the identical GN iteration (distributed-BA pattern,
    SURVEY.md §2.3). `nb_visible` is then the shard-LOCAL visible count."""
    N = model.capacity
    ids = jnp.arange(N, dtype=jnp.int32)
    src_mask = (ids < nb_visible) & (model.confidences > 0.0)
    src_lab = rgb_to_lab(model.colors)
    src_normal = model.orientations[:, 2, :]

    def system(R_inc, t_inc):
        R_c = R_inc @ R_view
        t_c = R_inc @ t_view + t_inc
        out = _build_system(
            model.positions, src_normal, src_lab, src_mask,
            target_maps, R_c, t_c, cam, cfg,
        )
        if axis_name is not None:
            out = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), out)
        return out

    def cond(state):
        it, _, _, prev_err, _, _, _, cont = state
        return cont & (it < cfg.nb_iters)

    def body(state):
        it, R_inc, t_inc, prev_err, _, _, _, _ = state
        JtJ, Jtr, r, inl = system(R_inc, t_inc)
        err = jnp.sqrt(r / jnp.maximum(inl, 1.0))
        enough = inl >= cfg.min_inliers
        Xp, _, _ = _precond_solve(JtJ, Jtr, abs_damping=cfg.solve_damping)
        Xp = jnp.where(jnp.isfinite(Xp), Xp, 0.0)
        R_it, t_it = _apply_solution(Xp)
        R_new = jnp.where(enough, R_it @ R_inc, R_inc)
        t_new = jnp.where(enough, R_it @ t_inc + t_it, t_inc)
        improving = (err / jnp.maximum(prev_err, 1e-20)) <= cfg.rel_error_break
        cont = enough & improving
        return (it + 1, R_new, t_new, err, JtJ, inl, enough, cont)

    init = (
        jnp.int32(0),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
        jnp.float32(jnp.finfo(jnp.float32).max),
        jnp.zeros((6, 6), jnp.float32),
        jnp.float32(0.0),
        jnp.bool_(True),
        jnp.bool_(True),
    )
    it, R_inc, t_inc, err, JtJ, inl, enough, _ = jax.lax.while_loop(
        cond, body, init
    )

    # validity gates: pose covariance diag + translation magnitude
    # (dense_registration.cu:394-421). The covariance is computed through the
    # same Jacobi preconditioning as the solve: cov = S inv(S JtJ S) S —
    # inverting the raw JtJ in f32 produced garbage diagonals that failed
    # the 0.05 gate on ~47% of fr1/xyz frames (measured), while the true
    # values are ~2e-3. With solve_damping the covariance is that of the
    # DAMPED estimator (inv(JtJ + lambda I)): the damped solve cannot move
    # along weakly-observable directions, so the binary gate no longer needs
    # to reject those frames — measured on fr1/xyz full sequence, this takes
    # ICP acceptance 51% -> ~100% and ATE 0.0349 -> 0.0195 (reference
    # parity; see config.ICPConfig.solve_damping).
    _, S, A = _precond_solve(JtJ, jnp.zeros((6,), JtJ.dtype),
                             abs_damping=cfg.solve_damping)
    cov_diag = jnp.diagonal(jnp.linalg.inv(A)) * S * S
    cov_ok = jnp.all(cov_diag < cfg.cov_thresh) & jnp.all(
        jnp.isfinite(cov_diag)
    )
    t_ok = jnp.linalg.norm(t_inc) <= cfg.max_translation
    valid = enough & cov_ok & t_ok & (it > 0)
    code = (
        enough.astype(jnp.int32)
        + 2 * cov_ok.astype(jnp.int32)
        + 4 * t_ok.astype(jnp.int32)
        + 8 * (it > 0).astype(jnp.int32)
    )

    R_rel = R_inc.T
    t_rel = -(R_rel @ t_inc)
    return ICPResult(R_rel=R_rel, t_rel=t_rel, valid=valid, inliers=inl,
                     error=err, code=code, cov_diag=cov_diag)
