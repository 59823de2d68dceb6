"""Batched 3D geometry primitives: rotations, SE(3), symmetric 3x3
eigendecomposition and small linear solves.

TPU-native equivalents of the reference's header-only device math
(`core/include/supersurfel_fusion/{vector_math.cuh, matrix_math.cuh}`), written
as branchless, fully batched jnp functions so they vectorize on the VPU and
compose under jit/vmap/shard_map. All matrices are row-major `(..., 3, 3)`
arrays; covariances are full symmetric matrices (the reference packs 6 floats,
we keep 3x3 — XLA lays these out efficiently and it keeps every op `einsum`able).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def normalize(v: Array, eps: float = 1e-12) -> Array:
    """Safe L2 normalization along the last axis."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def outer3(v: Array) -> Array:
    """v v^T for (..., 3) vectors -> (..., 3, 3)."""
    return v[..., :, None] * v[..., None, :]


def mult_ABAt(A: Array, B: Array) -> Array:
    """A @ B @ A^T (reference: `mult_ABAt`, matrix_math.cuh)."""
    return jnp.einsum("...ij,...jk,...lk->...il", A, B, A)


def skew(v: Array) -> Array:
    """Cross-product matrix [v]_x for (..., 3) vectors."""
    zero = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------


def axis_angle_to_mat(axis: Array, angle: Array) -> Array:
    """Rodrigues rotation from a *unit* axis and angle (broadcasting)."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def quat_to_mat(q: Array) -> Array:
    """Unit quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(R: Array) -> Array:
    """Rotation matrix -> unit quaternion (x, y, z, w), branchless.

    Computes all four Shepperd candidates and selects the best-conditioned one
    with `where`, so it vmaps/jits with no data-dependent control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four squared components (up to scale 4q_i^2)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # candidate quaternions, each valid when its pivot is the largest
    def cand_w():
        s = jnp.sqrt(jnp.maximum(qw2, 1e-12)) * 2.0
        return jnp.stack(
            [(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], axis=-1
        )

    def cand_x():
        s = jnp.sqrt(jnp.maximum(qx2, 1e-12)) * 2.0
        return jnp.stack(
            [0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], axis=-1
        )

    def cand_y():
        s = jnp.sqrt(jnp.maximum(qy2, 1e-12)) * 2.0
        return jnp.stack(
            [(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], axis=-1
        )

    def cand_z():
        s = jnp.sqrt(jnp.maximum(qz2, 1e-12)) * 2.0
        return jnp.stack(
            [(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], axis=-1
        )

    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    return normalize(q)


def orthonormalize(R: Array) -> Array:
    """Re-orthonormalize a near-rotation (reference uses
    `Eigen::Quaternionf(R).normalized()`, supersurfel_fusion.cu:320-327)."""
    return quat_to_mat(mat_to_quat(R))


# ---------------------------------------------------------------------------
# Rigid transforms: stored as (R: (...,3,3), t: (...,3))
# ---------------------------------------------------------------------------


def transform_points(R: Array, t: Array, p: Array) -> Array:
    return jnp.einsum("...ij,...j->...i", R, p) + t


def compose(Ra: Array, ta: Array, Rb: Array, tb: Array):
    """(Ra, ta) ∘ (Rb, tb): apply b first, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def invert(R: Array, t: Array):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


# ---------------------------------------------------------------------------
# Symmetric 3x3 eigendecomposition (batched, branchless)
# ---------------------------------------------------------------------------


def _dominant_eigvec(P: Array, n_iters: int) -> Array:
    """Dominant eigenvector of a symmetric PSD 3x3 by trace-normalized
    repeated squaring (the reference's `eigenDecomposition` scheme,
    supersurfel_fusion_kernels.cu:48-111, made branchless).

    After k squarings P^(2^k)/tr converges to the projector v v^T onto the
    dominant eigenspace; we read off the column of largest norm.
    """
    def body(_, Pi):
        Pi = Pi @ Pi
        tr = jnp.trace(Pi, axis1=-2, axis2=-1)[..., None, None]
        return Pi / jnp.maximum(tr, 1e-30)

    Pi = P / jnp.maximum(jnp.trace(P, axis1=-2, axis2=-1)[..., None, None], 1e-30)
    Pi = jax.lax.fori_loop(0, n_iters, body, Pi)
    # column with the largest norm = best-conditioned representative of v
    norms = jnp.sum(Pi * Pi, axis=-2)                     # (..., 3)
    best = jnp.argmax(norms, axis=-1)[..., None, None]    # (..., 1, 1)
    col = jnp.take_along_axis(Pi, best, axis=-1)[..., 0]  # (..., 3)
    return normalize(col)


def eigh3x3(A: Array, n_iters: int = 10):
    """Eigendecomposition of symmetric 3x3 covariance matrices.

    Returns `(eigvecs, eigvals)` where `eigvecs` is a rotation whose ROWS are
    eigenvectors ordered (major tangent, minor tangent, normal) and `eigvals`
    are the matching eigenvalues — the same frame convention as the reference
    (`orientations[k].rows[2]` is the surfel normal).
    """
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    tr = jnp.where(jnp.abs(tr) > 1e-30, tr, 1e-30)
    An = A / tr
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)

    e0 = _dominant_eigvec(An, n_iters)          # largest eigenvalue dir
    e2 = _dominant_eigvec(eye - An, n_iters)    # smallest eigenvalue dir (normal)
    e1 = normalize(jnp.cross(e2, e0))
    # re-orthogonalize e0 against the (better conditioned) normal
    e0 = normalize(jnp.cross(e1, e2))

    vecs = jnp.stack([e0, e1, e2], axis=-2)
    # Rayleigh quotients
    vals = jnp.einsum("...ri,...ij,...rj->...r", vecs, A, vecs)
    return vecs, vals


# ---------------------------------------------------------------------------
# Small linear solves
# ---------------------------------------------------------------------------


def solve3x3(A: Array, b: Array, eps: float = 1e-20):
    """Batched 3x3 solve via adjugate; returns (x, ok_mask).

    Replaces the reference's `solvePlaneEquations`
    (TPS_RGBD_kernels.cu:27-59) with a standard Cramer solve.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02

    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    adjT = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    ok = jnp.abs(det) > eps
    safe_det = jnp.where(ok, det, 1.0)
    x = jnp.einsum("...ij,...j->...i", adjT, b) / safe_det[..., None]
    return jnp.where(ok[..., None], x, 0.0), ok


def inv3x3_sym(A: Array, eps: float = 1e-20):
    """Batched symmetric 3x3 inverse; returns (A_inv, ok_mask).

    Equivalent of `inverse(Cov3, Cov3&)` in matrix_math.cuh used by the
    fusion inverse-covariance blend."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    det = a00 * c00 + a01 * c01 + a02 * c02
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c01, c11, c12], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    ok = jnp.abs(det) > eps
    safe_det = jnp.where(ok, det, 1.0)
    inv = adj / safe_det[..., None, None]
    return jnp.where(ok[..., None, None], inv, eye), ok
