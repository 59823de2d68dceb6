import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.utils import geometry as geo
from supersurfel_fusion_tpu.utils.color import lab_to_rgb, rgb_to_lab


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return geo.quat_to_mat(jnp.asarray(q, dtype=jnp.float32))


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = geo.mat_to_quat(R)
    R2 = geo.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_rotation_orthonormal(rng):
    R = random_rotations(rng, 32)
    eye = np.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5
    )
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_axis_angle(rng):
    axis = jnp.array([[0.0, 0.0, 1.0]])
    angle = jnp.array([np.pi / 2])
    R = geo.axis_angle_to_mat(axis, angle)[0]
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(R @ v), [0.0, 1.0, 0.0], atol=1e-6)


def test_eigh3x3_matches_numpy(rng):
    # random PSD covariances with distinct-ish eigenvalues
    B = rng.normal(size=(128, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1) + 1e-3 * np.eye(3, dtype=np.float32)
    vecs, vals = geo.eigh3x3(jnp.asarray(A), n_iters=16)
    vals_np = np.sort(np.linalg.eigvalsh(A), axis=-1)[:, ::-1]  # descending
    np.testing.assert_allclose(np.asarray(vals), vals_np, rtol=2e-2, atol=1e-3)
    # rows are eigenvectors: A v ≈ λ v
    for r in range(3):
        v = np.asarray(vecs)[:, r, :]
        Av = np.einsum("nij,nj->ni", A, v)
        lam = np.asarray(vals)[:, r][:, None]
        resid = np.linalg.norm(Av - lam * v, axis=-1)
        scale = np.linalg.norm(A, axis=(1, 2))
        assert np.median(resid / scale) < 5e-2


def test_eigh3x3_planar_normal():
    # a flat (planar) covariance: normal must be the z axis
    A = jnp.asarray(np.diag([2.0, 1.5, 1e-4]).astype(np.float32))[None]
    vecs, vals = geo.eigh3x3(A)
    n = np.abs(np.asarray(vecs)[0, 2])
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-3)
    assert np.asarray(vals)[0, 0] > np.asarray(vals)[0, 2]


def test_solve3x3(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A += 3 * np.eye(3, dtype=np.float32)
    x_true = rng.normal(size=(64, 3)).astype(np.float32)
    b = np.einsum("nij,nj->ni", A, x_true)
    x, ok = geo.solve3x3(jnp.asarray(A), jnp.asarray(b))
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=2e-3, atol=2e-3)


def test_inv3x3_sym(rng):
    B = rng.normal(size=(32, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)
    Ainv, ok = geo.inv3x3_sym(jnp.asarray(A))
    assert bool(np.all(np.asarray(ok)))
    prod = np.asarray(Ainv) @ A
    np.testing.assert_allclose(prod, np.eye(3)[None].repeat(32, 0), atol=1e-2)


def test_compose_invert(rng):
    Ra = random_rotations(rng, 8)
    Rb = random_rotations(rng, 8)
    ta = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    Rc, tc = geo.compose(Ra, ta, Rb, tb)
    Ri, ti = geo.invert(Rc, tc)
    Rid, tid = geo.compose(Ri, ti, Rc, tc)
    np.testing.assert_allclose(
        np.asarray(Rid), np.eye(3)[None].repeat(8, 0), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tid), 0.0, atol=1e-5)


def test_lab_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(5, 250, size=(256, 3)).astype(np.float32))
    lab = rgb_to_lab(rgb)
    rgb2 = lab_to_rgb(lab)
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb), atol=1.0)
    # sanity: white and black
    np.testing.assert_allclose(
        np.asarray(rgb_to_lab(jnp.array([255.0, 255.0, 255.0]))),
        [100.0, 0.0, 0.0],
        atol=0.5,
    )
