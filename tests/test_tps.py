import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supersurfel_fusion_tpu.config import TPSConfig
from supersurfel_fusion_tpu.ops import tps as tps_ops
from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp, shift2d

H, W, CS = 128, 160, 16
GH, GW = H // CS, W // CS


def small_cfg(**kw):
    return TPSConfig(**kw)


def grid_labels():
    y = np.arange(H)[:, None]
    x = np.arange(W)[None, :]
    return jnp.asarray((y // CS) * GW + (x // CS), jnp.int32) * jnp.ones((H, W), jnp.int32)


def test_shift2d():
    a = jnp.arange(12.0).reshape(3, 4)
    out = shift2d(a, 1, 0, fill=-1.0)
    np.testing.assert_allclose(np.asarray(out)[:2], np.asarray(a)[1:])
    np.testing.assert_allclose(np.asarray(out)[2], -1.0)
    out = shift2d(a, 0, -1, fill=0.0)
    np.testing.assert_allclose(np.asarray(out)[:, 1:], np.asarray(a)[:, :3])


def test_cell_reduce_matches_segment_sum(rng):
    labels = np.asarray(grid_labels()).copy()
    # perturb labels within the 3x3 neighbourhood invariant
    labels[5:9, 14:18] = labels[5, 20]  # adopt right-neighbour cell label
    labels = jnp.asarray(labels)
    feats = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    out = tps_ops.cell_reduce(feats, labels, GH, GW, CS)
    ref = jax.ops.segment_sum(
        feats.reshape(-1, 3), labels.reshape(-1), num_segments=GH * GW
    ).reshape(GH, GW, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_lookup_cells(rng):
    table = jnp.asarray(rng.normal(size=(GH, GW, 4)).astype(np.float32))
    labels = grid_labels()
    code = tps_ops._rel_code(labels, GH, GW, CS)
    out = tps_ops.lookup_cells(table, code, GH, GW, CS)
    lab = np.asarray(labels)
    ref = np.asarray(table)[lab // GW, lab % GW]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_boundary_count():
    labels = grid_labels()
    b = np.asarray(tps_ops.boundary_count(labels))
    # interior-of-cell pixels have 0; cell-edge pixels >= 1; image corners 2+
    assert b[8, 8] == 0
    assert b[0, 0] == 2  # two off-image neighbours count as different
    assert b[8, CS - 1] == 1 and b[8, CS] == 1


def test_fit_planes_recovers_plane():
    a, bb, c = 1e-3, -2e-3, 0.7
    y = np.arange(H)[:, None].astype(np.float32)
    x = np.arange(W)[None, :].astype(np.float32)
    disp = jnp.asarray(a * x + bb * y + c)
    labels = grid_labels()
    inl = jnp.ones((H, W), bool)
    theta = np.asarray(tps_ops.fit_planes(disp, labels, inl, GH, GW, CS))
    np.testing.assert_allclose(theta[..., 0], a, atol=1e-6)
    np.testing.assert_allclose(theta[..., 1], bb, atol=1e-6)
    np.testing.assert_allclose(theta[..., 2], c, atol=1e-4)


def test_fit_planes_singular_marks_nan():
    disp = jnp.full((H, W), jnp.inf)  # no valid depth anywhere
    labels = grid_labels()
    inl = jnp.zeros((H, W), bool)
    theta = np.asarray(tps_ops.fit_planes(disp, labels, inl, GH, GW, CS))
    assert np.isnan(theta[..., 2]).all()


def test_segment_respects_color_edge(rng):
    rgb = np.zeros((H, W, 3), np.float32)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    m = (xx + 0.7 * yy) > 100
    rgb[...] = [180, 60, 60]
    rgb[m] = [60, 180, 60]
    rgb += rng.normal(0, 3, rgb.shape).astype(np.float32)
    depth = np.where(m, 2.0, 1.0).astype(np.float32)
    cfg = small_cfg()
    res = tps_ops.segment(
        jnp.asarray(rgb), depth_to_disp(jnp.asarray(depth)), cfg
    )
    lab = np.asarray(res.labels)
    # every superpixel should lie on one side of the edge
    purity = []
    for l in np.unique(lab):
        frac = m[lab == l].mean()
        purity.append(max(frac, 1 - frac))
    assert np.mean(purity) > 0.97
    # locality invariant: labels within 3x3 of own cell
    gy, gx = lab // GW, lab % GW
    py, px = yy // CS, xx // CS
    assert (np.abs(gy - py) <= 1).all() and (np.abs(gx - px) <= 1).all()
    # plane inliers cover most valid pixels
    assert np.asarray(res.inliers).mean() > 0.8


def test_segment_sizes_conserved(rng):
    rgb = jnp.asarray(rng.uniform(0, 255, size=(H, W, 3)).astype(np.float32))
    depth = jnp.ones((H, W), jnp.float32)
    res = tps_ops.segment(rgb, depth_to_disp(depth), small_cfg())
    assert float(jnp.sum(res.stats.size)) == H * W


def test_bilateral_preserves_edges():
    depth = np.ones((64, 64), np.float32)
    depth[:, 32:] = 2.0
    depth[10, 10] = 0.0  # invalid hole
    out = np.asarray(bilateral_filter(jnp.asarray(depth)))
    assert abs(out[5, 5] - 1.0) < 1e-3
    assert abs(out[5, 60] - 2.0) < 1e-3
    assert abs(out[5, 31] - 1.0) < 1e-2  # edge not smeared
    assert out[10, 10] == 0.0  # hole stays invalid


def _plane_stats(theta):
    cx, cy = np.meshgrid(
        np.arange(GW) * CS + CS / 2, np.arange(GH) * CS + CS / 2
    )
    return tps_ops.SuperpixelStats(
        centroid=jnp.asarray(np.stack([cx, cy], -1).astype(np.float32)),
        color=jnp.zeros((GH, GW, 3), jnp.float32),
        size=jnp.full((GH, GW), float(CS * CS)),
        theta=jnp.asarray(theta.astype(np.float32)),
    )


def test_smooth_planes_plane_fixed_point():
    # a globally consistent plane is (approximately) a fixed point of the
    # relaxation (iterateFilter_kernel's coupling is exact on a plane)
    a, bb, c = 5e-4, -3e-4, 0.8
    theta = np.stack(
        [np.full((GH, GW), a), np.full((GH, GW), bb), np.full((GH, GW), c)],
        axis=-1,
    )
    out = np.asarray(tps_ops.smooth_planes(_plane_stats(theta), small_cfg()))
    np.testing.assert_allclose(out[..., 0], a, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], bb, atol=1e-6)
    np.testing.assert_allclose(out[..., 2], c, atol=1e-4)


def test_smooth_planes_reduces_offset_noise(rng):
    # noisy plane OFFSETS (consistent slopes) must be smoothed toward the
    # global plane
    a, bb, c = 5e-4, -3e-4, 0.8
    noise = rng.normal(0, 5e-3, (GH, GW))
    theta = np.stack(
        [np.full((GH, GW), a), np.full((GH, GW), bb), c + noise], axis=-1
    )
    out = np.asarray(tps_ops.smooth_planes(_plane_stats(theta), small_cfg()))
    assert np.isfinite(out).all()
    # the filter smooths the plane HEIGHT at each superpixel centroid
    cx, cy = np.meshgrid(
        np.arange(GW) * CS + CS / 2, np.arange(GH) * CS + CS / 2
    )
    ztrue = a * cx + bb * cy + c
    zin = theta[..., 0] * cx + theta[..., 1] * cy + theta[..., 2]
    zout = out[..., 0] * cx + out[..., 1] * cy + out[..., 2]
    assert np.abs(zout - ztrue).std() < 0.7 * np.abs(zin - ztrue).std()
