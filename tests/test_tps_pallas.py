"""Pallas TPS kernel vs the XLA reference implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supersurfel_fusion_tpu.config import TPSConfig
from supersurfel_fusion_tpu.ops import tps as tps_ref
from supersurfel_fusion_tpu.ops import tps_pallas
from supersurfel_fusion_tpu.ops.depth import depth_to_disp


def test_pallas_matches_xla_segment():
    H, W = 64, 128
    rng = np.random.default_rng(0)
    rgb = np.zeros((H, W, 3), np.float32)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    m = (xx + 0.7 * yy) > 70
    rgb[...] = [180, 60, 60]
    rgb[m] = [60, 180, 60]
    rgb += rng.normal(0, 3, rgb.shape).astype(np.float32)
    depth = np.where(m, 2.0, 1.0).astype(np.float32)
    depth[5:9, 11:17] = 0.0  # invalid hole
    disp = depth_to_disp(jnp.asarray(depth))
    cfg = TPSConfig(nb_iters=4)

    res_ref = tps_ref.segment(jnp.asarray(rgb), disp, cfg)
    res_pal = tps_pallas.segment(jnp.asarray(rgb), disp, cfg, interpret=True)

    lr = np.asarray(res_ref.labels)
    lp = np.asarray(res_pal.labels)
    # bf16 stat rounding may flip a few boundary pixels; demand near-identity
    assert (lr == lp).mean() > 0.97
    assert float(jnp.sum(res_pal.stats.size)) == H * W
    np.testing.assert_allclose(
        np.asarray(res_pal.inliers).mean(),
        np.asarray(res_ref.inliers).mean(),
        atol=0.02,
    )
    th_r = np.asarray(res_ref.stats.theta)
    th_p = np.asarray(res_pal.stats.theta)
    both = np.isfinite(th_r[..., 2]) & np.isfinite(th_p[..., 2])
    # compare plane fits only where the segmentations agree everywhere in
    # the cell's support: use a loose global check
    assert np.isfinite(th_p[..., 2]).mean() > 0.9
    assert np.nanmedian(np.abs(th_r[both] - th_p[both])) < 1e-3


@pytest.mark.tpu
def test_pallas_compiled_on_tpu():
    """Run the real Mosaic lowering (interpret=False) when a TPU is present.

    The kernel relies on several Mosaic-specific workarounds (arithmetic
    selects, matmul upsampling, no i1 vectors across fori_loop); interpret
    mode does not exercise those, so this guards against lowering
    regressions. Run with `TPU_TESTS=1 pytest -m tpu`; skipped on CPU CI."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU for the compiled Mosaic path")

    H, W = 64, 128
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    depth = np.full((H, W), 1.5, np.float32)
    disp = depth_to_disp(jnp.asarray(depth))
    cfg = TPSConfig(nb_iters=4)

    res_int = tps_pallas.segment(jnp.asarray(rgb), disp, cfg, interpret=True)
    res_tpu = tps_pallas.segment(jnp.asarray(rgb), disp, cfg, interpret=False)
    li = np.asarray(res_int.labels)
    lt = np.asarray(res_tpu.labels)
    assert (li == lt).mean() > 0.97
    assert float(jnp.sum(res_tpu.stats.size)) == H * W


@pytest.mark.tpu
def test_pallas_real_frame_agreement_on_tpu(fr1_xyz_path):
    """Mosaic vs XLA label agreement on a REAL 640x480 TUM frame
    (round-2 verdict #8). Run with `TPU_TESTS=1 pytest -m tpu`."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU for the compiled Mosaic path")

    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops.depth import bilateral_filter

    ds = TUMDataset(fr1_xyz_path)
    f = ds.load_frame(0)
    cfg = TPSConfig()
    fdepth = bilateral_filter(jnp.asarray(f.depth), 0.03, 4.5, 6)
    disp = depth_to_disp(fdepth)
    rgb = jnp.asarray(f.rgb, jnp.float32)

    res_xla = tps_ref.segment(rgb, disp, cfg)
    res_tpu = tps_pallas.segment(rgb, disp, cfg, interpret=False)
    lx = np.asarray(res_xla.labels)
    lt = np.asarray(res_tpu.labels)
    assert (lx == lt).mean() > 0.95, (lx == lt).mean()
    assert float(jnp.sum(res_tpu.stats.size)) == 640 * 480
