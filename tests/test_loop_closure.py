import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.ops.loop_closure import (
    KeyframeStore,
    add_keyframe_payload,
    ransac_rigid_3d,
)
from supersurfel_fusion_tpu.ops.ferns import (
    add_keyframe,
    compute_codes,
    make_fern_table,
    query,
)
from supersurfel_fusion_tpu.config import FernsConfig
from supersurfel_fusion_tpu.utils.geometry import axis_angle_to_mat


def test_ransac_rigid_recovers_transform(rng):
    n = 120
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    axis = np.array([0.2, -0.5, 1.0]); axis /= np.linalg.norm(axis)
    R = np.asarray(axis_angle_to_mat(jnp.asarray(axis, jnp.float32),
                                     jnp.asarray(0.4)))
    t = np.array([0.3, -0.1, 0.5], np.float32)
    dst = src @ R.T + t
    dst[:30] += rng.uniform(0.5, 2.0, (30, 3))  # 25% outliers
    Rf, tf, ok, n_in = ransac_rigid_3d(
        jnp.asarray(src), jnp.asarray(dst.astype(np.float32)),
        jnp.ones(n, bool),
    )
    assert bool(ok)
    ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(Rf) @ R.T) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    assert np.linalg.norm(np.asarray(tf) - t) < 0.01
    assert int(n_in) >= 85


def test_ransac_rigid_rejects_garbage(rng):
    src = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    dst = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    _, _, ok, _ = ransac_rigid_3d(jnp.asarray(src), jnp.asarray(dst),
                                  jnp.ones(60, bool))
    assert not bool(ok)


def test_fern_codes_and_query(rng):
    cfg = FernsConfig(max_keyframes=8)
    H, W = 480, 640
    tbl = make_fern_table(cfg, W, H)
    # structured, clearly distinct scenes (downsampling smears noise toward
    # the mean, so random-noise frames would alias to similar codes)
    y, x = np.mgrid[0:H, 0:W]
    rgb1 = np.stack([(x // 80 % 2) * 255.0, (y // 80 % 2) * 255.0,
                     np.full((H, W), 30.0)], -1).astype(np.float32)
    rgb2 = np.stack([np.full((H, W), 200.0), (x // 40 % 2) * 255.0,
                     ((x + y) // 60 % 2) * 255.0], -1).astype(np.float32)
    rgb1 = jnp.asarray(rgb1)
    rgb2 = jnp.asarray(rgb2)
    d1 = jnp.asarray(np.where((x // 100 % 2) > 0, 1.0, 3.5).astype(np.float32))
    d2 = jnp.asarray(np.where((y // 60 % 2) > 0, 4.5, 0.7).astype(np.float32))
    c1 = compute_codes(rgb1, d1, *tbl, cfg.pyramid_level)
    c2 = compute_codes(rgb2, d2, *tbl, cfg.pyramid_level)

    from supersurfel_fusion_tpu.ops.ferns import FernDB

    db = FernDB.empty(cfg.max_keyframes, cfg.nb_ferns)
    # empty DB -> new frame
    _, diss, is_new = query(db, c1, cfg.new_frame_thresh)
    assert bool(is_new) and float(diss) == 1.0
    db = add_keyframe(db, c1, jnp.eye(3), jnp.zeros(3), jnp.int32(0))
    # same frame -> perfect match, not new
    bid, diss, is_new = query(db, c1, cfg.new_frame_thresh)
    assert int(bid) == 0 and float(diss) == 0.0 and not bool(is_new)
    # unrelated frame -> dissimilar, new
    bid2, diss2, is_new2 = query(db, c2, cfg.new_frame_thresh)
    assert float(diss2) > 0.5 and bool(is_new2)


def test_model_export(tmp_path):
    from supersurfel_fusion_tpu.io.export import export_model, export_model_ply
    from supersurfel_fusion_tpu.types import Supersurfels

    m = Supersurfels.empty(16)
    m = m._replace(
        positions=jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                              jnp.float32),
        confidences=jnp.asarray(
            np.where(np.arange(16) < 10, 500.0, -1.0), jnp.float32
        ),
        colors=jnp.full((16, 3), 128.0),
    )
    p = str(tmp_path / "model.txt")
    n = export_model(p, m, 16, conf_thresh=100.0)
    assert n == 10
    lines = open(p).read().strip().split("\n\n")
    assert len(lines) == 10
    assert len(lines[0].splitlines()) == 6
    p2 = str(tmp_path / "model.ply")
    n2 = export_model_ply(p2, m, 16)
    assert n2 == 10
    assert "element vertex 10" in open(p2).read()
