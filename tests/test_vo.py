import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import CameraIntrinsics, VOConfig
from supersurfel_fusion_tpu.ops.features import Keypoints
from supersurfel_fusion_tpu.ops.vo import (
    LocalMap,
    VOMatches,
    pnp_solve,
    reset_local_map,
    update_local_map,
)
from supersurfel_fusion_tpu.utils.geometry import axis_angle_to_mat

CAM = CameraIntrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                       width=640, height=480)


def make_scene(rng, n=120):
    p = np.stack(
        [
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(-1.0, 1.0, n),
            rng.uniform(1.0, 4.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return p


def project(p, R, t):
    pc = (p - t) @ R  # world -> camera: R^T (p - t)
    u = pc[:, 0] * CAM.fx / pc[:, 2] + CAM.cx
    v = pc[:, 1] * CAM.fy / pc[:, 2] + CAM.cy
    return np.stack([u, v], -1), pc[:, 2]


def test_pnp_recovers_pose(rng):
    p3d = make_scene(rng)
    axis = np.array([0.3, 0.8, -0.1]); axis /= np.linalg.norm(axis)
    R_gt = np.asarray(axis_angle_to_mat(jnp.asarray(axis, jnp.float32),
                                        jnp.asarray(0.05)))
    t_gt = np.array([0.05, -0.03, 0.08], np.float32)
    uv, z = project(p3d, R_gt, t_gt)
    ok = (z > 0.1)
    uv += rng.normal(0, 0.3, uv.shape)  # pixel noise

    cfg = VOConfig()
    R, t, valid, inliers = pnp_solve(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(p3d), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(ok), CAM, cfg,
    )
    assert bool(valid)
    ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R) @ R_gt.T) - 1) / 2, -1, 1)))
    assert ang < 0.15, ang
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.01


def test_pnp_robust_to_outliers(rng):
    p3d = make_scene(rng, 150)
    R_gt = np.eye(3, dtype=np.float32)
    t_gt = np.array([0.1, 0.0, 0.0], np.float32)
    uv, z = project(p3d, R_gt, t_gt)
    # corrupt 30% of matches grossly
    n_out = 45
    uv[:n_out] += rng.uniform(40, 200, (n_out, 2))
    cfg = VOConfig()
    R, t, valid, inliers = pnp_solve(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(p3d), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(150, bool), CAM, cfg,
    )
    assert bool(valid)
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02
    marks = np.asarray(inliers)
    assert marks[n_out:].mean() > 0.9     # true inliers kept
    assert marks[:n_out].mean() < 0.2     # outliers demoted


def test_pnp_rejects_garbage(rng):
    p3d = make_scene(rng, 60)
    uv = rng.uniform(0, 600, (60, 2)).astype(np.float32)  # nonsense
    cfg = VOConfig()
    R, t, valid, _ = pnp_solve(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(60, bool), CAM, cfg,
    )
    assert not bool(valid)
    np.testing.assert_allclose(np.asarray(t), 0.0)  # pose untouched


def _keypoints_at(xy, rng):
    k = xy.shape[0]
    return Keypoints(
        xy=jnp.asarray(xy.astype(np.float32)),
        level=jnp.zeros(k, jnp.int32),
        angle=jnp.zeros(k, jnp.float32),
        score=jnp.ones(k, jnp.float32),
        valid=jnp.ones(k, bool),
        desc=jnp.asarray(
            rng.integers(0, 2**32, (k, 8), dtype=np.uint32)
        ),
    )


def test_local_map_insert_and_evict(rng):
    cfg = VOConfig(untracked_threshold=3, local_map_capacity=64)
    depth = jnp.full((480, 640), 2.0, jnp.float32)
    xy = rng.uniform(50, 400, (10, 2))
    kp = _keypoints_at(xy, rng)
    lmap = reset_local_map(kp, depth, jnp.eye(3, dtype=jnp.float32),
                           jnp.zeros(3, jnp.float32), CAM, 64)
    assert int(lmap.valid.sum()) == 10

    # simulate 4 frames of no matches -> counters exceed threshold -> evicted
    matches = VOMatches(
        map_pos=jnp.zeros((10, 3)), kp_xy=kp.xy,
        map_idx=jnp.full((10,), -1, jnp.int32),
        ok=jnp.zeros(10, bool), n=jnp.int32(0),
    )
    lmap = lmap._replace(counters=jnp.where(lmap.valid, 5, 0))
    kp_none = kp._replace(valid=jnp.zeros(10, bool))
    lmap2 = update_local_map(lmap, kp_none, depth, matches,
                             jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros(3, jnp.float32), CAM, cfg)
    assert int(lmap2.valid.sum()) == 0  # all evicted, nothing inserted

    # insertion fills freed slots
    lmap3 = update_local_map(lmap, kp, depth, matches,
                             jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros(3, jnp.float32), CAM, cfg)
    assert int(lmap3.valid.sum()) == 10  # evicted 10, inserted 10 fresh
    assert int(lmap3.counters[lmap3.valid].max()) == 0


def test_local_map_replace_on_match(rng):
    cfg = VOConfig(local_map_capacity=32)
    depth = jnp.full((480, 640), 1.5, jnp.float32)
    xy = rng.uniform(100, 300, (5, 2))
    kp = _keypoints_at(xy, rng)
    lmap = reset_local_map(kp, depth, jnp.eye(3, dtype=jnp.float32),
                           jnp.zeros(3, jnp.float32), CAM, 32)
    old_pos = np.asarray(lmap.positions[2]).copy()
    # match keypoint 0 to map slot 2 with a new depth
    depth2 = jnp.full((480, 640), 2.5, jnp.float32)
    matches = VOMatches(
        map_pos=lmap.positions[:5], kp_xy=kp.xy,
        map_idx=jnp.asarray([2, -1, -1, -1, -1], jnp.int32),
        ok=jnp.asarray([True, False, False, False, False]),
        n=jnp.int32(1),
    )
    lmap2 = update_local_map(lmap, kp, depth2, matches,
                             jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros(3, jnp.float32), CAM, cfg)
    new_pos = np.asarray(lmap2.positions[2])
    assert abs(new_pos[2] - 2.5) < 1e-5
    assert abs(old_pos[2] - 1.5) < 1e-5
