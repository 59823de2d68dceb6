"""Symmetric ICP: recover a known rigid transform on a synthetic multi-plane
scene built through the real target-map pathway."""

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import CameraIntrinsics, ICPConfig
from supersurfel_fusion_tpu.ops.icp import build_target_maps, symmetric_icp
from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.geometry import axis_angle_to_mat

H, W, CS = 128, 160, 16
GH, GW = H // CS, W // CS
CAM = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                       width=W, height=H)


def synth_scene():
    """Corner scene: floor + two walls => constrains all 6 DoF."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    # three planes in camera frame: n . p = dist
    planes = np.array(
        [
            [0.0, 0.8, 0.6, 1.5],    # floor-ish
            [0.7, 0.0, 0.714, 1.8],  # right wall
            [-0.7, 0.1, 0.707, 1.7], # left wall
        ]
    )
    rays = np.stack(
        [(x - CAM.cx) / CAM.fx, (y - CAM.cy) / CAM.fy, np.ones_like(x)], -1
    )
    depth = np.full((H, W), np.inf)
    which = np.zeros((H, W), np.int32)
    for i, (nx, ny, nz, d) in enumerate(planes):
        denom = rays @ np.array([nx, ny, nz])
        z = np.where(np.abs(denom) > 1e-9, d / denom, np.inf)
        z = np.where(z > 0, z, np.inf)
        take = z < depth
        depth = np.where(take, z, depth)
        which = np.where(take, i, which)
    pts = rays * depth[..., None]
    normals = planes[which][..., :3]
    return depth, pts, normals, which


def make_frame_and_model():
    depth, pts, normals, which = synth_scene()
    labels = ((np.mgrid[0:H, 0:W][0] // CS) * GW + np.mgrid[0:H, 0:W][1] // CS)
    labels = jnp.asarray(labels.astype(np.int32))
    n_sp = GH * GW
    # frame surfels: mean point/normal per cell
    frame = Supersurfels.empty(n_sp)
    fpos = np.zeros((n_sp, 3), np.float32)
    fori = np.tile(np.eye(3, dtype=np.float32), (n_sp, 1, 1))
    colors = np.full((n_sp, 3), 128.0, np.float32)
    conf = np.ones(n_sp, np.float32)
    for s in range(n_sp):
        m = np.asarray(labels).reshape(-1) == s
        fpos[s] = pts.reshape(-1, 3)[m].mean(0)
        fori[s, 2] = normals.reshape(-1, 3)[m].mean(0)
        fori[s, 2] /= np.linalg.norm(fori[s, 2])
        if len(np.unique(which.reshape(-1)[m])) > 1:
            conf[s] = -1.0  # mixed-plane cell: invalid surfel
    frame = frame._replace(
        positions=jnp.asarray(fpos),
        orientations=jnp.asarray(fori),
        colors=jnp.asarray(colors),
        confidences=jnp.asarray(conf),
    )
    return depth, labels, frame, fpos, fori


def test_icp_recovers_small_motion():
    depth, labels, frame, fpos, fori = make_frame_and_model()
    # model = frame surfels moved by a known camera motion:
    # camera moves by (R_gt, t_gt); world == old camera frame
    axis = np.array([0.2, 1.0, -0.3])
    axis /= np.linalg.norm(axis)
    R_gt = np.asarray(
        axis_angle_to_mat(jnp.asarray(axis, jnp.float32), jnp.asarray(0.02))
    )
    t_gt = np.array([0.01, -0.015, 0.02], np.float32)

    n_sp = fpos.shape[0]
    C = 256
    model = Supersurfels.empty(C)
    mori = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    mpos = np.zeros((C, 3), np.float32)
    mpos[:n_sp] = fpos  # model in world frame == frame-0 camera frame
    mori[:n_sp] = fori
    conf = np.full(C, -1.0, np.float32)
    conf[:n_sp] = np.where(np.asarray(frame.confidences) > 0, 10.0, -1.0)
    model = model._replace(
        positions=jnp.asarray(mpos),
        orientations=jnp.asarray(mori),
        colors=jnp.full((C, 3), 128.0),
        confidences=jnp.asarray(conf),
    )

    # current (new) camera: pose cam->world = (R_gt, t_gt). The new frame
    # observes the same scene from the moved camera: depth image of points
    # R_gt^T (p - t_gt)... by construction we instead say: the target frame
    # IS the identity view, and the model was laid down from a camera at
    # (R_gt, t_gt)^-1 — equivalently pass an initial view guess of identity
    # and verify ICP finds the residual transform.
    pts_w = np.asarray(model.positions[:n_sp]) @ R_gt.T + t_gt  # R p + t
    model = model._replace(
        positions=model.positions.at[:n_sp].set(jnp.asarray(pts_w)),
        orientations=model.orientations.at[:n_sp].set(
            jnp.asarray(mori[:n_sp] @ R_gt.T)
        ),
    )
    # Now model in world frame W where the camera sits at identity after
    # moving by (R_gt, t_gt): view transform world->camera = (R_gt, t_gt).
    # Give ICP the identity initial view and expect it to recover it.
    tm = build_target_maps(frame, labels, jnp.asarray(depth, jnp.float32),
                           CAM, CS, 0.2, 10.0)
    cfg = ICPConfig(max_dist=0.2, cov_thresh=1.0, min_inliers=50.0)
    res = symmetric_icp(
        model, jnp.int32(n_sp), tm,
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), CAM, cfg,
    )
    assert bool(res.valid), (float(res.inliers), float(res.error))
    # compose: corrected view = (R_rel, t_rel) applied as the reference does:
    # new_pose = old_pose * rel where old_pose = identity
    R_est = np.asarray(res.R_rel)
    t_est = np.asarray(res.t_rel)
    # the estimated camera pose should match (R_gt, t_gt)
    ang_err = np.degrees(
        np.arccos(np.clip((np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1))
    )
    assert ang_err < 0.3, ang_err
    assert np.linalg.norm(t_est - t_gt) < 5e-3, (t_est, t_gt)


def test_icp_invalid_without_inliers():
    depth, labels, frame, *_ = make_frame_and_model()
    model = Supersurfels.empty(64)  # all confidences -1
    tm = build_target_maps(frame, labels, jnp.asarray(depth, jnp.float32),
                           CAM, CS, 0.2, 10.0)
    res = symmetric_icp(
        model, jnp.int32(0), tm, jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), CAM, ICPConfig(),
    )
    assert not bool(res.valid)
    assert float(res.inliers) == 0.0
