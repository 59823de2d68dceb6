"""SLAM orchestrator: the per-frame pipeline.

TPU-native equivalent of `SupersurfelFusion::processFrame`
(`core/src/supersurfel_fusion.cu:166-530`). The whole per-frame computation is
ONE jitted function over fixed-shape arrays:

    depth bilateral filter -> disparity -> TPS superpixels -> plane smoothing
    -> slanted-plane depth -> supersurfel generation -> [sparse VO] ->
    symmetric ICP against the model -> fusion / insertion / filtering.

Where the reference interleaves host threads, cudaMemcpy counter round-trips
and per-kernel device synchronization, this pipeline stays on-device end to
end; the host only feeds frames and reads back the pose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import PipelineConfig
from supersurfel_fusion_tpu.ops import fusion as fusion_ops
from supersurfel_fusion_tpu.ops import icp as icp_ops
from supersurfel_fusion_tpu.ops import motion as motion_ops
from supersurfel_fusion_tpu.ops import tps as tps_ops
from supersurfel_fusion_tpu.ops import vo as vo_ops
from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
from supersurfel_fusion_tpu.ops.features import detect_and_describe
from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
from supersurfel_fusion_tpu.types import ModelState, Pose, Supersurfels
from supersurfel_fusion_tpu.utils.color import rgb_to_gray
from supersurfel_fusion_tpu.utils.geometry import orthonormalize

Array = jax.Array


class SLAMState(NamedTuple):
    model: ModelState
    pose: Pose            # camera -> world
    stamp: Array          # () int32
    local_map: vo_ops.LocalMap
    mod_prev: motion_ops.MODPrev


class FrameOutput(NamedTuple):
    pose: Pose
    vo_valid: Array
    vo_matches: Array
    icp_valid: Array
    icp_inliers: Array
    icp_error: Array
    nb_supersurfels: Array
    nb_visible: Array
    labels: Array         # (H, W) superpixel index image
    plane_depth: Array    # (H, W) slanted-plane depth


def init_state(cfg: PipelineConfig) -> SLAMState:
    model = ModelState(
        surfels=Supersurfels.empty(cfg.fusion.nb_supersurfels_max),
        nb_supersurfels=jnp.int32(0),
        nb_visible=jnp.int32(0),
    )
    # keypoint capacity: derived from the extractor's static output shape
    kp_shape = jax.eval_shape(
        lambda g: detect_and_describe(g, cfg.vo),
        jax.ShapeDtypeStruct((cfg.cam.height, cfg.cam.width), jnp.float32),
    )
    kp_cap = kp_shape.xy.shape[0]
    return SLAMState(
        model=model,
        pose=Pose.identity(),
        stamp=jnp.int32(0),
        local_map=vo_ops.LocalMap.empty(cfg.vo.local_map_capacity),
        mod_prev=motion_ops.init_prev(cfg.cam.height, cfg.cam.width, kp_cap),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_frame(state: SLAMState, rgb: Array, depth: Array,
                  cfg: PipelineConfig) -> Tuple[SLAMState, FrameOutput]:
    """One SLAM step. rgb: (H, W, 3) float32 [0,255]; depth: (H, W) metres
    (0 invalid). Returns (new_state, outputs)."""
    with jax.default_matmul_precision("float32"):
        return _process_frame_impl(state, rgb, depth, cfg)


def _process_frame_impl(state: SLAMState, rgb: Array, depth: Array,
                        cfg: PipelineConfig) -> Tuple[SLAMState, FrameOutput]:
    # Full-f32 matmul precision is load-bearing: plane-fit moments, ICP/PnP
    # normal equations and orientation moments contract pixel-scale values —
    # the TPU's default bf16 MXU inputs quantize 640-px coordinates to ~2 px
    # and wreck the trajectory (measured: ATE 0.11 -> 0.02 on TUM fr1).
    cam = cfg.cam
    cs = cfg.tps.cell_size
    gh, gw = cfg.grid_h, cfg.grid_w

    # 1. depth prefilter + disparity (supersurfel_fusion.cu:180)
    fdepth = bilateral_filter(
        depth, cfg.bilateral_sigma_value, cfg.bilateral_sigma_space,
        cfg.bilateral_radius,
    )
    disp = depth_to_disp(fdepth)

    # 2-5. TPS superpixels + plane smoothing + slanted-plane depth
    tps = tps_ops.segment(rgb, disp, cfg.tps)
    theta_s = tps_ops.smooth_planes(tps.stats, cfg.tps)
    tps = tps._replace(stats=tps.stats._replace(theta=theta_s))
    plane_depth = tps_ops.render_plane_depth(theta_s, tps.labels, gh, gw, cs)

    # 6. supersurfel generation (camera frame)
    frame = generate_supersurfels(
        rgb, plane_depth, tps, cam, cfg.tps, cfg.generation,
        cfg.fusion.range_min, cfg.fusion.range_max, state.stamp,
    )

    # 7-8. moving-object detection + sparse feature VO
    # (SparseVO::extractFeatures / MotionDetection::detectMotion /
    #  matchFeatures / track)
    pose = state.pose
    lmap = state.local_map
    mod_prev = state.mod_prev
    static_kp = None
    if cfg.enable_sparse_vo:
        gray = rgb_to_gray(rgb)
        kp = detect_and_describe(gray, cfg.vo)
        if cfg.mod.enabled:
            is_static_sp, static_kp, mod_prev = motion_ops.detect_motion(
                gray, fdepth, mod_prev, kp, frame, tps, cam, cfg.tps, cfg.mod
            )
            # dynamic superpixels are excluded from fusion/ICP/VO
            # (confidence = -1, motion_detection.cu:570-575)
            frame = frame._replace(
                confidences=jnp.where(
                    is_static_sp, frame.confidences, -1.0
                )
            )
            kp = kp._replace(valid=static_kp)
        matches, lmap = vo_ops.find_matches(lmap, kp, pose.R, pose.t, cam, cfg.vo)
        R_vo, t_vo, pnp_ok, _ = vo_ops.pnp_solve(
            pose.R, pose.t, matches.map_pos, matches.kp_xy, matches.ok,
            cam, cfg.vo,
        )
        vo_valid = pnp_ok & (matches.n >= cfg.vo.min_matches)
        pose = Pose(
            jnp.where(vo_valid, R_vo, pose.R),
            jnp.where(vo_valid, t_vo, pose.t),
        )
        vo_matches = matches.n
    else:
        kp = None
        matches = None
        vo_valid = jnp.bool_(False)
        vo_matches = jnp.int32(0)

    # 9. dense symmetric ICP refinement against the visible model
    if cfg.enable_icp:
        R_view = pose.R.T
        t_view = -(R_view @ pose.t)

        target_maps = icp_ops.build_target_maps(
            frame, tps.labels, plane_depth, cam, cs,
            cfg.fusion.range_min, cfg.fusion.range_max,
        )
        icp = icp_ops.symmetric_icp(
            state.model.surfels, state.model.nb_visible, target_maps,
            R_view, t_view, cam, cfg.icp,
        )

        def apply_icp(p: Pose) -> Pose:
            R_new = orthonormalize(p.R @ icp.R_rel)
            t_new = p.R @ icp.t_rel + p.t
            return Pose(R_new, t_new)

        pose = jax.lax.cond(
            icp.valid & (state.model.nb_visible > 0),
            apply_icp, lambda p: p, pose,
        )
    else:
        icp = icp_ops.ICPResult(
            R_rel=jnp.eye(3, dtype=jnp.float32),
            t_rel=jnp.zeros(3, jnp.float32),
            valid=jnp.bool_(False),
            inliers=jnp.float32(0.0),
            error=jnp.float32(0.0),
        )

    # 12. local-map maintenance with the final fused pose
    # (SupersurfelFusion::updateLocalMap, supersurfel_fusion.cu:532-549)
    if cfg.enable_sparse_vo:
        lmap = vo_ops.update_local_map(
            lmap, kp, fdepth, matches, pose.R, pose.t, cam, cfg.vo
        )

    # 13. model update / bootstrap
    model = fusion_ops.update_model(
        state.model, frame, tps.labels, plane_depth, pose.R, pose.t,
        cam, cfg.fusion, cfg.conf_thresh, state.stamp,
    )

    new_state = SLAMState(
        model=model, pose=pose, stamp=state.stamp + 1, local_map=lmap,
        mod_prev=mod_prev,
    )
    out = FrameOutput(
        pose=pose,
        vo_valid=vo_valid,
        vo_matches=vo_matches,
        icp_valid=icp.valid,
        icp_inliers=icp.inliers,
        icp_error=icp.error,
        nb_supersurfels=model.nb_supersurfels,
        nb_visible=model.nb_visible,
        labels=tps.labels,
        plane_depth=plane_depth,
    )
    return new_state, out


class SupersurfelFusionTPU:
    """Host-side driver (the equivalent of the `SupersurfelFusion` class +
    benchmark node loop). Feeds numpy frames to the jitted pipeline and
    collects TUM-format poses."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._poses: list[Pose] = []     # device-resident; converted lazily
        self.stamps: list[float] = []

    def process(self, rgb: np.ndarray, depth: np.ndarray,
                timestamp: Optional[float] = None) -> FrameOutput:
        rgb_j = jnp.asarray(rgb, jnp.float32)
        depth_j = jnp.asarray(depth, jnp.float32)
        self.state, out = process_frame(self.state, rgb_j, depth_j, self.cfg)
        if timestamp is not None:
            self.stamps.append(timestamp)
            # keep the pose on-device: a per-frame download would force a
            # full pipeline sync every frame (27 ms round-trip on a remote
            # TPU); the trajectory is materialized once at the end
            self._poses.append(out.pose)
        return out

    @property
    def trajectory(self) -> list:
        if not self._poses:
            return []
        # one batched download instead of per-pose round-trips
        Rs = np.asarray(jnp.stack([p.R for p in self._poses]), dtype=np.float64)
        ts = np.asarray(jnp.stack([p.t for p in self._poses]), dtype=np.float64)
        from supersurfel_fusion_tpu.eval.trajectory import mat_to_quat_np

        return [
            np.concatenate([t, mat_to_quat_np(R)]) for R, t in zip(Rs, ts)
        ]

    @staticmethod
    def pose_tum(pose: Pose) -> np.ndarray:
        """Pose -> TUM 7-vector (tx ty tz qx qy qz qw)."""
        from supersurfel_fusion_tpu.eval.trajectory import mat_to_quat_np

        R = np.asarray(pose.R, dtype=np.float64)
        t = np.asarray(pose.t, dtype=np.float64)
        q = mat_to_quat_np(R)
        return np.concatenate([t, q])

    @property
    def pose(self) -> Pose:
        return self.state.pose
