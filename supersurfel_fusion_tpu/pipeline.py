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
from supersurfel_fusion_tpu.ops import tps as tps_ops
from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
from supersurfel_fusion_tpu.types import ModelState, Pose, Supersurfels
from supersurfel_fusion_tpu.utils.geometry import orthonormalize

Array = jax.Array


class SLAMState(NamedTuple):
    model: ModelState
    pose: Pose            # camera -> world
    stamp: Array          # () int32


class FrameOutput(NamedTuple):
    pose: Pose
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
    return SLAMState(model=model, pose=Pose.identity(), stamp=jnp.int32(0))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_frame(state: SLAMState, rgb: Array, depth: Array,
                  cfg: PipelineConfig) -> Tuple[SLAMState, FrameOutput]:
    """One SLAM step. rgb: (H, W, 3) float32 [0,255]; depth: (H, W) metres
    (0 invalid). Returns (new_state, outputs)."""
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

    # 8-9. camera tracking: dense symmetric ICP against the visible model
    pose = state.pose
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

    # 13. model update / bootstrap
    model = fusion_ops.update_model(
        state.model, frame, tps.labels, plane_depth, pose.R, pose.t,
        cam, cfg.fusion, cfg.conf_thresh, state.stamp,
    )

    new_state = SLAMState(model=model, pose=pose, stamp=state.stamp + 1)
    out = FrameOutput(
        pose=pose,
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
        self.trajectory: list[np.ndarray] = []
        self.stamps: list[float] = []

    def process(self, rgb: np.ndarray, depth: np.ndarray,
                timestamp: Optional[float] = None) -> FrameOutput:
        rgb_j = jnp.asarray(rgb, jnp.float32)
        depth_j = jnp.asarray(depth, jnp.float32)
        self.state, out = process_frame(self.state, rgb_j, depth_j, self.cfg)
        if timestamp is not None:
            self.stamps.append(timestamp)
            self.trajectory.append(self.pose_tum(out.pose))
        return out

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
