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
from supersurfel_fusion_tpu.ops import ferns as ferns_ops
from supersurfel_fusion_tpu.ops import fusion as fusion_ops
from supersurfel_fusion_tpu.ops import icp as icp_ops
from supersurfel_fusion_tpu.ops import loop_closure as lc_ops
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
    kf_store: lc_ops.KeyframeStore
    prev_fern_id: Array   # () int32
    last_lc_stamp: Array  # () int32
    lc_count: Array       # () int32 — accepted loop closures
    # silent-cap telemetry (read once post-run; VERDICT r2 #10): peak visible
    # count vs cfg.fusion.visible_cap, and total insertions dropped at the
    # model capacity ceiling
    vis_peak: Array = None       # () int32
    dropped_total: Array = None  # () int32
    mod_params: Optional[dict] = None  # person-detector weights (use_yolo)
    # (max_frames, 12) float32 — per-frame pose [R.flat(9) | t(3)] written at
    # index `stamp` each step; lives inside the donated state so the host
    # never accumulates per-frame device buffers (see PipelineConfig.max_frames)
    traj: Array = None


class FrameOutput(NamedTuple):
    pose: Pose
    vo_valid: Array
    vo_matches: Array
    icp_valid: Array
    icp_inliers: Array
    icp_error: Array
    icp_code: Array       # () int32 gate bitmask (ops/icp.py:ICPResult.code)
    icp_cov: Array        # (6,) pose covariance diagonal
    nb_supersurfels: Array
    nb_visible: Array
    labels: Array         # (H, W) superpixel index image
    plane_depth: Array    # (H, W) slanted-plane depth
    static_sp: Array      # (N_sp,) bool — False = detected as moving (MOD)
    n_fused: Array        # () int32 — frame surfels fused this frame
    n_inserted: Array     # () int32 — frame surfels inserted this frame
    n_removed: Array      # () int32 — model surfels evicted this frame


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
    mod_params = None
    if cfg.mod.enabled and cfg.mod.use_yolo and cfg.mod.weights_path:
        from supersurfel_fusion_tpu.models.person_detector import load_params

        mod_params = load_params(cfg.mod.weights_path)
    return SLAMState(
        mod_params=mod_params,
        model=model,
        pose=Pose.identity(),
        stamp=jnp.int32(0),
        local_map=vo_ops.LocalMap.empty(cfg.vo.local_map_capacity),
        mod_prev=motion_ops.init_prev(cfg.cam.height, cfg.cam.width, kp_cap,
                                     cfg.tps.cell_size),
        kf_store=lc_ops.KeyframeStore.empty(
            cfg.ferns.max_keyframes, cfg.ferns.nb_ferns, kp_cap,
            cfg.nb_superpixels,
        ),
        prev_fern_id=jnp.int32(-1),
        last_lc_stamp=jnp.int32(-(10**6)),
        lc_count=jnp.int32(0),
        vis_peak=jnp.int32(0),
        dropped_total=jnp.int32(0),
        traj=jnp.zeros((cfg.max_frames, 12), jnp.float32),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_frame(state: SLAMState, rgb: Array, depth: Array,
                  cfg: PipelineConfig) -> Tuple[SLAMState, FrameOutput]:
    """One SLAM step.

    rgb: (H, W, 3) float32 [0,255] or uint8; depth: (H, W) float32 metres
    (0 invalid) or raw uint16 counts (scaled by cfg.depth_scale in-graph).
    Feeding the integer encodings is 3.2x cheaper on the host->device link
    (1.5 MB vs 4.9 MB/frame) — the conversions below run on-device.
    Returns (new_state, outputs)."""
    if rgb.dtype != jnp.float32:
        rgb = rgb.astype(jnp.float32)
    if depth.dtype in (jnp.uint16, jnp.int32):
        depth = depth.astype(jnp.float32) * cfg.depth_scale
    elif depth.dtype != jnp.float32:
        depth = depth.astype(jnp.float32)
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
    # Mosaic kernel is TPU-only; it also implements only the once-per-iteration
    # merge cadence, so reference-cadence configs fall back to the XLA path.
    if (cfg.tps.use_pallas and not cfg.tps.merge_every_phase
            and jax.default_backend() == "tpu"):
        from supersurfel_fusion_tpu.ops import tps_pallas

        tps = tps_pallas.segment(rgb, disp, cfg.tps)
    else:
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
    is_static_sp = jnp.ones((cfg.nb_superpixels,), dtype=bool)
    if cfg.enable_sparse_vo:
        gray = rgb_to_gray(rgb)
        kp = detect_and_describe(gray, cfg.vo)
        if cfg.mod.enabled:
            # MOD consumes the BILATERAL-filtered depth, not the slanted
            # plane render (which the reference feeds it): keypoint 3D and
            # the SE(3) depth residual need metric depth at corners, where
            # the piecewise-planar render is off by the plane-quantization
            # error (measured: the rigid fit NaNs on plane depth, 80-95%
            # inlier ratio on fdepth)
            is_static_sp, static_kp, mod_prev = motion_ops.detect_motion(
                gray, fdepth, mod_prev, kp, frame, tps, cam, cfg.tps,
                cfg.mod, detector_params=state.mod_params,
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
        # actives are compacted to the front, so the GN loop only reads the
        # first `visible_cap` slots (2.7x less gather/MXU work per iteration)
        vcap = min(cfg.fusion.visible_cap, cfg.fusion.nb_supersurfels_max)
        vis_surfels = jax.tree.map(lambda a: a[:vcap], state.model.surfels)
        icp = icp_ops.symmetric_icp(
            vis_surfels, state.model.nb_visible, target_maps,
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
            code=jnp.int32(0),
            cov_diag=jnp.zeros((6,), jnp.float32),
        )

    # 10-11. fern place recognition + global loop closure
    # (processFerns + closeGlobalLoop, supersurfel_fusion.cu:331-346, 676-882)
    kf_store = state.kf_store
    prev_fern_id = state.prev_fern_id
    last_lc = state.last_lc_stamp
    lc_count = state.lc_count
    model_surfels = state.model.surfels
    use_ferns = cfg.ferns.enabled or cfg.enable_loop_closure
    if use_ferns and cfg.enable_sparse_vo:
        fern_pos, fern_rgb, fern_depth = ferns_ops.make_fern_table(
            cfg.ferns, cam.width, cam.height, cfg.fusion.range_max
        )
        codes = ferns_ops.compute_codes(
            rgb, fdepth, fern_pos, fern_rgb, fern_depth, cfg.ferns.pyramid_level
        )
        best_id, best_diss, is_new = ferns_ops.query(
            kf_store.db, codes, cfg.ferns.new_frame_thresh
        )

        # keypoint 3D positions from the filtered depth
        # (computeFilteredKeypoints3D, sparse_vo.cpp:215-240)
        ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, cam.width - 1)
        vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, cam.height - 1)
        zk = fdepth[vi, ui]
        kp_depth_ok = (zk >= cfg.fusion.range_min) & (zk <= cfg.fusion.range_max)
        kp_p3d = jnp.stack(
            [zk * (kp.xy[:, 0] - cam.cx) / cam.fx,
             zk * (kp.xy[:, 1] - cam.cy) / cam.fy, zk], axis=-1,
        )

        if cfg.enable_loop_closure:
            gap = cfg.ferns.min_frame_gap
            kf_stamp_best = kf_store.db.stamps[
                jnp.clip(best_id, 0, kf_store.db.stamps.shape[0] - 1)
            ]
            lc_gate = (
                ~is_new
                & (kf_store.db.count > 0)
                & (best_id != prev_fern_id)
                & (state.stamp - last_lc > gap)
                & (state.stamp - kf_stamp_best > gap)
            )
            if not cfg.enable_icp:
                target_maps = icp_ops.build_target_maps(
                    frame, tps.labels, plane_depth, cam, cs,
                    cfg.fusion.range_min, cfg.fusion.range_max,
                )

            def run_lc(_):
                return lc_ops.close_global_loop(
                    kf_store, best_id, model_surfels,
                    state.model.nb_supersurfels, frame, kp, kp_p3d,
                    kp_depth_ok, target_maps, pose, state.stamp, cam, cfg.icp,
                )

            def skip_lc(_):
                return lc_ops.LoopClosureResult(
                    accepted=jnp.bool_(False), pose=pose, model=model_surfels,
                    kf_poses_R=kf_store.db.poses_R,
                    kf_poses_t=kf_store.db.poses_t,
                )

            lc = jax.lax.cond(lc_gate, run_lc, skip_lc, operand=None)
            pose = lc.pose
            model_surfels = lc.model
            kf_store = kf_store._replace(
                db=kf_store.db._replace(
                    poses_R=lc.kf_poses_R, poses_t=lc.kf_poses_t
                )
            )
            last_lc = jnp.where(lc.accepted, state.stamp, last_lc)
            lc_count = lc_count + lc.accepted.astype(jnp.int32)
            # accepted closure resets the VO local map at the corrected pose
            # (SparseVO::reset via updateLocalMap, supersurfel_fusion.cu:534-535)
            reset_map = vo_ops.reset_local_map(
                kp, fdepth, pose.R, pose.t, cam, cfg.vo.local_map_capacity
            )
            lmap = jax.tree.map(
                lambda a, b: jnp.where(
                    jnp.reshape(lc.accepted, (1,) * a.ndim), a, b
                ),
                reset_map, lmap,
            )
        # when the frame becomes a NEW keyframe the reference records its id
        # (ferns.cu:104-116: bestKeyFrameId = keyFrames.size())
        prev_fern_id = jnp.where(is_new, kf_store.db.count, best_id)

    # 12. local-map maintenance with the final fused pose
    # (SupersurfelFusion::updateLocalMap, supersurfel_fusion.cu:532-549)
    if cfg.enable_sparse_vo:
        lmap = vo_ops.update_local_map(
            lmap, kp, fdepth, matches, pose.R, pose.t, cam, cfg.vo,
            labels=tps.labels if cfg.mod.enabled else None,
            static_sp=is_static_sp if cfg.mod.enabled else None,
        )

    # 13. model update / bootstrap. With freeze_on_tracking_loss, skip the
    # update when dense ICP was gate-rejected against a live model: the pose
    # is VO-only and may be drifting, and inserting from a drifting pose
    # permanently displaces the map (measured fr3 mover-occlusion anatomy,
    # artifacts/ANALYSIS_r5.md §5; deviation from supersurfel_fusion.cu:373
    # which fuses unconditionally).
    model_in = state.model._replace(surfels=model_surfels)

    # insert_requires_icp: the measured-correct tracking-loss protection
    # (ANALYSIS_r5.md §10) — fusion/visibility stay live, only insertion of
    # NEW surfels from a possibly-drifting VO-only pose is gated.
    allow_insert = None
    if cfg.fusion.insert_requires_icp and cfg.enable_icp:
        allow_insert = icp.valid | (state.model.nb_supersurfels == 0)

    def _do_update(m):
        return fusion_ops.update_model(
            m, frame, tps.labels, plane_depth, pose.R, pose.t, cam,
            cfg.fusion, cfg.conf_thresh, state.stamp,
            allow_insert=allow_insert,
        )

    if cfg.fusion.freeze_on_tracking_loss and cfg.enable_icp:
        zero = jnp.int32(0)

        def _skip_update(m):
            return m, fusion_ops.FusionStats(zero, zero, zero, zero)

        update_ok = icp.valid | (state.model.nb_supersurfels == 0)
        model, fusion_stats = jax.lax.cond(
            update_ok, _do_update, _skip_update, model_in
        )
    else:
        model, fusion_stats = _do_update(model_in)

    # 14. new-keyframe snapshot (Ferns::addKeyFrame, supersurfel_fusion.cu:
    # 487-514)
    if use_ferns and cfg.enable_sparse_vo:
        def add_kf(ks):
            return lc_ops.add_keyframe_payload(
                ks, codes, pose, state.stamp, kp, kp_p3d, kp_depth_ok, frame
            )

        kf_store = jax.lax.cond(is_new, add_kf, lambda ks: ks, kf_store)

    # record this frame's pose in the on-device trajectory ring (clamped at
    # capacity: frames past max_frames overwrite the last slot — the runner
    # warns when that happens)
    traj_row = jnp.concatenate([pose.R.reshape(9), pose.t]).astype(jnp.float32)
    traj = jax.lax.dynamic_update_slice(
        state.traj, traj_row[None, :],
        (jnp.minimum(state.stamp, cfg.max_frames - 1), 0),
    )

    new_state = SLAMState(
        model=model, pose=pose, stamp=state.stamp + 1, local_map=lmap,
        mod_prev=mod_prev, kf_store=kf_store, prev_fern_id=prev_fern_id,
        last_lc_stamp=last_lc, lc_count=lc_count,
        vis_peak=jnp.maximum(state.vis_peak, model.nb_visible),
        dropped_total=state.dropped_total + fusion_stats.n_dropped,
        mod_params=state.mod_params,
        traj=traj,
    )
    out = FrameOutput(
        pose=pose,
        vo_valid=vo_valid,
        vo_matches=vo_matches,
        icp_valid=icp.valid,
        icp_inliers=icp.inliers,
        icp_error=icp.error,
        icp_code=icp.code,
        icp_cov=icp.cov_diag,
        nb_supersurfels=model.nb_supersurfels,
        nb_visible=model.nb_visible,
        labels=tps.labels,
        plane_depth=plane_depth,
        static_sp=is_static_sp,
        n_fused=fusion_stats.n_fused,
        n_inserted=fusion_stats.n_inserted,
        n_removed=fusion_stats.n_removed,
    )
    return new_state, out


class SupersurfelFusionTPU:
    """Host-side driver (the equivalent of the `SupersurfelFusion` class +
    benchmark node loop). Feeds numpy frames to the jitted pipeline and
    collects TUM-format poses."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.state = init_state(cfg)
        self.stamps: list[float] = []
        self._cap_warned = False

    def process(self, rgb: np.ndarray, depth: np.ndarray,
                timestamp: Optional[float] = None) -> FrameOutput:
        # keep integer encodings intact — process_frame converts on-device
        rgb_j = jnp.asarray(rgb)
        depth_j = jnp.asarray(depth)
        self.state, out = process_frame(self.state, rgb_j, depth_j, self.cfg)
        if timestamp is not None:
            self.stamps.append(timestamp)
            # the pose itself stays on-device, written into state.traj at
            # `stamp` by process_frame. Retaining per-frame device buffers
            # here instead makes dispatch cost grow with the live-buffer
            # count on remote backends (measured: fr3+MOD 36.7 -> 9.6 fps
            # over 300 frames vs ~64 steady) — so the host keeps only the
            # float timestamp.
            if (len(self.stamps) > self.cfg.max_frames
                    and not self._cap_warned):
                self._cap_warned = True
                import warnings

                warnings.warn(
                    f"frame count exceeded PipelineConfig.max_frames="
                    f"{self.cfg.max_frames}; trajectory poses past the cap "
                    "overwrite the last slot", stacklevel=2,
                )
        return out

    @property
    def trajectory(self) -> list:
        if not self.stamps:
            return []
        # ONE download of the preallocated on-device pose ring
        n = min(len(self.stamps), self.cfg.max_frames)
        traj = np.asarray(jax.device_get(self.state.traj))[:n].astype(np.float64)
        from supersurfel_fusion_tpu.eval.trajectory import mat_to_quat_np

        rows = [
            np.concatenate([row[9:12], mat_to_quat_np(row[:9].reshape(3, 3))])
            for row in traj
        ]
        # past-capacity frames all map to the final slot (clamped write)
        rows += [rows[-1]] * (len(self.stamps) - n)
        return rows

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
