"""The FULL per-frame SLAM step executed over a `jax.sharding.Mesh`.

The reference is a single-GPU system; this module is the scale-out layer the
TPU build is specified to have (SURVEY.md §2.3): the global model (the array
that grows with scene size) is block-sharded over the mesh axis "map", while
per-frame tensors (640x480 images, 1200 frame surfels) are replicated — they
are small and their math is already data-parallel on-chip.

Composition per frame (ONE jitted shard_map, mirroring pipeline.py):

  replicated : bilateral filter -> TPS superpixels -> plane smoothing ->
               slanted-plane depth -> supersurfel generation -> MOD ->
               sparse VO -> fern query -> keyframe snapshot
  sharded    : dense symmetric ICP — each shard linearizes its model block,
               the 6x6 normal equations are `psum`-reduced inside the GN
               `lax.while_loop` (ops/icp.py:symmetric_icp with axis_name)
  sharded    : global loop closure — replicated relocalization + keyframe
               ICP + GN optimise over a deformation graph whose nodes are
               sampled distributedly (one (NODE_CAP, 3) all_gather,
               ops/deformation.py:build_graph_sharded); the deformation
               APPLY runs shard-local over each model block
  sharded    : model fusion/insert/filter/compaction — per-shard match keys,
               one (F,)-sized `pmin` to pick global winners, shard-local
               fusion and compaction (parallel/sharding.py)

Cross-device traffic per frame: one 6x6+6+2 psum per ICP iteration, one
(F,) pmin + (F,) pmax for fusion, and on a loop-closure frame one
(NODE_CAP, 3) all_gather — a few KB over ICI.

Multi-host: call `jax.distributed.initialize()` (see parallel/distributed.py)
before building the mesh; the same code then runs with ICI collectives inside
a slice and DCN across hosts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersurfel_fusion_tpu.config import PipelineConfig
from supersurfel_fusion_tpu.ops import ferns as ferns_ops
from supersurfel_fusion_tpu.ops import icp as icp_ops
from supersurfel_fusion_tpu.ops import loop_closure as lc_ops
from supersurfel_fusion_tpu.ops import motion as motion_ops
from supersurfel_fusion_tpu.ops import tps as tps_ops
from supersurfel_fusion_tpu.ops import vo as vo_ops
from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
from supersurfel_fusion_tpu.ops.features import detect_and_describe
from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
from supersurfel_fusion_tpu.parallel import kf_sharded as kf_sh
from supersurfel_fusion_tpu.parallel.sharding import (
    DistributedModel,
    local_model_update,
    make_distributed_model,
)
from supersurfel_fusion_tpu.types import Pose, Supersurfels
from supersurfel_fusion_tpu.utils.color import rgb_to_gray
from supersurfel_fusion_tpu.utils.geometry import orthonormalize

Array = jax.Array
AXIS = "map"


class ShardedSLAMState(NamedTuple):
    model: DistributedModel     # sharded P("map", ...)
    # kf_store: per-keyframe rows sharded round-robin over the mesh
    # (parallel/kf_sharded.py: global keyframe k -> shard k%D, local row
    # k//D); only db.count is replicated. ~1.5 MB/keyframe stays distributed
    # instead of being replicated on every device.
    kf_store: lc_ops.KeyframeStore
    # everything below is replicated P()
    pose: Pose
    stamp: Array                # () int32
    local_map: vo_ops.LocalMap
    mod_prev: motion_ops.MODPrev
    prev_fern_id: Array         # () int32
    last_lc_stamp: Array        # () int32
    lc_count: Array             # () int32


def _kp_cap(cfg: PipelineConfig) -> int:
    kp_shape = jax.eval_shape(
        lambda g: detect_and_describe(g, cfg.vo),
        jax.ShapeDtypeStruct((cfg.cam.height, cfg.cam.width), jnp.float32),
    )
    return kp_shape.xy.shape[0]


def init_sharded_state(cfg: PipelineConfig, mesh: Mesh) -> ShardedSLAMState:
    model = make_distributed_model(cfg.fusion.nb_supersurfels_max, mesh)
    rep = NamedSharding(mesh, P())
    kp_cap = _kp_cap(cfg)
    d = mesh.devices.size
    assert cfg.ferns.max_keyframes % d == 0, \
        "max_keyframes must divide the mesh size (round-robin kf sharding)"

    def rput(x):
        return jax.device_put(x, rep)

    kf_global = lc_ops.KeyframeStore.empty(
        cfg.ferns.max_keyframes, cfg.ferns.nb_ferns, kp_cap,
        cfg.nb_superpixels,
    )
    # keyframe rows sharded over the mesh; the () count replicated
    kf_store = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _mspec(x.ndim) if x.ndim else P())
        ),
        kf_global,
    )

    return ShardedSLAMState(
        model=model,
        kf_store=kf_store,
        pose=rput(Pose.identity()),
        stamp=rput(jnp.int32(0)),
        local_map=rput(vo_ops.LocalMap.empty(cfg.vo.local_map_capacity)),
        mod_prev=rput(
            motion_ops.init_prev(cfg.cam.height, cfg.cam.width, kp_cap,
                                     cfg.tps.cell_size)
        ),
        prev_fern_id=rput(jnp.int32(-1)),
        last_lc_stamp=rput(jnp.int32(-(10**6))),
        lc_count=rput(jnp.int32(0)),
    )


def _mspec(nd: int) -> P:
    return P(AXIS, *([None] * (nd - 1)))


def make_process_frame_sharded(mesh: Mesh, cfg: PipelineConfig,
                               mod_params: Optional[dict] = None):
    """Build the jitted sharded frame step: (state, rgb, depth) ->
    (state, pose, nb_total). Full feature set: MOD, ferns and global loop
    closure run inside the same sharded step as ICP and fusion (MOD/ferns
    replicated; the loop-closure deformation graph is sampled distributedly
    and applied shard-locally)."""
    cam = cfg.cam
    cs = cfg.tps.cell_size
    gh, gw = cfg.grid_h, cfg.grid_w
    d = mesh.devices.size
    use_ferns = (cfg.ferns.enabled or cfg.enable_loop_closure) \
        and cfg.enable_sparse_vo

    def local_step(surfels: Supersurfels, nb_local, nb_vis_local,
                   pose: Pose, stamp, lmap, mod_prev, kf_store,
                   prev_fern_id, last_lc, lc_count, params,
                   rgb: Array, depth: Array):
        """Runs per shard; `surfels` is the LOCAL model block, `nb_local`/
        `nb_vis_local` the (1,)-shaped local counts; everything else is
        replicated (identical on every shard)."""
        nb_loc = nb_local[0]
        nb_vis = nb_vis_local[0]

        # --- replicated front half (identical to pipeline.py steps 1-6)
        fdepth = bilateral_filter(
            depth, cfg.bilateral_sigma_value, cfg.bilateral_sigma_space,
            cfg.bilateral_radius,
        )
        disp = depth_to_disp(fdepth)
        tps = tps_ops.segment(rgb, disp, cfg.tps)
        theta_s = tps_ops.smooth_planes(tps.stats, cfg.tps)
        tps = tps._replace(stats=tps.stats._replace(theta=theta_s))
        plane_depth = tps_ops.render_plane_depth(
            theta_s, tps.labels, gh, gw, cs
        )
        frame = generate_supersurfels(
            rgb, plane_depth, tps, cam, cfg.tps, cfg.generation,
            cfg.fusion.range_min, cfg.fusion.range_max, stamp,
        )

        # --- MOD + sparse VO (replicated; pipeline.py steps 7-8)
        kp = None
        matches = None
        if cfg.enable_sparse_vo:
            gray = rgb_to_gray(rgb)
            kp = detect_and_describe(gray, cfg.vo)
            if cfg.mod.enabled:
                is_static_sp, static_kp, mod_prev = motion_ops.detect_motion(
                    gray, fdepth, mod_prev, kp, frame, tps, cam,
                    cfg.tps, cfg.mod, detector_params=params,
                )
                frame = frame._replace(
                    confidences=jnp.where(
                        is_static_sp, frame.confidences, -1.0
                    )
                )
                kp = kp._replace(valid=static_kp)
            matches, lmap = vo_ops.find_matches(
                lmap, kp, pose.R, pose.t, cam, cfg.vo
            )
            R_vo, t_vo, pnp_ok, _ = vo_ops.pnp_solve(
                pose.R, pose.t, matches.map_pos, matches.kp_xy,
                matches.ok, cam, cfg.vo,
            )
            vo_valid = pnp_ok & (matches.n >= cfg.vo.min_matches)
            pose = Pose(
                jnp.where(vo_valid, R_vo, pose.R),
                jnp.where(vo_valid, t_vo, pose.t),
            )

        # --- dense ICP over the sharded model (psum-reduced GN; step 9)
        target_maps = None
        if cfg.enable_icp or cfg.enable_loop_closure:
            target_maps = icp_ops.build_target_maps(
                frame, tps.labels, plane_depth, cam, cs,
                cfg.fusion.range_min, cfg.fusion.range_max,
            )
        if cfg.enable_icp:
            R_view = pose.R.T
            t_view = -(R_view @ pose.t)
            icp = icp_ops.symmetric_icp(
                surfels, nb_vis, target_maps, R_view, t_view, cam, cfg.icp,
                axis_name=AXIS,
            )
            nbv_total = jax.lax.psum(nb_vis, AXIS)

            def apply_icp(p: Pose) -> Pose:
                R_new = orthonormalize(p.R @ icp.R_rel)
                t_new = p.R @ icp.t_rel + p.t
                return Pose(R_new, t_new)

            pose = jax.lax.cond(
                icp.valid & (nbv_total > 0), apply_icp, lambda p: p, pose
            )

        # --- ferns place recognition + global loop closure (steps 10-11)
        # the keyframe store is round-robin sharded (parallel/kf_sharded.py):
        # the fern compare is shard-local, ONE encoded pmin picks the global
        # winner, and only on loop-closure frames is the winning keyframe's
        # ~1.5 MB payload psum-broadcast from its owner shard
        if use_ferns:
            me = jax.lax.axis_index(AXIS)
            kf_rows = kf_store.db.codes.shape[0]
            kf_gids = jnp.arange(kf_rows, dtype=jnp.int32) * d + me
            fern_pos, fern_rgb, fern_depth = ferns_ops.make_fern_table(
                cfg.ferns, cam.width, cam.height, cfg.fusion.range_max
            )
            codes = ferns_ops.compute_codes(
                rgb, fdepth, fern_pos, fern_rgb, fern_depth,
                cfg.ferns.pyramid_level,
            )
            best_id, _, is_new = kf_sh.query_sharded(
                kf_store.db.codes, kf_store.db.count, codes,
                cfg.ferns.new_frame_thresh, AXIS,
            )
            ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32),
                          0, cam.width - 1)
            vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32),
                          0, cam.height - 1)
            zk = fdepth[vi, ui]
            kp_depth_ok = (
                (zk >= cfg.fusion.range_min) & (zk <= cfg.fusion.range_max)
            )
            kp_p3d = jnp.stack(
                [zk * (kp.xy[:, 0] - cam.cx) / cam.fx,
                 zk * (kp.xy[:, 1] - cam.cy) / cam.fy, zk], axis=-1,
            )

            if cfg.enable_loop_closure:
                gap = cfg.ferns.min_frame_gap
                kf_stamp_best = kf_sh.get_stamp_sharded(
                    kf_store.db.stamps, best_id, AXIS
                )
                lc_gate = (
                    ~is_new
                    & (kf_store.db.count > 0)
                    & (best_id != prev_fern_id)
                    & (stamp - last_lc > gap)
                    & (stamp - kf_stamp_best > gap)
                )

                def run_lc(_):
                    payload = kf_sh.get_payload_sharded(
                        kf_store, best_id, AXIS
                    )
                    return lc_ops.close_global_loop(
                        kf_store, best_id, surfels, nb_loc, frame, kp,
                        kp_p3d, kp_depth_ok, target_maps, pose, stamp, cam,
                        cfg.icp, axis_name=AXIS, payload=payload,
                        kf_gids=kf_gids,
                    )

                def skip_lc(_):
                    # the skipped branch must still issue the same
                    # collectives (payload psums + node all_gather) so both
                    # cond branches lower identically
                    from supersurfel_fusion_tpu.ops import deformation as defo

                    kf_sh.get_payload_sharded(kf_store, best_id, AXIS)
                    defo.build_graph_sharded(
                        surfels.positions, surfels.stamps[:, 0],
                        nb_loc, AXIS,
                    )
                    return lc_ops.LoopClosureResult(
                        accepted=jnp.bool_(False), pose=pose, model=surfels,
                        kf_poses_R=kf_store.db.poses_R,
                        kf_poses_t=kf_store.db.poses_t,
                    )

                lc = jax.lax.cond(lc_gate, run_lc, skip_lc, operand=None)
                pose = lc.pose
                surfels = lc.model
                kf_store = kf_store._replace(
                    db=kf_store.db._replace(
                        poses_R=lc.kf_poses_R, poses_t=lc.kf_poses_t
                    )
                )
                last_lc = jnp.where(lc.accepted, stamp, last_lc)
                lc_count = lc_count + lc.accepted.astype(jnp.int32)
                reset_map = vo_ops.reset_local_map(
                    kp, fdepth, pose.R, pose.t, cam, cfg.vo.local_map_capacity
                )
                lmap = jax.tree.map(
                    lambda a, b: jnp.where(
                        jnp.reshape(lc.accepted, (1,) * a.ndim), a, b
                    ),
                    reset_map, lmap,
                )
            prev_fern_id = jnp.where(is_new, kf_store.db.count, best_id)

        # --- VO local-map maintenance with the fused pose (step 12)
        if cfg.enable_sparse_vo:
            lmap = vo_ops.update_local_map(
                lmap, kp, fdepth, matches, pose.R, pose.t, cam, cfg.vo,
                labels=tps.labels if cfg.mod.enabled else None,
                static_sp=is_static_sp if cfg.mod.enabled else None,
            )

        # --- sharded fusion / insertion / filtering / compaction (step 13).
        # The empty-model case needs no special bootstrap branch: with no
        # live surfels nothing matches, so the whole first frame inserts via
        # the round-robin path — and keeping one unconditional path keeps the
        # pmin/pmax collectives out of divergent control flow.
        new_surfels, nb_live, nb_vis_new = local_model_update(
            surfels, nb_loc, nb_vis, frame, tps.labels, plane_depth,
            pose.R, pose.t, stamp, cam, cfg.fusion, cfg.conf_thresh, d,
            axis_name=AXIS,
        )
        # freeze_on_tracking_loss (pipeline.py step 13): keep the old shard
        # state on ICP-gate-rejected frames. Select (not lax.cond) so the
        # update's psum/pmax collectives stay out of divergent control flow;
        # the predicate is replicated (icp.valid is computed from replicated
        # inputs on every shard), so all shards agree.
        if cfg.fusion.freeze_on_tracking_loss and cfg.enable_icp:
            nbt = jax.lax.psum(nb_loc, AXIS)
            keep = icp.valid | (nbt == 0)
            new_surfels = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(keep, (1,) * new.ndim), new, old
                ),
                new_surfels, surfels,
            )
            nb_live = jnp.where(keep, nb_live, nb_loc)
            nb_vis_new = jnp.where(keep, nb_vis_new, nb_vis)

        # --- keyframe snapshot (step 14): appended on its owner shard only
        if use_ferns:
            def add_kf(ks):
                new, _ = kf_sh.add_keyframe_sharded(
                    ks, ks.db.count, codes, pose.R, pose.t, stamp,
                    kp.xy, kp_p3d, kp.desc, kp.valid & kp_depth_ok,
                    frame.positions, frame.orientations[:, 2, :],
                    frame.colors, frame.confidences > 0.0, AXIS,
                )
                return new

            kf_store = jax.lax.cond(is_new, add_kf, lambda ks: ks, kf_store)

        return (new_surfels, nb_live[None], nb_vis_new[None], pose,
                stamp + 1, lmap, mod_prev, kf_store, prev_fern_id, last_lc,
                lc_count, jax.lax.psum(nb_live, AXIS))

    # spec trees: model SoA sharded on the capacity axis, everything else
    # replicated. Built from example structures so shard_map gets exact
    # per-leaf specs.
    example = jax.eval_shape(lambda: init_sharded_state(cfg, mesh))
    surf_spec = jax.tree.map(lambda x: _mspec(x.ndim), example.model.surfels)
    # keyframe store: per-keyframe rows sharded, the () count replicated
    kf_spec = jax.tree.map(
        lambda x: _mspec(x.ndim) if x.ndim else P(), example.kf_store
    )
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)  # noqa: E731

    params_spec = rep(mod_params) if mod_params is not None else P()
    in_specs = (
        surf_spec, P(AXIS), P(AXIS),
        rep(example.pose), P(), rep(example.local_map),
        rep(example.mod_prev), kf_spec, P(), P(), P(),
        params_spec,
        P(), P(),
    )
    out_specs = (
        surf_spec, P(AXIS), P(AXIS),
        rep(example.pose), P(), rep(example.local_map),
        rep(example.mod_prev), kf_spec, P(), P(), P(), P(),
    )

    sharded = jax.shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )

    @partial(jax.jit, donate_argnames=("state",))
    def step(state: ShardedSLAMState, rgb: Array, depth: Array
             ) -> Tuple[ShardedSLAMState, Pose, Array]:
        if rgb.dtype != jnp.float32:
            rgb = rgb.astype(jnp.float32)
        if depth.dtype in (jnp.uint16, jnp.int32):
            depth = depth.astype(jnp.float32) * cfg.depth_scale
        elif depth.dtype != jnp.float32:
            depth = depth.astype(jnp.float32)

        with jax.default_matmul_precision("float32"):
            out = sharded(
                state.model.surfels, state.model.nb_local,
                state.model.nb_visible_local,
                state.pose, state.stamp, state.local_map, state.mod_prev,
                state.kf_store, state.prev_fern_id, state.last_lc_stamp,
                state.lc_count, mod_params, rgb, depth,
            )
        (surfels, nb_local, nb_vis_local, pose, stamp, lmap, mod_prev,
         kf_store, prev_fern_id, last_lc, lc_count, nb_total) = out
        new_state = ShardedSLAMState(
            model=DistributedModel(
                surfels=surfels, nb_local=nb_local,
                nb_visible_local=nb_vis_local,
            ),
            pose=pose, stamp=stamp, local_map=lmap, mod_prev=mod_prev,
            kf_store=kf_store, prev_fern_id=prev_fern_id,
            last_lc_stamp=last_lc, lc_count=lc_count,
        )
        return new_state, pose, nb_total

    return step
