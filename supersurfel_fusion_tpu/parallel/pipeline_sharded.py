"""The FULL per-frame SLAM step executed over a `jax.sharding.Mesh`.

The reference is a single-GPU system; this module is the scale-out layer the
TPU build is specified to have (SURVEY.md §2.3): the global model (the array
that grows with scene size) is block-sharded over the mesh axis "map", while
per-frame tensors (640x480 images, 1200 frame surfels) are replicated — they
are small and their math is already data-parallel on-chip.

Composition per frame (ONE jitted function, mirroring pipeline.py):

  replicated : bilateral filter -> TPS superpixels -> plane smoothing ->
               slanted-plane depth -> supersurfel generation -> sparse VO
  sharded    : dense symmetric ICP — each shard linearizes its model block,
               the 6x6 normal equations are `psum`-reduced inside the GN
               `lax.while_loop`, every device applies the identical step
               (ops/icp.py:symmetric_icp with axis_name)
  sharded    : model fusion/insert/filter/compaction — per-shard match keys,
               one (F,)-sized `pmin` to pick global winners, shard-local
               fusion and compaction (parallel/sharding.py)

Cross-device traffic per frame: one 6x6+6+2 psum per ICP iteration and one
(F,) pmin + (F,) pmax for fusion — a few KB over ICI.

Multi-host: call `jax.distributed.initialize()` (see parallel/distributed.py)
before building the mesh; the same code then runs with ICI collectives inside
a slice and DCN across hosts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersurfel_fusion_tpu.config import PipelineConfig
from supersurfel_fusion_tpu.ops import icp as icp_ops
from supersurfel_fusion_tpu.ops import tps as tps_ops
from supersurfel_fusion_tpu.ops import vo as vo_ops
from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
from supersurfel_fusion_tpu.ops.features import detect_and_describe
from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
from supersurfel_fusion_tpu.parallel.sharding import (
    DistributedModel,
    make_distributed_model,
    make_sharded_update,
)
from supersurfel_fusion_tpu.types import Pose, Supersurfels
from supersurfel_fusion_tpu.utils.color import rgb_to_gray
from supersurfel_fusion_tpu.utils.geometry import orthonormalize

Array = jax.Array


class ShardedSLAMState(NamedTuple):
    model: DistributedModel   # sharded P("map", ...)
    pose: Pose                # replicated
    stamp: Array              # () int32
    local_map: vo_ops.LocalMap  # replicated (sparse VO working set)


def init_sharded_state(cfg: PipelineConfig, mesh: Mesh) -> ShardedSLAMState:
    model = make_distributed_model(cfg.fusion.nb_supersurfels_max, mesh)
    rep = NamedSharding(mesh, P())
    lmap = jax.device_put(
        vo_ops.LocalMap.empty(cfg.vo.local_map_capacity), rep
    )
    pose = jax.device_put(Pose.identity(), rep)
    return ShardedSLAMState(
        model=model, pose=pose, stamp=jnp.int32(0), local_map=lmap
    )


def _mspec(nd: int) -> P:
    return P("map", *([None] * (nd - 1)))


def make_process_frame_sharded(mesh: Mesh, cfg: PipelineConfig):
    """Build the jitted sharded frame step: (state, rgb, depth) -> (state,
    pose, nb_totals). Supports the benchmark configuration (sparse VO + dense
    ICP + fusion); MOD/ferns/loop-closure run in the single-device pipeline —
    the map and its consumers are the axis that scales.
    """
    if cfg.mod.enabled or cfg.enable_loop_closure or cfg.ferns.enabled:
        raise NotImplementedError(
            "sharded step covers the core VO+ICP+fusion pipeline"
        )
    cam = cfg.cam
    cs = cfg.tps.cell_size
    gh, gw = cfg.grid_h, cfg.grid_w
    d = mesh.devices.size

    icp_local = jax.shard_map(
        lambda pos, col, ori, conf, nbv, tm, Rv, tv: icp_ops.symmetric_icp(
            Supersurfels(
                positions=pos, colors=col, stamps=None, orientations=ori,
                shapes=None, dims=None, confidences=conf,
            ),
            nbv[0], tm, Rv, tv, cam, cfg.icp, axis_name="map",
        ),
        mesh=mesh,
        in_specs=(
            _mspec(2), _mspec(2), _mspec(3), _mspec(1), P("map"),
            P(), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )

    fusion_step = make_sharded_update(mesh, cam, cfg.fusion, cfg.conf_thresh)

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
                cfg.fusion.range_min, cfg.fusion.range_max, state.stamp,
            )

            # --- sparse VO (replicated)
            pose = state.pose
            lmap = state.local_map
            if cfg.enable_sparse_vo:
                gray = rgb_to_gray(rgb)
                kp = detect_and_describe(gray, cfg.vo)
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

            # --- dense ICP over the sharded model (psum-reduced GN)
            if cfg.enable_icp:
                R_view = pose.R.T
                t_view = -(R_view @ pose.t)
                target_maps = icp_ops.build_target_maps(
                    frame, tps.labels, plane_depth, cam, cs,
                    cfg.fusion.range_min, cfg.fusion.range_max,
                )
                s = state.model.surfels
                icp = icp_local(
                    s.positions, s.colors, s.orientations, s.confidences,
                    state.model.nb_visible_local, target_maps, R_view, t_view,
                )
                nbv_total = jnp.sum(state.model.nb_visible_local)

                def apply_icp(p: Pose) -> Pose:
                    R_new = orthonormalize(p.R @ icp.R_rel)
                    t_new = p.R @ icp.t_rel + p.t
                    return Pose(R_new, t_new)

                pose = jax.lax.cond(
                    icp.valid & (nbv_total > 0), apply_icp, lambda p: p, pose
                )

            # --- VO local-map maintenance with the fused pose
            if cfg.enable_sparse_vo:
                lmap = vo_ops.update_local_map(
                    lmap, kp, fdepth, matches, pose.R, pose.t, cam, cfg.vo
                )

            # --- sharded fusion / insertion / filtering / compaction
            model = fusion_step(
                state.model, frame, tps.labels, plane_depth, pose.R, pose.t,
                state.stamp,
            )

        new_state = ShardedSLAMState(
            model=model, pose=pose, stamp=state.stamp + 1, local_map=lmap
        )
        return new_state, pose, jnp.sum(model.nb_local)

    return step
