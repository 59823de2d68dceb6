"""Distributed map: the global supersurfel model sharded over a device mesh.

The reference is strictly single-GPU; this module introduces the scale-out
layer the TPU build is specified to have (SURVEY.md §2.3): the model SoA is
block-sharded along its capacity axis over the mesh axis "map", each device
owning `capacity / D` slots with a LOCAL live-count. Per-frame data (frame
surfels, label image, plane depth) is replicated — it is small; the map is
the axis that grows.

Per-frame distributed update (inside one `shard_map`):

1. every shard projects ITS model block into the frame and computes encoded
   (distance, global-id) match keys per frame superpixel;
2. `psum`-min over the mesh resolves the globally best match per superpixel
   (one small (F,) collective on ICI — the only cross-device traffic);
3. each shard fuses the matched pairs it owns;
4. unmatched frame surfels are inserted round-robin: shard
   `stamp mod D` takes this frame's inserts (bounded imbalance, zero
   coordination);
5. stale/free-space filtering and stable compaction run shard-locally;
   `nb_visible`/`nb_supersurfels` are psums of the local counts.

The dense ICP reduction (`make_sharded_icp_step` in mesh.py) follows the
same pattern with a 6x6 psum.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersurfel_fusion_tpu.config import CameraIntrinsics, FusionConfig
from supersurfel_fusion_tpu.ops import fusion as fusion_ops
from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.color import lab_to_rgb, rgb_to_lab
from supersurfel_fusion_tpu.utils.geometry import eigh3x3, inv3x3_sym, mult_ABAt

Array = jax.Array

_BIG = 2**30  # plain int: module-level jnp scalars are device constants


class DistributedModel(NamedTuple):
    """Model SoA sharded on the capacity axis + per-shard counts."""

    surfels: Supersurfels        # arrays sharded P("map", ...)
    nb_local: Array              # (D,) int32, sharded P("map")
    nb_visible_local: Array      # (D,) int32, sharded P("map")

    @property
    def capacity(self) -> int:
        return self.surfels.capacity


def make_distributed_model(capacity: int, mesh: Mesh) -> DistributedModel:
    d = mesh.devices.size
    assert capacity % d == 0
    model = Supersurfels.empty(capacity)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    surfels = jax.tree.map(
        lambda x: put(x, P("map", *([None] * (x.ndim - 1)))), model
    )
    # two distinct buffers: aliasing them breaks donation of the state
    return DistributedModel(
        surfels=surfels,
        nb_local=put(jnp.zeros((d,), jnp.int32), P("map")),
        nb_visible_local=put(jnp.zeros((d,), jnp.int32), P("map")),
    )


def local_model_update(model: Supersurfels, nb_loc, nb_vis, frame, labels,
                       plane_depth, R, t, stamp, cam: CameraIntrinsics,
                       cfg: FusionConfig, conf_thresh: float, d: int,
                       axis_name: str = "map"):
    """Shard-local model fusion/insert/filter/compaction (steps 1-5 of the
    module docstring). Runs INSIDE shard_map; `model` is the local block,
    `nb_loc`/`nb_vis` the local counts. Returns (model, nb_live, nb_vis)."""
    me = jax.lax.axis_index(axis_name)
    Cl = model.positions.shape[0]
    F = frame.capacity
    H, W = labels.shape

    # --- 1. local match keys (findBestMatches over the local block)
    ids = jnp.arange(Cl, dtype=jnp.int32)
    live = (ids < nb_vis) & (model.confidences > 0.0)
    Rv = R.T
    tv = -(Rv @ t)
    pm = model.positions @ Rv.T + tv
    z = pm[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = jnp.round(pm[:, 0] * cam.fx / safe_z + cam.cx).astype(jnp.int32)
    v = jnp.round(pm[:, 1] * cam.fy / safe_z + cam.cy).astype(jnp.int32)
    proj_ok = (
        live & (z > cfg.range_min) & (z < cfg.range_max)
        & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    )
    fid = labels[jnp.clip(v, 0, H - 1), jnp.clip(u, 0, W - 1)]
    fid_m = jnp.where(proj_ok, fid, F)
    matched_loc = jnp.zeros((F,), jnp.int32).at[fid_m].max(1, mode="drop")

    fpos = (frame.positions @ R.T + t)[fid]
    fnormal = (frame.orientations[:, 2, :] @ R.T)[fid]
    flab = rgb_to_lab(frame.colors)[fid]
    fconf = frame.confidences[fid]
    mlab = rgb_to_lab(model.colors)
    mnormal = model.orientations[:, 2, :]
    dist = jnp.linalg.norm(model.positions - fpos, axis=-1)
    gate = (
        proj_ok & (fconf > 0.0)
        & (jnp.linalg.norm(mlab - flab, axis=-1) < cfg.match_max_color_dist)
        & (jnp.abs(jnp.sum(mnormal * fnormal, -1)) > cfg.match_min_normal_dot)
        & (dist < cfg.match_max_dist)
    )
    gid = me * Cl + ids     # global id in the encoded key
    dq = jnp.clip(jnp.round(dist / cfg.match_max_dist * 2048.0),
                  0, 2047).astype(jnp.int32)
    key = jnp.where(gate, (dq << 20) | gid, _BIG)
    keys_loc = jnp.full((F,), _BIG, jnp.int32).at[
        jnp.where(gate, fid, F)
    ].min(key, mode="drop")

    # --- 2. global combine (the only collectives in the hot path)
    keys = jax.lax.pmin(keys_loc, axis_name)
    matched = jax.lax.pmax(matched_loc, axis_name) > 0
    best_gid = jnp.where(keys < _BIG, keys & ((1 << 20) - 1), -1)

    # --- 3. fuse pairs owned by this shard
    owned = (best_gid >= me * Cl) & (best_gid < (me + 1) * Cl)
    mid_local = jnp.where(owned, best_gid - me * Cl, -1)
    match = fusion_ops.MatchResult(matched=matched, model_match=mid_local)
    model = fusion_ops._fuse(frame, model, match, R, t, stamp)

    # --- 4. round-robin insertion: shard (stamp mod D) takes this frame
    do_insert = (stamp % d) == me
    ins_model, nb_after, _ = fusion_ops._insert(
        frame, model, match, nb_loc, R, t, stamp
    )
    model = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(do_insert, (1,) * a.ndim), a, b
        ),
        ins_model, model,
    )
    nb_loc = jnp.where(do_insert, nb_after, nb_loc)

    # --- 5. local filter + stable compaction
    model, nb_live, nb_vis_new = fusion_ops.filter_and_compact(
        model, nb_loc, plane_depth, R, t, cam, cfg, conf_thresh, stamp
    )
    return model, nb_live, nb_vis_new


def make_sharded_update(mesh: Mesh, cam: CameraIntrinsics, cfg: FusionConfig,
                        conf_thresh: float):
    """Build the jitted distributed model-update step."""
    d = mesh.devices.size

    def local_update(pos, col, stamps, ori, shp, dims, conf,
                     nb_local, nb_vis_local, frame, labels, plane_depth,
                     R, t, stamp):
        """Runs per shard (leading dims are LOCAL)."""
        model = Supersurfels(pos, col, stamps, ori, shp, dims, conf)
        model, nb_live, nb_vis_new = local_model_update(
            model, nb_local[0], nb_vis_local[0], frame, labels, plane_depth,
            R, t, stamp, cam, cfg, conf_thresh, d,
        )
        return (
            model.positions, model.colors, model.stamps, model.orientations,
            model.shapes, model.dims, model.confidences,
            nb_live[None], nb_vis_new[None],
        )

    mspec = lambda nd: P("map", *([None] * (nd - 1)))  # noqa: E731

    sharded = jax.shard_map(
        local_update,
        mesh=mesh,
        in_specs=(
            mspec(2), mspec(2), mspec(2), mspec(3), mspec(3), mspec(2),
            mspec(1),                     # model SoA
            P("map"), P("map"),           # counts
            P(), P(), P(),                # frame, labels, plane_depth
            P(), P(), P(),                # R, t, stamp
        ),
        out_specs=(
            mspec(2), mspec(2), mspec(2), mspec(3), mspec(3), mspec(2),
            mspec(1), P("map"), P("map"),
        ),
        check_vma=False,
    )

    @jax.jit
    def step(dm: DistributedModel, frame: Supersurfels, labels, plane_depth,
             R, t, stamp):
        s = dm.surfels
        out = sharded(
            s.positions, s.colors, s.stamps, s.orientations, s.shapes,
            s.dims, s.confidences, dm.nb_local, dm.nb_visible_local,
            frame, labels, plane_depth, R, t, stamp,
        )
        new_s = Supersurfels(*out[:7])
        return DistributedModel(
            surfels=new_s, nb_local=out[7], nb_visible_local=out[8]
        )

    return step


def totals(dm: DistributedModel):
    return int(jnp.sum(dm.nb_local)), int(jnp.sum(dm.nb_visible_local))
