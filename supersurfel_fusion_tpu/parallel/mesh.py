"""Multi-chip scale-out: map sharding over a device mesh.

The reference is a single-GPU, single-process system (SURVEY.md §2.3); this
module INTRODUCES the distributed layer the TPU build is specified to have.
Design (scaling-book style):

* mesh axis "map": the global model (supersurfel SoA) is sharded along its
  capacity axis — each device owns a contiguous block of map slots.
* per-frame images/surfels are small (640x480 / 1200 superpixels) and are
  replicated; all heavy per-frame math stays data-parallel on-chip.
* dense ICP: every device builds the normal equations for ITS model shard
  against the replicated frame, then a `psum` over the 6x6 system yields the
  identical global Gauss-Newton step on all devices — the classic
  distributed-BA Schur/psum pattern.
* fusion matching: per-shard segmented argmin produces (key, model_id)
  candidates per frame superpixel; a `pmin` over the packed key resolves the
  global winner; each shard applies updates only to its own rows.

Collectives ride ICI via jax.lax.psum/pmin inside `shard_map`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersurfel_fusion_tpu.config import CameraIntrinsics, ICPConfig
from supersurfel_fusion_tpu.types import Supersurfels

Array = jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_model(model: Supersurfels, mesh: Mesh) -> Supersurfels:
    """Place the model SoA with its capacity axis sharded over the mesh."""
    def put(x):
        spec = P("map", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, model)


def make_sharded_icp_step(mesh: Mesh, cam: CameraIntrinsics, cfg: ICPConfig):
    """Distributed linearization step: per-shard JtJ/Jtr + psum reduction."""
    from supersurfel_fusion_tpu.ops.icp import _build_system
    from supersurfel_fusion_tpu.utils.color import rgb_to_lab

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("map"), P("map"), P("map"), P("map"),  # model shard
            P(), P(), P(),                            # target maps + pose
        ),
        out_specs=(P(), P(), P(), P()),
    )
    def step(positions, normals, labs, conf, target_maps, R, t):
        n_local = positions.shape[0]
        mask = conf > 0.0
        JtJ, Jtr, r, inl = _build_system(
            positions, normals, labs, mask, target_maps, R, t, cam, cfg
        )
        JtJ = jax.lax.psum(JtJ, "map")
        Jtr = jax.lax.psum(Jtr, "map")
        r = jax.lax.psum(r, "map")
        inl = jax.lax.psum(inl, "map")
        return JtJ, Jtr, r, inl

    @jax.jit
    def run(model: Supersurfels, target_maps, R, t):
        labs = rgb_to_lab(model.colors)
        normals = model.orientations[:, 2, :]
        return step(model.positions, normals, labs, model.confidences,
                    target_maps, R, t)

    return run


def dryrun(n_devices: int) -> None:
    """One sharded ICP linearization on tiny shapes: validates that the
    multi-chip path compiles and the collectives produce replicated,
    consistent results."""
    mesh = make_mesh(n_devices)
    cam = CameraIntrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5,
                           width=64, height=48)
    cfg = ICPConfig(min_inliers=4.0, cov_thresh=1e9)

    C = 16 * n_devices
    rng = np.random.default_rng(0)
    pos = np.zeros((C, 3), np.float32)
    pos[:, 0] = rng.uniform(-0.3, 0.3, C)
    pos[:, 1] = rng.uniform(-0.2, 0.2, C)
    pos[:, 2] = 1.0 + 0.1 * pos[:, 0]
    model = Supersurfels.empty(C)._replace(
        positions=jnp.asarray(pos),
        colors=jnp.full((C, 3), 128.0),
        confidences=jnp.ones((C,), jnp.float32),
    )
    model = shard_model(model, mesh)

    # target maps: a plane at z=1 + matching normals/colors
    H, W = cam.height, cam.width
    tm = np.zeros((H, W, 10), np.float32)
    y, x = np.mgrid[0:H, 0:W]
    z = 1.0 + 0.1 * (x - cam.cx) / cam.fx
    tm[..., 0] = (x - cam.cx) * z / cam.fx
    tm[..., 1] = (y - cam.cy) * z / cam.fy
    tm[..., 2] = z
    tm[..., 5] = 1.0   # normal ~ +z
    tm[..., 6] = 53.4  # Lab of RGB (128,128,128)
    tm[..., 9] = 1.0
    tm = jnp.asarray(tm)

    run = make_sharded_icp_step(mesh, cam, cfg)
    JtJ, Jtr, r, inl = run(model, tm, jnp.eye(3, dtype=jnp.float32),
                           jnp.zeros(3, jnp.float32))
    JtJ.block_until_ready()
    assert np.isfinite(np.asarray(JtJ)).all()
    assert float(inl) > 0, "sharded ICP found no inliers"
    # the psum-reduced system must equal the single-device computation
    from supersurfel_fusion_tpu.ops.icp import _build_system
    from supersurfel_fusion_tpu.utils.color import rgb_to_lab

    model_local = jax.device_get(model)
    model_local = jax.tree.map(jnp.asarray, model_local)
    JtJ_ref, _, _, inl_ref = _build_system(
        model_local.positions, model_local.orientations[:, 2, :],
        rgb_to_lab(model_local.colors), model_local.confidences > 0,
        tm, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), cam, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(JtJ), np.asarray(JtJ_ref), rtol=1e-4, atol=1e-3
    )
    assert float(inl) == float(inl_ref)

    # --- sharded model fusion step (map-sharded SoA + psum/pmin combine)
    from supersurfel_fusion_tpu.config import FusionConfig
    from supersurfel_fusion_tpu.parallel.sharding import (
        make_distributed_model,
        make_sharded_update,
        totals,
    )

    fcfg = FusionConfig(nb_supersurfels_max=16 * n_devices, delta_t=1000)
    dm = make_distributed_model(fcfg.nb_supersurfels_max, mesh)
    step = make_sharded_update(mesh, cam, fcfg, conf_thresh=1e9)

    F = 12
    frame = Supersurfels.empty(F)._replace(
        positions=jnp.asarray(pos[:F]),
        orientations=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, 1, 1)),
        shapes=jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (F, 1, 1)),
        colors=jnp.full((F, 3), 120.0),
        confidences=jnp.full((F,), 150.0),
        stamps=jnp.zeros((F, 2), jnp.int32),
    )
    labels = jnp.zeros((cam.height, cam.width), jnp.int32)
    pd = jnp.full((cam.height, cam.width), 1.0, jnp.float32)
    dm = step(dm, frame, labels, pd, jnp.eye(3, dtype=jnp.float32),
              jnp.zeros(3, jnp.float32), jnp.int32(0))
    dm = step(dm, frame, labels, pd, jnp.eye(3, dtype=jnp.float32),
              jnp.zeros(3, jnp.float32), jnp.int32(1))
    nb, nvis = totals(dm)
    assert nb > 0, "sharded fusion inserted nothing"
