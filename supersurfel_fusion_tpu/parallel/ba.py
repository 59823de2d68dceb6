"""Distributed pose-graph / deformation-graph bundle adjustment.

The reference solves its deformation-graph Gauss-Newton on ONE CPU through
CHOLMOD (`deformation_graph.cu:613-794` + `third_party/DefGraph_utils`); the
single-device TPU port is `ops/deformation.py:optimise` (dense GN, on-device
Cholesky). This module scales that solve over a device mesh — SURVEY.md §2.3's
"pose-graph/BA solves reduce via Schur complement with psum of per-keyframe
JtJ blocks":

* the CONSTRAINT set (loop-closure correspondences — the part that grows with
  keyframes/loops) is block-sharded over the mesh axis; each device
  linearizes only its constraint shard;
* the node-local rot/reg regularizer residuals are cheap and replicated, so
  each device scales them by 1/sqrt(D) and the `psum` recovers their exact
  single contribution;
* `JtJ = psum(J_d^T J_d)`, `Jtr = psum(J_d^T r_d)` — one (12N)^2 all-reduce
  per GN iteration riding ICI — followed by a replicated dense Cholesky
  solve. Every device steps identically; results are bit-identical across
  devices and match the single-device solver up to f32 reduction order.

Multi-host: initialize with `parallel/distributed.py:initialize_from_env()`
before building the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersurfel_fusion_tpu.ops.deformation import (
    NODE_CAP,
    DeformationGraph,
    VertexBinding,
    _residuals,
    blend_positions,
)

Array = jax.Array


def make_distributed_optimise(mesh: Mesh, axis: str = "map",
                              n_iters: int = 3, damping: float = 1e-4):
    """Build a jitted distributed deformation-graph GN with the constraint
    set sharded over `axis`. Same signature/returns as
    `ops.deformation.optimise` (graph replicated; con_* sharded or
    shardable)."""
    d = mesh.devices.size
    inv_sqrt_d = 1.0 / np.sqrt(d)

    def local_gn(graph: DeformationGraph, con_nodes, con_w, con_src, con_tgt,
                 con_valid):
        binding = VertexBinding(nodes=con_nodes, weights=con_w)

        def flat_residual(x):
            rot = x[: NODE_CAP * 9].reshape(NODE_CAP, 3, 3)
            trans = x[NODE_CAP * 9:].reshape(NODE_CAP, 3)
            r_all = _residuals(rot, trans, graph, binding, con_src, con_tgt,
                               con_valid)
            # _residuals stacks [rot | reg | con]: the first two blocks are
            # node-local and computed on EVERY device — scale them so the
            # psum of J^T J counts them exactly once.
            n_reg = NODE_CAP * 6 + NODE_CAP * 4 * 3
            scale = jnp.concatenate([
                jnp.full((n_reg,), inv_sqrt_d, jnp.float32),
                jnp.ones((r_all.shape[0] - n_reg,), jnp.float32),
            ])
            return r_all * scale

        x0 = jnp.concatenate(
            [graph.rotations.reshape(-1), graph.translations.reshape(-1)]
        )
        nvar = x0.shape[0]

        def gn_step(x, _):
            r = flat_residual(x)
            J = jax.jacfwd(flat_residual)(x)
            JtJ = jax.lax.psum(J.T @ J, axis)
            Jtr = jax.lax.psum(J.T @ r, axis)
            dx = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(
                    JtJ + damping * jnp.eye(nvar, dtype=jnp.float32)
                ),
                -Jtr,
            )
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            x2 = x + dx
            c_new = jax.lax.psum(jnp.sum(flat_residual(x2) ** 2), axis)
            c_old = jax.lax.psum(jnp.sum(r ** 2), axis)
            return jnp.where(c_new <= c_old, x2, x), None

        x, _ = jax.lax.scan(gn_step, x0, None, length=n_iters)
        rot = x[: NODE_CAP * 9].reshape(NODE_CAP, 3, 3)
        trans = x[NODE_CAP * 9:].reshape(NODE_CAP, 3)
        error = jax.lax.psum(jnp.sum(flat_residual(x) ** 2), axis)

        pred = blend_positions(graph.positions, rot, trans, binding, con_src)
        cerr = jnp.linalg.norm(pred - con_tgt, axis=-1)
        n_con = jax.lax.psum(jnp.sum(con_valid.astype(jnp.float32)), axis)
        sum_cerr = jax.lax.psum(jnp.sum(jnp.where(con_valid, cerr, 0.0)), axis)
        mean_cons_err = sum_cerr / jnp.maximum(n_con, 1.0)
        return rot, trans, error, mean_cons_err

    graph_spec = DeformationGraph(
        positions=P(), rotations=P(), translations=P(), stamps=P(),
        neighbours=P(), n_nodes=P(),
    )
    sharded = jax.shard_map(
        local_gn,
        mesh=mesh,
        in_specs=(graph_spec, P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(graph: DeformationGraph, con_binding: VertexBinding,
            con_src: Array, con_tgt: Array, con_valid: Array):
        return sharded(graph, con_binding.nodes, con_binding.weights,
                       con_src, con_tgt, con_valid)

    return run


def shard_constraints(mesh: Mesh, con_binding: VertexBinding, con_src: Array,
                      con_tgt: Array, con_valid: Array, axis: str = "map"):
    """Place the constraint arrays block-sharded over the mesh (their V axis
    must be divisible by the mesh size — pad with invalid rows if needed)."""
    spec = lambda nd: NamedSharding(mesh, P(axis, *([None] * (nd - 1))))  # noqa: E731

    def put(x):
        return jax.device_put(x, spec(x.ndim))

    return (
        VertexBinding(nodes=put(con_binding.nodes),
                      weights=put(con_binding.weights)),
        put(con_src), put(con_tgt), put(con_valid),
    )
