"""As-rigid-as-possible deformation graph (map correction on loop closure).

TPU-native rewrite of `DeformationGraph` (`core/src/deformation_graph.cu`)
and its CHOLMOD backend (`third_party/DefGraph_utils`): the ElasticFusion
formulation — nodes sampled from the model, 4 temporal neighbours each,
Gauss-Newton over 12 variables/node minimizing

    wRot * ||R^T R - I||^2  +  wReg * sum_k ||R_j (g_k - g_j) + g_j + t_j
                                              - (g_k + t_k)||^2
    + wCon * sum_l || blend(source_l) - target_l ||^2

(sparseResidual, deformation_graph.cu:528-611; weights wRot=1, wReg=10,
wCon=100 at :36-38). Differences by design:

* Fixed node budget (`NODE_CAP`) instead of every-50th-surfel: the normal
  equations stay dense (12*cap <= 3072 vars), so the sparse Cholesky
  (CHOLMOD, T3) is replaced by one on-device dense Cholesky solve — at this
  size the MXU does it in ~1 ms, no host round-trip.
* The Jacobian comes from `jax.jacfwd` of the residual — exact, and immune to
  the hand-derived-row bookkeeping the reference needs.
* Vertex-to-node binding (weightVerticesSeq, :198-301) keeps the
  time-windowed nearest-node search (look_back window around the stamp-
  matched node) but selects the 4 nearest by TRUE vertex-node distance (the
  reference compares against an index-mismatched vertex — a bug we fix).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.geometry import mult_ABAt, normalize

Array = jax.Array

NODE_CAP = 256
N_NEIGH = 4
LOOK_BACK = 15
W_ROT = 1.0
W_REG = 10.0
W_CON = 100.0


class DeformationGraph(NamedTuple):
    positions: Array      # (NODE_CAP, 3) node anchor g_j
    rotations: Array      # (NODE_CAP, 3, 3) R_j
    translations: Array   # (NODE_CAP, 3) t_j
    stamps: Array         # (NODE_CAP,) int32, sorted ascending
    neighbours: Array     # (NODE_CAP, N_NEIGH) int32
    n_nodes: Array        # () int32


class VertexBinding(NamedTuple):
    nodes: Array     # (V, N_NEIGH) int32
    weights: Array   # (V, N_NEIGH) float32 (sum 1)


def _temporal_neighbours(n: Array) -> Array:
    """Temporal neighbours: the 5-node window around i (shifted inside the
    valid range at the borders) minus i itself — the reference's scheme
    (deformation_graph.cu:112-168) vectorized."""
    i = jnp.arange(NODE_CAP, dtype=jnp.int32)[:, None]
    lo = jnp.clip(i - N_NEIGH // 2, 0, jnp.maximum(n - (N_NEIGH + 1), 0))
    cand = lo + jnp.arange(N_NEIGH + 1, dtype=jnp.int32)[None, :]  # (N, 5)
    is_self = (cand == i).astype(jnp.int32)
    order = jnp.argsort(is_self, axis=1, stable=True)
    nb = jnp.take_along_axis(cand, order[:, :N_NEIGH], axis=1)
    return jnp.clip(nb, 0, jnp.maximum(n - 1, 0))


def _finish_graph(pos: Array, st: Array, n: Array) -> DeformationGraph:
    order = jnp.argsort(st)
    return DeformationGraph(
        positions=pos[order],
        rotations=jnp.tile(jnp.eye(3, dtype=jnp.float32), (NODE_CAP, 1, 1)),
        translations=jnp.zeros((NODE_CAP, 3), jnp.float32),
        stamps=st[order],
        neighbours=_temporal_neighbours(n),
        n_nodes=n,
    )


def build_graph(positions: Array, stamps: Array, valid: Array,
                nb_live: Array) -> DeformationGraph:
    """Sample up to NODE_CAP nodes uniformly over the live prefix of the
    model, ordered by birth stamp with temporal neighbours
    (buildGraphFromModel, deformation_graph.cu:59-182)."""
    C = positions.shape[0]
    n = jnp.minimum(jnp.maximum(nb_live, 1), NODE_CAP)
    # uniform stride over [0, nb_live)
    k = jnp.arange(NODE_CAP, dtype=jnp.int32)
    idx = jnp.clip((k * jnp.maximum(nb_live, 1)) // NODE_CAP, 0, C - 1)
    active = k < n

    pos = positions[idx]
    st = jnp.where(active, stamps[idx], jnp.int32(2**30))
    return _finish_graph(pos, st, n)


def build_graph_sharded(positions: Array, stamps: Array, nb_live_local: Array,
                        axis_name: str) -> DeformationGraph:
    """Distributed node sampling over a capacity-sharded model: each shard
    strides NODE_CAP/D candidates from its LOCAL live prefix, one small
    `all_gather` ((NODE_CAP, 3) positions + stamps, a few KB on ICI) makes
    the graph identical on every device, and everything downstream
    (optimise, bindings) runs replicated while `apply_to_model` stays
    shard-local. SURVEY.md §2.3's distributed-BA pattern applied to the
    ElasticFusion graph."""
    D = jax.lax.axis_size(axis_name)
    per = NODE_CAP // D
    C = positions.shape[0]
    k = jnp.arange(per, dtype=jnp.int32)
    idx = jnp.clip((k * jnp.maximum(nb_live_local, 1)) // per, 0, C - 1)
    n_loc = jnp.minimum(nb_live_local, per)
    active = k < n_loc

    pos_l = positions[idx]
    st_l = jnp.where(active, stamps[idx], jnp.int32(2**30))
    pos = jax.lax.all_gather(pos_l, axis_name).reshape(NODE_CAP, 3)
    st = jax.lax.all_gather(st_l, axis_name).reshape(NODE_CAP)
    n = jnp.maximum(jax.lax.psum(n_loc, axis_name), 1)
    return _finish_graph(pos, st, n)


def bind_vertices(graph: DeformationGraph, v_pos: Array, v_stamp: Array,
                  v_valid: Array, look_back: int = LOOK_BACK
                  ) -> VertexBinding:
    """Bind each vertex to its N_NEIGH nearest nodes inside a time-local
    window, with squared-falloff weights (weightVerticesSeq)."""
    V = v_pos.shape[0]
    n = graph.n_nodes

    # stamp-nearest node via searchsorted on the sorted stamp array
    anchor = jnp.searchsorted(graph.stamps, v_stamp).astype(jnp.int32)
    anchor = jnp.clip(anchor, 0, jnp.maximum(n - 1, 0))

    # candidate window of `look_back` nodes ending at the anchor (the
    # reference scans backwards from the anchor, wrapping forward if short)
    start = jnp.clip(anchor - (look_back - 1), 0,
                     jnp.maximum(n - look_back, 0))
    widx = start[:, None] + jnp.arange(look_back, dtype=jnp.int32)[None, :]
    widx = jnp.clip(widx, 0, NODE_CAP - 1)
    in_n = widx < n

    npos = graph.positions[widx]                       # (V, L, 3)
    d = jnp.linalg.norm(npos - v_pos[:, None, :], axis=-1)
    d = jnp.where(in_n, d, jnp.inf)

    # 4 nearest + the 5th for dmax
    neg_top, top_i = jax.lax.top_k(-d, N_NEIGH + 1)
    dists = -neg_top                                    # ascending
    dmax = jnp.maximum(dists[:, N_NEIGH], 1e-9)
    w = (1.0 - dists[:, :N_NEIGH] / dmax[:, None]) ** 2
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    w = w / wsum
    nodes = jnp.take_along_axis(widx, top_i[:, :N_NEIGH], axis=1)
    nodes = jnp.where(v_valid[:, None], nodes, 0)
    w = jnp.where(v_valid[:, None], w, 0.0)
    return VertexBinding(nodes=nodes, weights=w)


def blend_positions(graph_pos: Array, rot: Array, trans: Array,
                    binding: VertexBinding, v_pos: Array) -> Array:
    """Deformed position of vertices: sum_k w_k (R_k (v - g_k) + g_k + t_k)."""
    g = graph_pos[binding.nodes]          # (V, 4, 3)
    R = rot[binding.nodes]                # (V, 4, 3, 3)
    t = trans[binding.nodes]
    rel = v_pos[:, None, :] - g
    moved = jnp.einsum("vkij,vkj->vki", R, rel) + g + t
    return jnp.sum(binding.weights[..., None] * moved, axis=1)


def _residuals(rot: Array, trans: Array, graph: DeformationGraph,
               con_binding: VertexBinding, con_src: Array, con_tgt: Array,
               con_valid: Array):
    """Stacked weighted residual vector (fixed shape, masked)."""
    n_mask = (jnp.arange(NODE_CAP) < graph.n_nodes).astype(jnp.float32)

    # rot: R^T R - I (6 unique entries)
    RtR = jnp.einsum("nij,nik->njk", rot, rot)
    E = RtR - jnp.eye(3, dtype=jnp.float32)[None]
    r_rot = jnp.stack(
        [E[:, 0, 1], E[:, 0, 2], E[:, 1, 2], E[:, 0, 0], E[:, 1, 1], E[:, 2, 2]],
        axis=-1,
    ) * jnp.sqrt(W_ROT) * n_mask[:, None]

    # reg: R_j (g_k - g_j) + g_j + t_j - (g_k + t_k)
    gj = graph.positions[:, None, :]
    gk = graph.positions[graph.neighbours]             # (N, 4, 3)
    tj = trans[:, None, :]
    tk = trans[graph.neighbours]
    rel = gk - gj
    reg = (
        jnp.einsum("nij,nkj->nki", rot, rel) + gj + tj - (gk + tk)
    ) * jnp.sqrt(W_REG)
    nb_mask = (graph.neighbours < graph.n_nodes).astype(jnp.float32) * n_mask[:, None]
    r_reg = reg * nb_mask[..., None]

    # con: blended source - target
    pred = blend_positions(graph.positions, rot, trans, con_binding, con_src)
    r_con = (pred - con_tgt) * jnp.sqrt(W_CON) * con_valid[:, None].astype(jnp.float32)

    return jnp.concatenate(
        [r_rot.ravel(), r_reg.ravel(), r_con.ravel()]
    )


def optimise(graph: DeformationGraph, con_binding: VertexBinding,
             con_src: Array, con_tgt: Array, con_valid: Array,
             n_iters: int = 3, damping: float = 1e-4):
    """Dense Gauss-Newton over (rotations, translations).

    Returns (rotations, translations, error, mean_cons_err)."""
    def flat_residual(x):
        rot = x[: NODE_CAP * 9].reshape(NODE_CAP, 3, 3)
        trans = x[NODE_CAP * 9:].reshape(NODE_CAP, 3)
        return _residuals(rot, trans, graph, con_binding, con_src, con_tgt,
                          con_valid)

    x0 = jnp.concatenate(
        [graph.rotations.reshape(-1), graph.translations.reshape(-1)]
    )

    def gn_step(x, _):
        r = flat_residual(x)
        J = jax.jacfwd(flat_residual)(x)
        JtJ = J.T @ J
        Jtr = J.T @ r
        nvar = x.shape[0]
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(
                JtJ + damping * jnp.eye(nvar, dtype=jnp.float32)
            ),
            -Jtr,
        )
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x2 = x + dx
        improved = jnp.sum(flat_residual(x2) ** 2) <= jnp.sum(r**2)
        return jnp.where(improved, x2, x), None

    x, _ = jax.lax.scan(gn_step, x0, None, length=n_iters)
    rot = x[: NODE_CAP * 9].reshape(NODE_CAP, 3, 3)
    trans = x[NODE_CAP * 9:].reshape(NODE_CAP, 3)
    r = flat_residual(x)
    error = jnp.sum(r**2)

    pred = blend_positions(graph.positions, rot, trans, con_binding, con_src)
    cerr = jnp.linalg.norm(pred - con_tgt, axis=-1)
    n_con = jnp.maximum(jnp.sum(con_valid.astype(jnp.float32)), 1.0)
    mean_cons_err = jnp.sum(jnp.where(con_valid, cerr, 0.0)) / n_con
    return rot, trans, error, mean_cons_err


def apply_to_model(model: Supersurfels, graph_pos: Array, rot: Array,
                   trans: Array, binding: VertexBinding,
                   apply_mask: Array) -> Supersurfels:
    """Blend per-surfel 4-node transforms into positions/orientations/shapes
    (applyDeformation kernel, deformation_graph_kernels.cu:27-74)."""
    from supersurfel_fusion_tpu.utils.geometry import mat_to_quat, quat_to_mat

    new_pos = blend_positions(graph_pos, rot, trans, binding, model.positions)

    q = mat_to_quat(rot)                                # (NODE_CAP, 4)
    qk = q[binding.nodes]                               # (V, 4, 4)
    bq = jnp.sum(binding.weights[..., None] * qk, axis=1)
    bq = normalize(bq)
    av_rot = quat_to_mat(bq)                            # (V, 3, 3)

    m = apply_mask[:, None]
    new_positions = jnp.where(m, new_pos, model.positions)
    new_orient = jnp.where(
        m[..., None],
        model.orientations @ jnp.swapaxes(av_rot, -1, -2),
        model.orientations,
    )
    new_shapes = jnp.where(
        m[..., None], mult_ABAt(av_rot, model.shapes), model.shapes
    )
    return model._replace(
        positions=new_positions, orientations=new_orient, shapes=new_shapes
    )
