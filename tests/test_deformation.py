"""Deformation graph: residual correctness + a loop-closure-style recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.ops.deformation import (
    NODE_CAP,
    VertexBinding,
    apply_to_model,
    bind_vertices,
    blend_positions,
    build_graph,
    optimise,
)
from supersurfel_fusion_tpu.types import Supersurfels


def line_model(n=400):
    """Surfels along a line with increasing stamps (a 'corridor')."""
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.linspace(0, 4, n)
    stamps = np.arange(n, dtype=np.int32)
    return pos, stamps


def test_build_graph_sorted_neighbours():
    pos, stamps = line_model()
    g = build_graph(jnp.asarray(pos), jnp.asarray(stamps),
                    jnp.ones(len(pos), bool), jnp.int32(len(pos)))
    n = int(g.n_nodes)
    assert n == NODE_CAP
    st = np.asarray(g.stamps)[:n]
    assert (np.diff(st) >= 0).all()
    nb = np.asarray(g.neighbours)[:n]
    assert (nb >= 0).all() and (nb < n).all()
    assert (nb != np.arange(n)[:, None]).all()


def test_bind_vertices_weights():
    pos, stamps = line_model()
    g = build_graph(jnp.asarray(pos), jnp.asarray(stamps),
                    jnp.ones(len(pos), bool), jnp.int32(len(pos)))
    b = bind_vertices(g, jnp.asarray(pos), jnp.asarray(stamps),
                      jnp.ones(len(pos), bool))
    w = np.asarray(b.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (w >= 0).all()
    # identity graph => blended positions == original
    out = blend_positions(g.positions, g.rotations, g.translations, b,
                          jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), pos, atol=1e-5)


def test_optimise_identity_when_constraints_satisfied():
    pos, stamps = line_model()
    g = build_graph(jnp.asarray(pos), jnp.asarray(stamps),
                    jnp.ones(len(pos), bool), jnp.int32(len(pos)))
    # constraints: targets == sources (already satisfied)
    src = jnp.asarray(pos[:16])
    b = bind_vertices(g, src, jnp.asarray(stamps[:16]), jnp.ones(16, bool))
    rot, trans, err, cerr = optimise(g, b, src, src, jnp.ones(16, bool))
    assert float(cerr) < 1e-4
    np.testing.assert_allclose(np.asarray(trans), 0.0, atol=1e-3)


def test_optimise_pulls_drifted_end():
    """Classic loop closure: the far end of a drifted corridor is pulled back;
    the deformation must move late vertices and leave early ones pinned."""
    pos, stamps = line_model()
    g = build_graph(jnp.asarray(pos), jnp.asarray(stamps),
                    jnp.ones(len(pos), bool), jnp.int32(len(pos)))

    # constraints: pin the start (targets = sources), shift the end by dy=0.2
    n_con = 32
    src_idx = np.concatenate([np.arange(16), len(pos) - 16 + np.arange(16)])
    src = pos[src_idx]
    tgt = src.copy()
    tgt[16:, 1] += 0.2
    b = bind_vertices(g, jnp.asarray(src), jnp.asarray(stamps[src_idx]),
                      jnp.ones(n_con, bool))
    rot, trans, err, cerr = optimise(
        g, b, jnp.asarray(src), jnp.asarray(tgt), jnp.ones(n_con, bool),
        n_iters=5,
    )
    assert float(cerr) < 0.02, float(cerr)

    # apply to the whole model
    model = Supersurfels.empty(len(pos))._replace(
        positions=jnp.asarray(pos),
        confidences=jnp.ones(len(pos), jnp.float32),
        stamps=jnp.asarray(np.stack([stamps, stamps], -1)),
    )
    vb = bind_vertices(g, model.positions, model.stamps[:, 0],
                       jnp.ones(len(pos), bool))
    out = apply_to_model(model, g.positions, rot, trans, vb,
                         jnp.ones(len(pos), bool))
    p2 = np.asarray(out.positions)
    assert abs(p2[-1, 1] - 0.2) < 0.05      # end moved to target
    assert abs(p2[0, 1]) < 0.05             # start stayed
    # middle interpolates smoothly (monotone-ish in y)
    y = p2[:, 1]
    assert y[200] > 0.01 and y[200] < 0.2
    # orientations stay orthonormal
    R = np.asarray(out.orientations)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(len(pos), 0),
                               atol=5e-2)
