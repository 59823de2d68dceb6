import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import MODConfig
from supersurfel_fusion_tpu.ops.flow import (
    dense_flow,
    estimate_similarity_ransac,
    warp_similarity,
)
from supersurfel_fusion_tpu.ops.motion import (
    geometric_clusters,
    superpixel_adjacency,
)

H, W, CS = 128, 160, 16
GH, GW = H // CS, W // CS


def test_similarity_ransac_with_outliers(rng):
    n = 200
    src = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    th = 0.1
    a_gt = 1.02 * np.cos(th)
    b_gt = 1.02 * np.sin(th)
    t_gt = np.array([5.0, -3.0])
    dst = np.stack(
        [a_gt * src[:, 0] - b_gt * src[:, 1] + t_gt[0],
         b_gt * src[:, 0] + a_gt * src[:, 1] + t_gt[1]], -1
    ).astype(np.float32)
    dst[:50] += rng.uniform(30, 120, (50, 2))  # 25% outliers
    a, b, tx, ty, ok = estimate_similarity_ransac(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool)
    )
    assert bool(ok)
    np.testing.assert_allclose(float(a), a_gt, atol=2e-3)
    np.testing.assert_allclose(float(b), b_gt, atol=2e-3)
    np.testing.assert_allclose([float(tx), float(ty)], t_gt, atol=0.5)


def test_warp_similarity_identity(rng):
    img = jnp.asarray(rng.uniform(0, 255, (32, 40)).astype(np.float32))
    out = warp_similarity(img, jnp.float32(1.0), jnp.float32(0.0),
                          jnp.float32(0.0), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_warp_similarity_translation(rng):
    img = jnp.asarray(rng.uniform(0, 255, (32, 40)).astype(np.float32))
    out = warp_similarity(img, jnp.float32(1.0), jnp.float32(0.0),
                          jnp.float32(3.0), jnp.float32(0.0))
    # output(x, y) = img(x - 3, y)
    np.testing.assert_allclose(
        np.asarray(out)[:, 3:], np.asarray(img)[:, :-3], atol=1e-3
    )


def test_dense_flow_recovers_shift(rng):
    base = rng.uniform(0, 255, (80, 100)).astype(np.float32)
    from supersurfel_fusion_tpu.ops.features import gaussian_blur
    base = np.asarray(gaussian_blur(jnp.asarray(base)))
    I1 = base[8:72, 10:90]
    I0 = base[4:68, 5:85]   # I0 content appears in I1 shifted by (-4, -5)
    flow = np.asarray(dense_flow(jnp.asarray(I0.copy()), jnp.asarray(I1.copy())))
    inner = flow[20:-20, 20:-20]
    med = np.median(inner.reshape(-1, 2), axis=0)
    np.testing.assert_allclose(med, [-5, -4], atol=0.6)


def grid_labels():
    y = np.arange(H)[:, None]
    x = np.arange(W)[None, :]
    return jnp.asarray(((y // CS) * GW + (x // CS)) * np.ones((H, W), int),
                       jnp.int32)


def test_superpixel_adjacency_grid():
    adj = np.asarray(superpixel_adjacency(grid_labels(), GH, GW, CS))
    # grid labels: each cell adjacent exactly to its 4-neighbours
    # code of (dy=0,dx=1) in the 5x5 table = 2*5 + 3 = 13
    assert adj[1, 1, 13]          # right neighbour
    assert adj[1, 1, 11]          # left
    assert adj[1, 1, 7]           # up (dy=-1 -> 1*5+2)
    assert adj[1, 1, 17]          # down
    assert not adj[1, 1, 12]      # self
    assert not adj[1, 1, 6]       # diagonal not adjacent on a grid
    assert not adj[0, 0, 11]      # border: no left neighbour


def test_geometric_clusters_split_by_convexity():
    cfg = MODConfig()
    adj = np.asarray(superpixel_adjacency(grid_labels(), GH, GW, CS))
    # two flat regions at different depths, normals all +z:
    # left half z=1, right half z=2 => c_ij along z => |n.c| = 1 -> split
    pos = np.zeros((GH, GW, 3), np.float32)
    pos[..., 0] = np.arange(GW)[None, :] * 0.1
    pos[..., 1] = np.arange(GH)[:, None] * 0.1
    pos[..., 2] = np.where(np.arange(GW)[None, :] < GW // 2, 1.0, 2.0)
    nrm = np.zeros((GH, GW, 3), np.float32)
    nrm[..., 2] = 1.0
    conf = np.ones((GH, GW), np.float32)
    root, gated = geometric_clusters(
        jnp.asarray(adj), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray(conf), GH, GW, cfg,
    )
    root = np.asarray(root)
    left = root[:, : GW // 2]
    right = root[:, GW // 2:]
    # each half is one cluster, and they differ
    assert len(np.unique(left)) == 1
    assert len(np.unique(right)) == 1
    assert left[0, 0] != right[0, 0]


def test_heat_update_persistence_and_decay():
    """Temporal heat: fresh evidence writes 1, decays ~log(thresh)/log(decay)
    frames after evidence stops, and never self-reinforces."""
    import jax.numpy as jnp
    from supersurfel_fusion_tpu.config import MODConfig
    from supersurfel_fusion_tpu.ops.motion import heat_update

    cfg = MODConfig(temporal_heat=True, heat_decay=0.85, heat_thresh=0.3)
    gh, gw, cs = 6, 8, 16
    heat = jnp.zeros((gh, gw), jnp.float32)
    fresh = jnp.zeros((gh, gw), bool).at[2, 3].set(True)
    ident = (1.0, 0.0, 0.0, 0.0)

    mark, heat = heat_update(heat, fresh, *ident, True, cs, cfg)
    assert not bool(mark[2, 3])          # heat from BEFORE this frame only
    assert float(heat[2, 3]) == 1.0

    none = jnp.zeros((gh, gw), bool)
    n_persist = 0
    for _ in range(20):
        mark, heat = heat_update(heat, none, *ident, True, cs, cfg)
        if bool(mark[2, 3]):
            n_persist += 1
        else:
            break
    # log(0.3)/log(0.85) ~ 7.4 frames of persistence
    assert 5 <= n_persist <= 9
    # fully decayed cell stays off forever (no self-reinforcement)
    for _ in range(3):
        mark, heat = heat_update(heat, none, *ident, True, cs, cfg)
    assert not bool(mark.any())


def test_heat_update_warps_with_camera_motion():
    """A 32 px horizontal camera pan (2 cells at cs=16) moves the heat by 2
    cells so it stays glued to the scene content, not the image."""
    import jax.numpy as jnp
    from supersurfel_fusion_tpu.config import MODConfig
    from supersurfel_fusion_tpu.ops.motion import heat_update

    cfg = MODConfig(temporal_heat=True, heat_decay=0.95, heat_thresh=0.3)
    gh, gw, cs = 6, 8, 16
    heat = jnp.zeros((gh, gw), jnp.float32).at[3, 2].set(1.0)
    none = jnp.zeros((gh, gw), bool)
    # prev->current similarity: pure translation +32 px in x
    mark, new_heat = heat_update(heat, none, 1.0, 0.0, 32.0, 0.0, True,
                                 cs, cfg)
    assert bool(mark[3, 4]) and not bool(mark[3, 2])
    assert float(new_heat[3, 4]) > 0.9
