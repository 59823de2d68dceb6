"""Global loop closure: fern-triggered relocalization + map deformation.

TPU-native rewrite of `SupersurfelFusion::closeGlobalLoop`
(`core/src/supersurfel_fusion.cu:676-882`):

  keyframe <-> current feature matching (Hamming + GMS) ->
  robust relocalization -> dense ICP alignment of the keyframe's surfels
  against the current frame -> loop-corrected pose -> ~50 sampled
  constraints (+ pins) -> deformation-graph Gauss-Newton -> accept/reject ->
  apply to model + keyframe pose graph.

Design difference: the reference relocalizes with `cv::solvePnPRansac`
(EPNP, 2D-3D). Since both sides carry depth, we use 3-point Horn/Kabsch
3D-3D RANSAC — closed form per hypothesis, fully batched, no iterative
minimal solver — followed by the same dense ICP refinement. Acceptance
thresholds match the reference (error < 0.12, mean constraint error < 3e-4,
deformation_graph.cu:819).

Everything is fixed-shape and jittable so the whole branch can live under a
`lax.cond` inside the frame step (no host round-trip on the gate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, ICPConfig
from supersurfel_fusion_tpu.ops import deformation as defo
from supersurfel_fusion_tpu.ops.ferns import FernDB
from supersurfel_fusion_tpu.ops.features import Keypoints
from supersurfel_fusion_tpu.ops.icp import symmetric_icp
from supersurfel_fusion_tpu.ops.matching import gms_filter, match_bruteforce
from supersurfel_fusion_tpu.types import Pose, Supersurfels
from supersurfel_fusion_tpu.utils.geometry import orthonormalize

Array = jax.Array


class KeyframeStore(NamedTuple):
    """Fern DB + per-keyframe payloads (KeyFrame, ferns_types.hpp:42-58)."""

    db: FernDB
    kp_xy: Array       # (K, KP, 2)
    kp_p3d: Array      # (K, KP, 3) keyframe-camera-frame points
    kp_desc: Array     # (K, KP, 8) uint32
    kp_valid: Array    # (K, KP)
    sf_pos: Array      # (K, F, 3) keyframe-camera-frame surfel positions
    sf_normal: Array   # (K, F, 3)
    sf_color: Array    # (K, F, 3)
    sf_valid: Array    # (K, F)

    @staticmethod
    def empty(max_kf: int, n_ferns: int, kp_cap: int, f_cap: int
              ) -> "KeyframeStore":
        return KeyframeStore(
            db=FernDB.empty(max_kf, n_ferns),
            kp_xy=jnp.zeros((max_kf, kp_cap, 2), jnp.float32),
            kp_p3d=jnp.zeros((max_kf, kp_cap, 3), jnp.float32),
            kp_desc=jnp.zeros((max_kf, kp_cap, 8), jnp.uint32),
            kp_valid=jnp.zeros((max_kf, kp_cap), bool),
            sf_pos=jnp.zeros((max_kf, f_cap, 3), jnp.float32),
            sf_normal=jnp.zeros((max_kf, f_cap, 3), jnp.float32),
            sf_color=jnp.zeros((max_kf, f_cap, 3), jnp.float32),
            sf_valid=jnp.zeros((max_kf, f_cap), bool),
        )


def add_keyframe_payload(store: KeyframeStore, codes: Array, pose: Pose,
                         stamp: Array, kp: Keypoints, kp_p3d: Array,
                         kp_depth_ok: Array, frame: Supersurfels
                         ) -> KeyframeStore:
    """Snapshot the current frame as a keyframe (Ferns::addKeyFrame +
    the processFrame snapshot, supersurfel_fusion.cu:487-514)."""
    from supersurfel_fusion_tpu.ops.ferns import add_keyframe

    k = store.db.count
    ok = k < store.db.codes.shape[0]
    kc = jnp.where(ok, k, store.db.codes.shape[0] - 1)

    def put(dst, src):
        return dst.at[kc].set(jnp.where(ok, src, dst[kc]))

    return KeyframeStore(
        db=add_keyframe(store.db, codes, pose.R, pose.t, stamp),
        kp_xy=put(store.kp_xy, kp.xy),
        kp_p3d=put(store.kp_p3d, kp_p3d),
        kp_desc=put(store.kp_desc, kp.desc),
        kp_valid=put(store.kp_valid, kp.valid & kp_depth_ok),
        sf_pos=put(store.sf_pos, frame.positions),
        sf_normal=put(store.sf_normal, frame.orientations[:, 2, :]),
        sf_color=put(store.sf_color, frame.colors),
        sf_valid=put(store.sf_valid, frame.confidences > 0.0),
    )


def _kabsch(P: Array, Q: Array, w: Array):
    """Weighted rigid fit Q ~ R P + t (batched over leading dims)."""
    ws = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    mp = jnp.sum(P * w[..., None], -2) / ws
    mq = jnp.sum(Q * w[..., None], -2) / ws
    Pc = (P - mp[..., None, :]) * w[..., None]
    Qc = Q - mq[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", Pc, Qc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                  jnp.swapaxes(Vt, -1, -2),
                                  jnp.swapaxes(U, -1, -2)))
    S = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, S, U)  # V S U^T
    t = mq - jnp.einsum("...ij,...j->...i", R, mp)
    return R, t


def ransac_rigid_3d(src: Array, dst: Array, ok: Array, n_hyp: int = 256,
                    thresh: float = 0.05, seed: int = 7,
                    min_inliers: int = 30, min_ratio: float = 0.3,
                    src_xy: Array | None = None,
                    img_w: float = 640.0, img_h: float = 480.0,
                    cov_grid: int = 8):
    """RANSAC rigid transform dst ~ R src + t from masked 3D pairs.

    Hypothesis triples are drawn from the VALID subset (valid-first
    permutation + modulo indexing), not uniformly over all slots: with a
    sparse `ok` mask, uniform sampling makes almost every triple contain an
    invalid pair, and the fit silently degenerates (measured on fr3 MOD:
    rigid_ok false on every frame until this fix).

    When `src_xy` (pixel positions of the src points) is given, hypotheses
    are ranked by spatial COVERAGE (distinct grid cells with an inlier)
    with the raw count as tiebreak — same mover-capture defence as
    `flow.estimate_similarity_ransac`: a texture-rich walker can out-vote
    the background on raw inliers, and the rigid fit then models the
    PERSON's motion, silently inverting the depth-residual cue."""
    N = src.shape[0]
    key = jax.random.PRNGKey(seed)
    n_ok = jnp.sum(ok.astype(jnp.int32))
    # valid-first ordering; draws restricted to the first n_ok entries
    order = jnp.argsort(~ok, stable=True)
    draw = jax.random.randint(key, (n_hyp, 3), 0, 1 << 30)
    idx = order[draw % jnp.maximum(n_ok, 1)]
    P = src[idx]                      # (H, 3, 3)
    Q = dst[idx]
    w3 = ok[idx].astype(jnp.float32)
    # degenerate triples (repeated draws / collinear) score low naturally
    R, t = _kabsch(P, Q, w3)
    pred = jnp.einsum("hij,nj->hni", R, src) + t[:, None, :]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err < thresh) & ok[None, :]
    n_inl_h = jnp.sum(inl, -1)
    if src_xy is not None:
        cellw, cellh = img_w / cov_grid, img_h / cov_grid
        cx = jnp.clip((src_xy[:, 0] / cellw).astype(jnp.int32), 0, cov_grid - 1)
        cy = jnp.clip((src_xy[:, 1] / cellh).astype(jnp.int32), 0, cov_grid - 1)
        onehot = jax.nn.one_hot(cy * cov_grid + cx, cov_grid * cov_grid,
                                dtype=jnp.float32)
        coverage = jnp.sum((inl.astype(jnp.float32) @ onehot) > 0.0, axis=-1)
        rank = coverage * 4096.0 + n_inl_h
    else:
        rank = n_inl_h.astype(jnp.float32)
    scores = jnp.where(jnp.sum(w3, -1) >= 3, rank, -1.0)
    best = jnp.argmax(scores)
    best_inl = inl[best] & ok
    # refit on winners
    Rf, tf = _kabsch(src[None], dst[None], best_inl[None].astype(jnp.float32))
    Rf, tf = orthonormalize(Rf[0]), tf[0]
    n_in = jnp.sum(best_inl.astype(jnp.int32))
    valid = (n_in > min_inliers) & (
        n_in.astype(jnp.float32)
        > min_ratio * jnp.maximum(n_ok, 1).astype(jnp.float32)
    ) & jnp.all(jnp.isfinite(Rf)) & jnp.all(jnp.isfinite(tf))
    return Rf, tf, valid, n_in


class LoopClosureResult(NamedTuple):
    accepted: Array    # () bool
    pose: Pose         # corrected pose (valid when accepted)
    model: Supersurfels
    kf_poses_R: Array  # deformed keyframe poses
    kf_poses_t: Array


def close_global_loop(
    store: KeyframeStore,
    best_id: Array,
    model: Supersurfels,
    nb_supersurfels: Array,
    frame: Supersurfels,
    kp: Keypoints,
    kp_p3d: Array,
    kp_depth_ok: Array,
    target_maps: Array,
    pose: Pose,
    stamp: Array,
    cam: CameraIntrinsics,
    icp_cfg: ICPConfig,
    axis_name: str | None = None,
    payload=None,
    kf_gids: Array | None = None,
) -> LoopClosureResult:
    """The full loop-closure branch (fixed shape, jittable).

    `axis_name`: when called inside `shard_map` with `model` the LOCAL
    capacity-sharded block and `nb_supersurfels` the LOCAL live count, the
    deformation-graph nodes are sampled distributedly (one small all_gather,
    ops/deformation.py:build_graph_sharded); the relocalization/ICP/optimise
    stages are replicated math and `apply_to_model` stays shard-local.

    `payload`: when the keyframe store is itself sharded
    (parallel/kf_sharded.py), `store` holds only this shard's LOCAL rows and
    `store[best_id]` is meaningless — the caller instead psum-broadcasts the
    winning keyframe's payload (`get_payload_sharded`) and passes it here;
    `kf_gids` then gives each local row's GLOBAL keyframe id (row*D + me) so
    the pose-graph update masks against the global count correctly."""
    F = frame.capacity

    if payload is None:
        kf_desc = store.kp_desc[best_id]
        kf_valid = store.kp_valid[best_id]
        kf_xy = store.kp_xy[best_id]
        kf_p3d = store.kp_p3d[best_id]
        kf_pose = Pose(store.db.poses_R[best_id], store.db.poses_t[best_id])
        kf_stamp = store.db.stamps[best_id]
        kf_sf_pos = store.sf_pos[best_id]
        kf_sf_color = store.sf_color[best_id]
        kf_sf_normal = store.sf_normal[best_id]
        kf_sf_valid = store.sf_valid[best_id]
    else:
        kf_desc = payload.kp_desc
        kf_valid = payload.kp_valid
        kf_xy = payload.kp_xy
        kf_p3d = payload.kp_p3d
        kf_pose = Pose(payload.pose_R, payload.pose_t)
        kf_stamp = payload.stamp
        kf_sf_pos = payload.sf_pos
        kf_sf_color = payload.sf_color
        kf_sf_normal = payload.sf_normal
        kf_sf_valid = payload.sf_valid
    if kf_gids is None:
        kf_gids = jnp.arange(store.db.poses_t.shape[0], dtype=jnp.int32)

    # 1. kf -> current matching
    midx, dist, mok = match_bruteforce(kf_desc, kf_valid, kp.desc,
                                       kp.valid & kp_depth_ok)
    cur_xy = kp.xy[midx]
    inl = gms_filter(kf_xy, cur_xy, mok, float(cam.width), float(cam.height))

    # 2. 3D-3D RANSAC: kf-camera points -> current-camera points
    cur_p3d = kp_p3d[midx]
    R_init, t_init, sparse_ok, _ = ransac_rigid_3d(kf_p3d, cur_p3d, inl)
    R_init = jnp.where(sparse_ok, R_init, jnp.eye(3, dtype=jnp.float32))
    t_init = jnp.where(sparse_ok, t_init, jnp.zeros(3, jnp.float32))

    # 3. dense ICP: kf surfels (kf camera frame) against current frame
    kf_sf = Supersurfels.empty(F)._replace(
        positions=kf_sf_pos,
        colors=kf_sf_color,
        confidences=jnp.where(kf_sf_valid, 1.0, -1.0),
    )
    kf_sf = kf_sf._replace(
        orientations=kf_sf.orientations.at[:, 2, :].set(kf_sf_normal)
    )
    align_cfg = ICPConfig(
        nb_iters=icp_cfg.nb_iters, cov_thresh=1e9,  # align has no cov gate
        max_color_dist=icp_cfg.max_color_dist, max_dist=icp_cfg.max_dist,
        min_normal_dot=icp_cfg.min_normal_dot, min_inliers=50.0,
        max_translation=0.5,
    )
    icp = symmetric_icp(
        kf_sf, jnp.int32(F), target_maps, R_init, t_init, cam, align_cfg
    )

    # 4. compose: T_rel maps current-camera -> kf-camera
    # (supersurfel_fusion.cu:800-817)
    R_i_inv = jnp.where(sparse_ok, R_init.T, jnp.eye(3, dtype=jnp.float32))
    t_i_inv = jnp.where(sparse_ok, -(R_init.T @ t_init), jnp.zeros(3))
    R_rel = orthonormalize(R_i_inv @ icp.R_rel)
    t_rel = R_i_inv @ icp.t_rel + t_i_inv

    pose_ok = icp.valid | sparse_ok

    R_LC = orthonormalize(kf_pose.R @ R_rel)
    t_LC = kf_pose.R @ t_rel + kf_pose.t

    # 5. constraints: every (F/50)th valid frame surfel; src under the old
    # pose, target under the loop-corrected pose, plus a pinned copy
    step = max(F // 50, 1)
    sel = jnp.arange(0, F, step)[:50]
    n_sel = sel.shape[0]
    p_sel = frame.positions[sel]
    c_ok = frame.confidences[sel] > 0.0
    src = p_sel @ pose.R.T + pose.t
    tgt = p_sel @ R_LC.T + t_LC
    con_src = jnp.concatenate([src, tgt])           # pins: src == tgt
    con_tgt = jnp.concatenate([tgt, tgt])
    con_valid = jnp.concatenate([c_ok, c_ok]) & pose_ok
    con_stamp = jnp.concatenate(
        [jnp.full((n_sel,), stamp, jnp.int32),
         jnp.full((n_sel,), kf_stamp, jnp.int32)]
    )

    # 6. deformation graph over the live model
    if axis_name is None:
        graph = defo.build_graph(
            model.positions, model.stamps[:, 0], model.confidences > 0.0,
            nb_supersurfels,
        )
    else:
        graph = defo.build_graph_sharded(
            model.positions, model.stamps[:, 0], nb_supersurfels, axis_name
        )
    con_bind = defo.bind_vertices(graph, con_src, con_stamp, con_valid)
    rot, trans, error, mean_cerr = defo.optimise(
        graph, con_bind, con_src, con_tgt, con_valid
    )
    accepted = (
        pose_ok
        & jnp.isfinite(error)
        & (error < 0.12)
        & (mean_cerr < 3e-4)
    )

    # 7. apply to model + keyframe pose graph
    ids = jnp.arange(model.capacity, dtype=jnp.int32)
    live = (ids < nb_supersurfels) & (model.confidences > 0.0)
    vbind = defo.bind_vertices(graph, model.positions, model.stamps[:, 0], live)
    deformed = defo.apply_to_model(
        model, graph.positions, rot, trans, vbind, live & accepted
    )

    # keyframe poses (applyGraphToPoses, look_back=10); in sharded mode the
    # store rows are shard-local and kf_gids maps them to global ids
    kf_bind = defo.bind_vertices(
        graph, store.db.poses_t, store.db.stamps,
        kf_gids < store.db.count,
        look_back=10,
    )
    g = graph.positions[kf_bind.nodes]
    Rk = rot[kf_bind.nodes]
    tk = trans[kf_bind.nodes]
    rel = store.db.poses_t[:, None, :] - g
    new_t = jnp.sum(
        kf_bind.weights[..., None]
        * (jnp.einsum("vkij,vkj->vki", Rk, rel) + g + tk),
        axis=1,
    )
    blend_R = jnp.sum(kf_bind.weights[..., None, None] * Rk, axis=1)
    new_R = orthonormalize(
        jnp.einsum("vij,vjk->vik", blend_R, store.db.poses_R)
    )
    apply_kf = accepted & (kf_gids < store.db.count)
    kf_R = jnp.where(apply_kf[:, None, None], new_R, store.db.poses_R)
    kf_t = jnp.where(apply_kf[:, None], new_t, store.db.poses_t)

    out_pose = Pose(
        jnp.where(accepted, R_LC, pose.R),
        jnp.where(accepted, t_LC, pose.t),
    )
    return LoopClosureResult(
        accepted=accepted,
        pose=out_pose,
        model=deformed,
        kf_poses_R=kf_R,
        kf_poses_t=kf_t,
    )
