"""Moving-object detection (MOD): geometric clustering + residual-flow gating.

TPU-native rewrite of `MotionDetection::detectMotionSimple` and
`computeGeometricClusters` (`core/src/motion_detection.cu:180-678`,
`motion_detection_kernels.cu:27-233`):

* The O(N^2) superpixel adjacency matrix (downloaded to host every frame in
  the reference) becomes a (GH, GW, 25) stencil: thanks to the 3x3 label
  locality, adjacent superpixels always live within a 5x5 cell window, so
  adjacency is 25 static shifts — no matrix, no download.
* The host DFS connected components become iterative min-label propagation
  over the gated adjacency (deterministic, fixed iteration count covering the
  grid diameter).
* The camera-motion compensation chain (GMS matches -> similarity RANSAC ->
  warp -> dense flow) is ops/flow.py; per-superpixel mean flow is the same
  cell-blocked reduction as TPS.
* Cluster statistics / thresholds / label fill-in follow the reference's
  logic, including its quirks (flow normalized by full superpixel size, the
  adaptive flow threshold 2.5 + 0.5 * |H translation|).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from supersurfel_fusion_tpu.config import CameraIntrinsics, MODConfig, TPSConfig
from supersurfel_fusion_tpu.ops.depth import shift2d
from supersurfel_fusion_tpu.ops.features import Keypoints
from supersurfel_fusion_tpu.ops.flow import (
    bilinear_sample,
    dense_flow,
    estimate_similarity_ransac,
    warp_similarity,
)
from supersurfel_fusion_tpu.ops.matching import gms_filter, match_bruteforce
from supersurfel_fusion_tpu.ops.tps import TPSResult, cell_reduce, _rel_code
from supersurfel_fusion_tpu.types import Supersurfels
from supersurfel_fusion_tpu.utils.color import rgb_to_lab

Array = jax.Array

# 5x5 cell-offset table for superpixel adjacency
_OFFS25 = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]


class MODPrev(NamedTuple):
    """Previous-frame context carried in the SLAM state."""

    gray: Array        # (H, W)
    depth: Array       # (H, W) bilateral-filtered depth
    kp_xy: Array       # (K, 2)
    kp_p3d: Array      # (K, 3) camera-frame keypoint positions
    kp_desc: Array     # (K, 8) uint32
    kp_valid: Array    # (K,)
    initialized: Array  # () bool
    heat: Array        # (GH, GW) dynamic-mask temporal heat (config.MODConfig
    #                    .temporal_heat; decayed + similarity-warped each frame)


def superpixel_adjacency(labels: Array, gh: int, gw: int, cs: int) -> Array:
    """(GH, GW, 25) boolean: superpixel (y, x) adjacent to (y+dy, x+dx).

    Two superpixels are adjacent when some pixel has a 4-neighbour with the
    other label (computeSuperpixelsAdjacency, motion_detection_kernels.cu:
    135-203)."""
    H, W = labels.shape
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) // cs
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // cs
    gy, gx = labels // gw, labels % gw

    acc = jnp.zeros((gh, gw, 25), jnp.float32)
    for dy, dx in ((0, 1), (1, 0)):
        nb = shift2d(labels, dy, dx, fill=-1)
        ngy, ngx = nb // gw, nb % gw
        pair_ok = (nb >= 0) & (nb != labels)
        # offset of neighbour's label cell relative to own label cell
        ddy = ngy - gy + 2
        ddx = ngx - gx + 2
        in_win = (ddy >= 0) & (ddy < 5) & (ddx >= 0) & (ddx < 5)
        code25 = jnp.clip(ddy, 0, 4) * 5 + jnp.clip(ddx, 0, 4)
        onehot = jax.nn.one_hot(
            jnp.where(pair_ok & in_win, code25, 25), 25, dtype=jnp.float32
        )
        acc = acc + cell_reduce(onehot, labels, gh, gw, cs)
        # ... and the symmetric direction, keyed by the neighbour's label
        code25_sym = jnp.clip(4 - ddy, 0, 4) * 5 + jnp.clip(4 - ddx, 0, 4)
        onehot_sym = jax.nn.one_hot(
            jnp.where(pair_ok & in_win, code25_sym, 25), 25, dtype=jnp.float32
        )
        acc = acc + cell_reduce(
            onehot_sym, jnp.where(pair_ok, nb, labels), gh, gw, cs
        )
    return acc > 0.0


def _shift_table(t: Array, dy: int, dx: int, fill=0.0) -> Array:
    """t[(y+dy, x+dx)] with fill outside — same semantics as shift2d."""
    return shift2d(t, dy, dx, fill=fill)


def geometric_clusters(adj: Array, positions: Array, normals: Array,
                       conf: Array, gh: int, gw: int, cfg: MODConfig):
    """Connected components over convexity-gated adjacency.

    positions/normals/conf: (GH, GW, ...) per-superpixel tables (camera frame).
    Returns (root (GH,GW) int32 cluster id = min member index, gated_adj
    (GH,GW,25) bool)."""
    eps = 1e-9

    def edge_ok(dy, dx, k):
        pj = _shift_table(positions, dy, dx, fill=jnp.nan)
        nj = _shift_table(normals, dy, dx, fill=0.0)
        cj = _shift_table(conf, dy, dx, fill=-1.0)
        d = positions - pj
        dn = jnp.linalg.norm(d, axis=-1)
        c_ij = d / jnp.maximum(dn, eps)[..., None]
        ni = normals
        cross = jnp.linalg.norm(jnp.cross(ni, nj), axis=-1)
        dist = (
            cross
            + jnp.abs(jnp.sum(ni * c_ij, axis=-1))
            + jnp.abs(jnp.sum(nj * c_ij, axis=-1))
        ) / 3.0
        ok = (
            adj[..., k]
            & (conf > 0.0) & (cj > 0.0)
            & jnp.isfinite(dist) & (dist < cfg.convexity_thresh)
        )
        return ok

    gated = jnp.stack(
        [edge_ok(dy, dx, k) for k, (dy, dx) in enumerate(_OFFS25)], axis=-1
    )

    ids = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) * gw
        + jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    )

    def prop(_, root):
        new = root
        for k, (dy, dx) in enumerate(_OFFS25):
            if dy == 0 and dx == 0:
                continue
            rj = _shift_table(root, dy, dx, fill=jnp.int32(1 << 29))
            new = jnp.where(gated[..., k], jnp.minimum(new, rj), new)
        return new

    root = jax.lax.fori_loop(0, cfg.cc_iters, prop, ids)
    return root, gated


def heat_update(prev_heat: Array, fresh: Array, a, b, tx, ty, warp_ok,
                cs: int, cfg: MODConfig):
    """Temporal-persistence update for the dynamic mask.

    prev_heat: (GH, GW) heat after the previous frame. fresh: (GH, GW) bool,
    THIS frame's real-evidence dynamic marks. (a, b, tx, ty) is the
    prev->current camera-motion similarity; heat rides along by sampling
    prev_heat at the inverse-transformed current cell centre (identity when
    warp_ok is False). Returns (heat_mark (GH, GW) bool — cells to keep
    dynamic, new_heat (GH, GW)). Fresh evidence rewrites heat to 1 so
    persistence is bounded at ~log(heat_thresh)/log(heat_decay) frames after
    the last real detection; heat never reinforces itself."""
    gh, gw = prev_heat.shape
    cy = (jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0) + 0.5) * cs
    cx = (jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1) + 0.5) * cs
    det_s = jnp.maximum(a * a + b * b, 1e-12)
    px = (a * (cx - tx) + b * (cy - ty)) / det_s
    py = (-b * (cx - tx) + a * (cy - ty)) / det_s
    px = jnp.where(warp_ok, px, cx)
    py = jnp.where(warp_ok, py, cy)
    warped = bilinear_sample(prev_heat, px / cs - 0.5, py / cs - 0.5, 0.0)
    heat_mark = warped > cfg.heat_thresh
    new_heat = jnp.maximum(fresh.astype(jnp.float32), warped * cfg.heat_decay)
    return heat_mark, new_heat


def detect_motion(
    rgb_gray: Array,
    depth: Array,
    prev: MODPrev,
    kp: Keypoints,
    frame: Supersurfels,
    tps: TPSResult,
    cam: CameraIntrinsics,
    tps_cfg: TPSConfig,
    cfg: MODConfig,
    detector_params=None,
):
    """Full MOD pass: geometric clustering + residual flow, optionally
    combined with the person detector (detectMotionCombined,
    motion_detection.cu:680-1121) when `detector_params` is given and
    cfg.use_yolo is set.

    Returns (is_static_sp (N,) bool, static_kp (K,) bool, new_prev).
    On the first frame (prev.initialized false) everything is static."""
    H, W = rgb_gray.shape
    cs = tps_cfg.cell_size
    gh, gw = H // cs, W // cs
    n_sp = gh * gw

    # ---- geometric clustering (thread t in the reference)
    adj = superpixel_adjacency(tps.labels, gh, gw, cs)
    pos_t = frame.positions.reshape(gh, gw, 3)
    nrm_t = frame.orientations[:, 2, :].reshape(gh, gw, 3)
    conf_t = frame.confidences.reshape(gh, gw)
    root, gated = geometric_clusters(adj, pos_t, nrm_t, conf_t, gh, gw, cfg)

    # ---- combined path: person boxes -> depth-guided flood fill FIRST, so
    # person keypoints never enter the camera-motion estimation and person
    # superpixels never dilute cluster flow statistics
    # (detectMotionCombined order, motion_detection.cu:744-871)
    combined = cfg.use_yolo and detector_params is not None
    ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    kp_sp = tps.labels[vi, ui]
    if combined:
        from supersurfel_fusion_tpu.models.person_detector import detect

        det = detect(detector_params, rgb_gray, depth,
                     max_det=cfg.max_person_boxes,
                     score_thresh=cfg.person_score_thresh)
        person = person_flood_fill(
            det.boxes, det.valid, adj, tps.stats.centroid, pos_t, conf_t,
            tps.labels, gh, gw, cs, depth_gate=cfg.person_depth_gate,
        ).reshape(-1)
    else:
        person = jnp.zeros((n_sp,), dtype=bool)
    kp_nonperson = kp.valid & ~person[kp_sp]

    # current keypoint 3D from the slanted-plane depth (for the rigid fit)
    zk = depth[vi, ui]
    kp_z_ok = (zk >= 0.2) & (zk < 5.0)
    kp_p3d = jnp.stack(
        [zk * (kp.xy[:, 0] - cam.cx) / cam.fx,
         zk * (kp.xy[:, 1] - cam.cy) / cam.fy, zk], axis=-1,
    )

    # ---- camera-motion-compensated residual flow
    midx, dist, mok = match_bruteforce(prev.kp_desc, prev.kp_valid,
                                       kp.desc, kp_nonperson)
    mxy = kp.xy[midx]
    inl = gms_filter(prev.kp_xy, mxy, mok, float(W), float(H))
    a, b, tx, ty, H_ok = estimate_similarity_ransac(
        prev.kp_xy, mxy, inl, img_w=float(W), img_h=float(H))

    gray_est = warp_similarity(prev.gray, a, b, tx, ty, 0.0)
    flow = dense_flow(rgb_gray, gray_est)   # current -> warped prev (DIS order)

    # ---- per-superpixel mean residual flow (borders + magnitude gates as in
    # initSuperpixelsUVFlow: border 40, 2 < |uv| <= 50; normalized by the full
    # superpixel pixel count, reference quirk included)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    mag = jnp.linalg.norm(flow, axis=-1)
    take = (
        (x >= 40) & (x < W - 40) & (y >= 40) & (y < H - 40)
        & jnp.isfinite(mag) & (mag > 2.0) & (mag <= 50.0)
    )
    fl = jnp.where(take[..., None], flow, 0.0)
    sums = cell_reduce(fl, tps.labels, gh, gw, cs)            # (GH, GW, 2)
    sp_size = jnp.maximum(tps.stats.size, 1.0)
    uv_sp = sums / sp_size[..., None]
    uv_mag = jnp.linalg.norm(uv_sp, axis=-1).reshape(-1)      # (N,)

    # ---- cluster membership + singleton fill-in
    # combined path: clusters need > 2 members and person superpixels carry
    # no label (their flow never enters the statistics;
    # motion_detection.cu:949-976)
    root_f = root.reshape(-1)
    csize = jnp.zeros((n_sp,), jnp.int32).at[root_f].add(1)
    min_csize = 2 if combined else 1
    in_cluster = csize[root_f] > min_csize
    label = jnp.where(in_cluster & ~person, root_f, -1)

    # fill-in 1: adopt the unanimous neighbour label (person superpixels are
    # skipped in the combined path: "if(!isStatic[i]) continue")
    person_t = person.reshape(gh, gw)
    label_t = label.reshape(gh, gw)
    any_n = jnp.zeros((gh, gw), bool)
    agree = jnp.ones((gh, gw), bool)
    ref_lab = jnp.full((gh, gw), -1, jnp.int32)
    for k, (dy, dx) in enumerate(_OFFS25):
        if dy == 0 and dx == 0:
            continue
        lj = _shift_table(label_t, dy, dx, fill=jnp.int32(-2))
        is_n = adj[..., k]
        first = is_n & ~any_n
        ref_lab = jnp.where(first, lj, ref_lab)
        agree = agree & (~is_n | (lj == ref_lab) | first)
        any_n = any_n | is_n
    fill1 = (label_t < 0) & ~person_t & any_n & agree & (ref_lab >= 0)
    label_t = jnp.where(fill1, ref_lab, label_t)

    # fill-in 2: closest neighbour in Lab colour (dist < 20)
    lab_col = rgb_to_lab(tps.stats.color)                     # (GH, GW, 3)
    best_d = jnp.full((gh, gw), 20.0)
    best_l = jnp.full((gh, gw), -1, jnp.int32)
    for k, (dy, dx) in enumerate(_OFFS25):
        if dy == 0 and dx == 0:
            continue
        lj = _shift_table(label_t, dy, dx, fill=jnp.int32(-1))
        cj = _shift_table(lab_col, dy, dx, fill=jnp.nan)
        d = jnp.linalg.norm(lab_col - cj, axis=-1)
        cand = adj[..., k] & (lj >= 0) & jnp.isfinite(d) & (d < best_d)
        best_d = jnp.where(cand, d, best_d)
        best_l = jnp.where(cand, lj, best_l)
    fill2 = (label_t < 0) & ~person_t & (best_l >= 0)
    label_t = jnp.where(fill2, best_l, label_t)
    label = label_t.reshape(-1)

    # ---- cluster mean flow + threshold (flow base 2.5 simple / 4.0 combined,
    # motion_detection.cu:552 vs :1055)
    lab_c = jnp.where(label >= 0, label, n_sp)
    cl_flow = jnp.zeros((n_sp + 1,), jnp.float32).at[lab_c].add(uv_mag)
    cl_cnt = jnp.zeros((n_sp + 1,), jnp.float32).at[lab_c].add(1.0)
    cl_mean = cl_flow / jnp.maximum(cl_cnt, 1.0)

    base = cfg.flow_thresh_combined if combined else cfg.flow_thresh_simple
    flow_thresh = base + 0.5 * jnp.sqrt(tx * tx + ty * ty)
    dyn_cluster = cl_mean > flow_thresh                        # (N+1,)

    # ---- cluster depth-residual cue. The reference computes a 2D-affine
    # depth residual but ships it disabled (motion_detection.cu:538-571, the
    # commented `|| clusters_depth_diff > depth_thresh`) — almost certainly
    # because the affine warp produces metre-scale parallax artefacts at
    # every depth discontinuity. We enable the cue with the residual done
    # RIGHT: a full SE(3) inverse-warp against the previous slanted-plane
    # depth (ops/flow.py:se3_depth_residual), with the rigid motion fitted by
    # 3D-3D RANSAC over the matched keypoints. Static structure (including
    # depth edges) cancels exactly; movers leave metre-scale residuals.
    dscale = (cfg.depth_cue_scale_combined if combined
              else cfg.depth_cue_scale_simple)
    if dscale > 0:
        from supersurfel_fusion_tpu.ops.flow import se3_depth_residual
        from supersurfel_fusion_tpu.ops.loop_closure import ransac_rigid_3d

        pair_ok = (
            inl & kp_z_ok[midx] & prev.kp_valid
            & (prev.kp_p3d[:, 2] >= 0.2) & (prev.kp_p3d[:, 2] < 5.0)
        )
        R_rig, t_rig, rigid_ok, _ = ransac_rigid_3d(
            prev.kp_p3d, kp_p3d[midx], pair_ok, thresh=0.05,
            min_inliers=15, min_ratio=0.15,
            src_xy=prev.kp_xy, img_w=float(W), img_h=float(H),
        )
        resid = se3_depth_residual(
            depth, prev.depth, R_rig, t_rig,
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        resid_abs = jnp.abs(resid)
        # POSITIVE part only: pixels newly covered by a mover. The negative
        # part is background the mover just revealed — static scene.
        resid_pos = jnp.clip(resid, 0.0, None)
        r_valid = (resid_abs > 0.0).astype(jnp.float32)
        rsums = cell_reduce(
            jnp.stack([resid_abs, resid_pos, r_valid], axis=-1),
            tps.labels, gh, gw, cs,
        )
        sp_zdiff = (rsums[..., 0] / jnp.maximum(rsums[..., 2], 32.0)
                    ).reshape(-1)
        sp_pos_t = rsums[..., 1] / jnp.maximum(rsums[..., 2], 32.0)
        zsp = jnp.where(pos_t[..., 2] > 0, pos_t[..., 2], 0.0).reshape(-1)
        cl_zdiff = jnp.zeros((n_sp + 1,), jnp.float32).at[lab_c].add(sp_zdiff)
        cl_z = jnp.zeros((n_sp + 1,), jnp.float32).at[lab_c].add(zsp)
        cl_zdiff = cl_zdiff / jnp.maximum(cl_cnt, 1.0)
        cl_z = cl_z / jnp.maximum(cl_cnt, 1.0)
        # Kinect noise model threshold (reference scale at :566/:1056)
        depth_thresh = dscale * (0.0012 + 0.0019 * (cl_z - 0.4) ** 2)
        dyn_cluster = dyn_cluster | (
            rigid_ok & (cl_zdiff > depth_thresh)
        )

        # DIRECT per-superpixel marking with hysteresis. The geometric
        # clustering fragments people (motion blur + non-planar cloth kill
        # the convexity edges), so cluster-mean statistics dilute or drop
        # exactly the superpixels with the strongest evidence — measured on
        # fr3/walking_halfsphere frames 55-100: 50-240 superpixels/frame
        # with mean positive residual > 0.15 m, only ~half inside any
        # cluster. Superpixels whose own newly-closer residual is
        # unambiguous (> resid_hot_thresh) are marked dynamic outright and
        # expanded Canny-style over the adjacency into weak-evidence
        # (> resid_low_thresh) neighbours, covering the constant-depth
        # interior of laterally-moving bodies.
        if cfg.resid_direct:
            hot_t = (sp_pos_t > cfg.resid_hot_thresh) & rigid_ok
            weak_t = sp_pos_t > cfg.resid_low_thresh

            def hyst(_, m):
                grown = m
                for k, (dy, dx) in enumerate(_OFFS25):
                    if dy == 0 and dx == 0:
                        continue
                    grown = grown | (
                        _shift_table(m, dy, dx, fill=False) & adj[..., k]
                    )
                return m | (grown & weak_t)

            mark_t = jax.lax.fori_loop(0, cfg.resid_hyst_iters, hyst, hot_t)
            mark_resid = mark_t.reshape(-1)
        else:
            mark_resid = jnp.zeros((n_sp,), dtype=bool)
    else:
        mark_resid = jnp.zeros((n_sp,), dtype=bool)

    dynamic = ((label >= 0) & dyn_cluster[lab_c]) | person | mark_resid

    # ---- temporal persistence: paused movers stop firing every cue above
    # (flow, depth residual) but must stay excluded until they re-anchor —
    # the reference gets this for free from its COCO person prior
    # (motion_detection.cu:156-178). Carry a per-cell heat map across
    # frames: warp by the inverse camera-motion similarity, decay, and keep
    # cells above heat_thresh dynamic. Fresh evidence (not heat itself)
    # rewrites heat to 1, so persistence is bounded at
    # ~log(thresh)/log(decay) frames after the last real detection.
    if cfg.temporal_heat:
        # seed heat ONLY from the targeted cues (person boxes + direct
        # depth-residual marks). Seeding from the broad cluster cue
        # over-marks: measured fr3 full-sequence, icp_valid 80.6% -> 22.7%
        # and w126 0.13 -> 0.25 (artifacts/exp10_heat.log, fr3_heat85).
        heat_mark, new_heat = heat_update(
            prev.heat, (person | mark_resid).reshape(gh, gw), a, b, tx, ty,
            H_ok & prev.initialized, cs, cfg,
        )
        heat_mark = heat_mark.reshape(-1) & prev.initialized
        dynamic = dynamic | heat_mark
    else:
        heat_mark = jnp.zeros((n_sp,), dtype=bool)
        new_heat = prev.heat

    first_frame = ~prev.initialized | ~H_ok
    # person-, residual- and heat-driven dynamics apply even when the 2D
    # flow compensation failed (the rigid fit is gated separately by
    # rigid_ok; heat falls back to an identity warp)
    is_static_sp = jnp.where(
        first_frame, ~(person | mark_resid | heat_mark), ~dynamic
    )

    # ---- static keypoints (dynamic ones dropped from VO + prev context)
    static_kp = kp.valid & is_static_sp[kp_sp]

    new_prev = MODPrev(
        gray=rgb_gray,
        depth=depth,
        kp_xy=kp.xy,
        kp_p3d=kp_p3d,
        kp_desc=kp.desc,
        kp_valid=static_kp,
        initialized=jnp.bool_(True),
        heat=new_heat,
    )
    return is_static_sp, static_kp, new_prev


def init_prev(h: int, w: int, k: int, cell_size: int = 16) -> MODPrev:
    return MODPrev(
        gray=jnp.zeros((h, w), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        kp_xy=jnp.zeros((k, 2), jnp.float32),
        kp_p3d=jnp.zeros((k, 3), jnp.float32),
        kp_desc=jnp.zeros((k, 8), jnp.uint32),
        kp_valid=jnp.zeros((k,), bool),
        initialized=jnp.bool_(False),
        heat=jnp.zeros((h // cell_size, w // cell_size), jnp.float32),
    )


def person_flood_fill(boxes: Array, boxes_valid: Array, adj: Array,
                      centroids: Array, positions: Array, conf: Array,
                      labels: Array, gh: int, gw: int, cs: int = 16,
                      depth_gate: float = 0.3, n_iters: int = 48) -> Array:
    """Mark superpixels inside person detections as dynamic.

    TPU rewrite of the reference's depth-guided flood fill from YOLO boxes
    (detectMotionCombined, motion_detection.cu:780-847): seed at the box
    centre's superpixel (stepped to the nearest-depth neighbour inside the
    box, like the reference's seed refinement), then propagate over the
    adjacency stencil to superpixels whose centroid lies in the box and whose
    depth is within `depth_gate` of the seed.

    boxes: (B, 4) [x0, y0, x1, y1]; centroids (GH, GW, 2); positions
    (GH, GW, 3) camera frame; conf (GH, GW). Returns dynamic (GH, GW) bool.
    """
    B = boxes.shape[0]
    dynamic = jnp.zeros((gh, gw), dtype=bool)

    cx = centroids[..., 0]
    cy = centroids[..., 1]

    for b in range(B):
        box = boxes[b]
        ok = boxes_valid[b]
        in_box = (
            (cx >= box[0]) & (cx < box[2]) & (cy >= box[1]) & (cy < box[3])
        )
        # seed: superpixel at the box centre pixel
        px = jnp.clip(((box[0] + box[2]) * 0.5 / cs).astype(jnp.int32),
                      0, gw - 1)
        py = jnp.clip(((box[1] + box[3]) * 0.5 / cs).astype(jnp.int32),
                      0, gh - 1)
        seed = jnp.zeros((gh, gw), dtype=bool).at[py, px].set(True)
        z_seed = positions[py, px, 2]
        # depth-similar & inside the box. Superpixels with invalid geometry
        # (conf <= 0: motion blur, non-planar cloth) are filled too — the
        # reference's fill only depth-gates superpixels with nonzero
        # confidence (motion_detection.cu:828-834), and people in motion are
        # exactly where generation fails
        eligible = in_box & (
            (jnp.abs(positions[..., 2] - z_seed) < depth_gate)
            | (conf <= 0.0)
        )

        def prop(_, m):
            grown = m
            for k, (dy, dx) in enumerate(_OFFS25):
                if dy == 0 and dx == 0:
                    continue
                grown = grown | (_shift_table(m, dy, dx, fill=False) & adj[..., k])
            return m | (grown & eligible)

        filled = jax.lax.fori_loop(0, n_iters, prop, seed)
        dynamic = dynamic | jnp.where(ok, filled & in_box, False)

    return dynamic
