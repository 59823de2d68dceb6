"""Generate person-box training labels from geometric motion evidence.

Label source for distilling the person detector (models/person_detector.py)
WITHOUT any external pretrained weights (none exist in this environment; the
reference's own tiny-YOLOv4 blob is likewise absent from its repo,
`/root/reference/.MISSING_LARGE_BLOBS`).

Per consecutive frame pair:
  1. ORB match + GMS + 2D-similarity RANSAC (the MOD camera-compensation
     chain, ops/flow.py) -> warp prev gray/depth onto the current frame;
  2. evidence = per-pixel DEPTH residual |warp(prev_depth) - depth| above the
     Kinect noise model (the reference's disabled depth cue,
     motion_detection.cu:566-571), OR residual-flow magnitude > 4 px;
  3. temporal vote: a pixel counts only if evidence appears in >= `vote` of
     the last 3 pairs (kills one-frame warp/occlusion artefacts);
  4. evidence pooled to 16x16 cells (>=40% dynamic pixels), connected cell
     components -> pixel boxes (same format as train_person_detector.py
     --collect).

This is far higher-precision supervision than the flow-cluster masks the
r2 distillation used: a person at 2-3 m against a 4-6 m background produces
metre-scale depth residuals vs centimetre-scale sensor noise, and it needs no
camera pose, so there is no circular dependency on the SLAM pipeline's own
MOD quality.

Usage:
  python tools/make_motion_labels.py \
      --dataset /root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere \
      --out /tmp/motion_labels.npz [--stride 2] [--max-frames 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pair_fn(cfg_vo, H, W):
    import jax
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.ops.depth import bilateral_filter
    from supersurfel_fusion_tpu.ops.features import detect_and_describe
    from supersurfel_fusion_tpu.ops.flow import (
        dense_flow,
        estimate_similarity_ransac,
        se3_depth_residual,
        warp_similarity,
    )
    from supersurfel_fusion_tpu.ops.loop_closure import ransac_rigid_3d
    from supersurfel_fusion_tpu.ops.matching import gms_filter, match_bruteforce

    fx = fy = 535.4  # fr3 intrinsics; labels only, precision uncritical
    cx, cy = 320.1, 247.6

    def kp3d(kp, depth):
        ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
        z = depth[vi, ui]
        ok = (z >= 0.2) & (z < 5.0)
        return jnp.stack(
            [z * (kp.xy[:, 0] - cx) / fx, z * (kp.xy[:, 1] - cy) / fy, z],
            axis=-1,
        ), ok

    @jax.jit
    def pair_evidence(gray0, depth0_u16, gray1, depth1_u16):
        depth0 = bilateral_filter(depth0_u16.astype(jnp.float32) / 5000.0,
                                  0.03, 4.5, 6)
        depth1 = bilateral_filter(depth1_u16.astype(jnp.float32) / 5000.0,
                                  0.03, 4.5, 6)
        kp0 = detect_and_describe(gray0, cfg_vo)
        kp1 = detect_and_describe(gray1, cfg_vo)
        midx, _, mok = match_bruteforce(kp0.desc, kp0.valid, kp1.desc,
                                        kp1.valid)
        mxy = kp1.xy[midx]
        inl = gms_filter(kp0.xy, mxy, mok, float(W), float(H))
        a, b, tx, ty, ok = estimate_similarity_ransac(kp0.xy, mxy, inl)
        gray_est = warp_similarity(gray0, a, b, tx, ty, 0.0)
        flow = dense_flow(gray1, gray_est)
        flow_mag = jnp.linalg.norm(flow, axis=-1)

        # SE3 inverse-warp depth residual (parallax-free, unlike the 2D
        # affine warp which fires on every depth edge)
        p0, ok0 = kp3d(kp0, depth0)
        p1, ok1 = kp3d(kp1, depth1)
        pair_ok = inl & ok0 & ok1[midx]
        R, t, rigid_ok, _ = ransac_rigid_3d(p0, p1[midx], pair_ok,
                                            thresh=0.03)
        resid = se3_depth_residual(depth1, depth0, R, t, fx, fy, cx, cy)

        z = depth1
        z_valid = (z >= 0.2) & (z < 4.0)
        # 12x Kinect noise model (the reference's gate scale) — at 2.5 m
        # this is ~0.11 m; people vs background leave metre-scale residuals
        noise = 12.0 * (0.0012 + 0.0019 * (z - 0.4) ** 2)
        depth_ev = rigid_ok & (resid > jnp.maximum(noise, 0.08))
        # flow evidence is label-poisoning: residual flow fires on parallax
        # at depth edges during fast sweeps (measured: monitor/desk false
        # boxes) — the SE(3) depth residual alone is precise, and frames
        # where the rigid fit fails simply contribute no boxes
        flow_ev = z_valid & (flow_mag > 4.0) & (flow_mag <= 60.0)
        use_flow = bool(int(os.environ.get("LABELS_USE_FLOW", "0")))
        ev = depth_ev | flow_ev if use_flow else depth_ev
        return ev & ok

    return pair_evidence


def boxes_from_cells(dyn: np.ndarray, cs: int, min_cells: int = 5):
    """Connected components of the dynamic-cell mask -> pixel boxes."""
    gh, gw = dyn.shape
    lab = -np.ones((gh, gw), np.int32)
    nlab = 0
    for yy in range(gh):
        for xx in range(gw):
            if dyn[yy, xx] and lab[yy, xx] < 0:
                stack = [(yy, xx)]
                lab[yy, xx] = nlab
                while stack:
                    cy, cx = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1),
                                   (1, 1), (-1, -1), (1, -1), (-1, 1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < gh and 0 <= nx < gw and dyn[ny, nx]
                                and lab[ny, nx] < 0):
                            lab[ny, nx] = nlab
                            stack.append((ny, nx))
                nlab += 1
    boxes = []
    for li in range(nlab):
        ys, xs = np.where(lab == li)
        if len(ys) < min_cells:
            continue
        h_cells = ys.max() - ys.min() + 1
        w_cells = xs.max() - xs.min() + 1
        if h_cells < 2 or w_cells < 2:  # people are blob-shaped
            continue
        boxes.append([xs.min() * cs, ys.min() * cs,
                      (xs.max() + 1) * cs, (ys.max() + 1) * cs])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/"
                    "rgbd_dataset_freiburg3_walking_halfsphere")
    ap.add_argument("--out", default="/tmp/motion_labels.npz")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--vote", type=int, default=2, help="of last 3 pairs")
    ap.add_argument("--cell-frac", type=float, default=0.15)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import VOConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset

    ds = TUMDataset(args.dataset)
    n = len(ds) if not args.max_frames else min(args.max_frames, len(ds))
    idxs = list(range(0, n, args.stride))
    cs = 16

    f0 = ds.load_frame_raw(idxs[0])
    H, W = f0.depth.shape
    pair_fn = build_pair_fn(VOConfig(), H, W)

    grays, depths, all_boxes = [], [], []
    hist: list[np.ndarray] = []   # last evidence maps
    t0 = time.time()
    prev = None
    for j, i in enumerate(idxs):
        f = ds.load_frame_raw(i)
        gray = np.asarray(f.rgb, np.float32).mean(-1)
        if prev is not None:
            ev = np.asarray(pair_fn(
                jnp.asarray(prev[0]), jnp.asarray(prev[1]),
                jnp.asarray(gray), jnp.asarray(f.depth),
            ))
            hist.append(ev)
            if len(hist) > 3:
                hist.pop(0)
            votes = np.sum(np.stack(hist), axis=0)
            conf_ev = votes >= min(args.vote, len(hist))
            # pool to cells
            gh, gw = H // cs, W // cs
            cells = conf_ev[:gh * cs, :gw * cs].reshape(
                gh, cs, gw, cs).mean(axis=(1, 3))
            boxes = boxes_from_cells(cells > args.cell_frac, cs)
        else:
            boxes = np.zeros((0, 4), np.float32)
        grays.append(gray.astype(np.uint8))
        depths.append(np.asarray(f.depth, np.uint16))
        all_boxes.append(boxes)
        prev = (gray, f.depth)
        if j % 50 == 0:
            print(f"frame {i}/{n}  boxes={len(boxes)} "
                  f"({(j + 1) / (time.time() - t0):.1f} fps)", flush=True)

    maxb = max((len(b) for b in all_boxes), default=1) or 1
    B = np.zeros((len(all_boxes), maxb, 4), np.float32)
    C = np.zeros((len(all_boxes),), np.int32)
    for i, b in enumerate(all_boxes):
        B[i, :len(b)] = b
        C[i] = len(b)
    np.savez_compressed(args.out, gray=np.stack(grays),
                        depth=np.stack(depths), boxes=B, counts=C)
    nonzero = int((C > 0).sum())
    print(f"saved {len(all_boxes)} frames ({nonzero} with boxes, "
          f"{int(C.sum())} boxes total) -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
