"""Learn a decorrelated BRIEF sampling pattern (the ORB-paper construction).

The original random-Gaussian 256 pairs produce heavily correlated bits
(nearby pixels co-vary), so the effective descriptor entropy is far below
256 bits — measured on fr3 frame pairs: median Hamming distance ~30/256 for
WRONG matches and 2-7x fewer GMS-consistent matches than OpenCV's ORB with
its learned pattern on the identical frames. This tool reproduces the ORB
recipe (Rublee et al., ICCV 2011, sec. 4.3) on OUR extractor's patches:

  1. collect oriented, blurred 41x41 patches around FAST corners from a
     TRAINING sequence (fr1/xyz by default — disjoint from the fr3 eval),
  2. enumerate candidate point pairs on a grid, compute each candidate's
     bit over all patches,
  3. greedily keep candidates whose bit mean is closest to 0.5 and whose
     correlation with every already-kept candidate is below a threshold,
     relaxing the threshold until 256 pairs are kept.

Writes (256, 2, 2) int32 offsets to weights/brief_pattern.npz, which
ops/features.py picks up at import time.

  python tools/learn_brief_pattern.py --frames 120 --out weights/brief_pattern.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/"
                    "rgbd_dataset_freiburg1_xyz")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--n-candidates", type=int, default=24000)
    ap.add_argument("--out", default="weights/brief_pattern.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops import features as F
    from supersurfel_fusion_tpu.utils.color import rgb_to_gray

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(args.dataset)

    @jax.jit
    def frame_patches(rgb):
        """Detect keypoints; return level-0 blurred patches + angles."""
        gray = rgb_to_gray(rgb.astype(jnp.float32))
        kp = F.detect_and_describe(gray, cfg.vo)
        blurred = F.gaussian_blur(gray)
        ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, 639)
        vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, 479)
        patches = F._extract_patches(blurred, ui, vi)          # (K, 41, 41)
        return patches, kp.angle, kp.valid & (kp.score > 0)

    P = F._PATCH
    r = F._PATCH_R
    yy, xx = np.mgrid[0:P, 0:P]
    xc, yc = (xx - r).ravel(), (yy - r).ravel()

    def rotate_host(patches, angles):
        """Rotate each patch by -angle (vectorized numpy bilinear): the
        pattern is learned in the canonical frame, runtime samples at
        +angle."""
        ca = np.cos(angles)[:, None]
        sa = np.sin(angles)[:, None]
        xs = ca * xc[None] + sa * yc[None] + r       # (K, P*P)
        ys = -sa * xc[None] + ca * yc[None] + r
        x0 = np.clip(np.floor(xs).astype(np.int32), 0, P - 2)
        y0 = np.clip(np.floor(ys).astype(np.int32), 0, P - 2)
        fx = np.clip(xs, 0, P - 1) - x0
        fy = np.clip(ys, 0, P - 1) - y0
        flat = patches.reshape(len(patches), -1)
        ridx = np.arange(len(patches))[:, None]
        i00 = flat[ridx, y0 * P + x0]
        i01 = flat[ridx, y0 * P + x0 + 1]
        i10 = flat[ridx, (y0 + 1) * P + x0]
        i11 = flat[ridx, (y0 + 1) * P + x0 + 1]
        out = (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy)
               + i10 * (1 - fx) * fy + i11 * fx * fy)
        return out.reshape(-1, P, P)

    patches_all = []
    for i in range(0, args.frames * args.stride, args.stride):
        if i >= len(ds):
            break
        f = ds.load_frame_raw(i)
        pt, ang, ok = frame_patches(jnp.asarray(f.rgb))
        okn = np.asarray(ok)
        rot = rotate_host(np.asarray(pt)[okn].astype(np.float32),
                          np.asarray(ang)[okn])
        patches_all.append(rot.astype(np.float32))
    patches = np.concatenate(patches_all)          # (N, 41, 41)
    N = len(patches)
    print(f"{N} patches collected", flush=True)

    # candidate pairs: grid points in [-13, 13]^2 (descriptor radius used at
    # runtime), seeded subsample
    rng = np.random.default_rng(7)
    coords = np.array([(x, y) for x in range(-13, 14) for y in range(-13, 14)])
    n_pts = len(coords)
    cand = rng.integers(0, n_pts, size=(args.n_candidates, 2))
    cand = cand[cand[:, 0] != cand[:, 1]]
    p0 = coords[cand[:, 0]]                        # (C, 2) x, y
    p1 = coords[cand[:, 1]]

    # bits over all patches: (N, C) boolean, computed in chunks on device
    P = 41
    r = 20
    i0 = (p0[:, 1] + r) * P + (p0[:, 0] + r)
    i1 = (p1[:, 1] + r) * P + (p1[:, 0] + r)
    flat = patches.reshape(N, -1)
    bits = np.empty((N, len(cand)), np.bool_)
    step = 4000
    for s in range(0, len(cand), step):
        bits[:, s:s + step] = flat[:, i0[s:s + step]] < flat[:, i1[s:s + step]]
    print("bits computed", flush=True)

    # candidate-major layout: contiguous row access per candidate; selected
    # columns kept as pre-NORMALIZED rows so each correlation check is one
    # contiguous (k, N) @ (N,) matvec
    bT = np.ascontiguousarray(bits.T.astype(np.float32))   # (C, N)
    del bits
    mean = bT.mean(axis=1)
    order = np.argsort(np.abs(mean - 0.5))
    sd = bT.std(axis=1) + 1e-9

    S = np.empty((256, N), np.float32)      # normalized selected rows
    selected = []
    sel_set = set()
    for corr_t in (0.2, 0.25, 0.3, 0.4, 0.6, 0.9):
        for ci in order:
            if len(selected) >= 256:
                break
            if mean[ci] < 0.03 or mean[ci] > 0.97 or ci in sel_set:
                continue
            z = (bT[ci] - mean[ci]) / (sd[ci] * np.sqrt(N))
            k = len(selected)
            if k and np.max(np.abs(S[:k] @ z)) > corr_t:
                continue
            S[k] = z
            selected.append(int(ci))
            sel_set.add(int(ci))
        print(f"corr<{corr_t}: {len(selected)} kept", flush=True)
        if len(selected) >= 256:
            break
    assert len(selected) >= 256, "not enough decorrelated candidates"
    sel = np.asarray(selected[:256])

    pattern = np.stack([p0[sel], p1[sel]], axis=1).astype(np.int32)  # (256,2,2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, pattern=pattern,
             train_dataset=os.path.basename(args.dataset.rstrip("/")),
             n_patches=N)
    print(f"saved {args.out}; bit-mean spread "
          f"[{mean[sel].min():.3f}, {mean[sel].max():.3f}]", flush=True)


if __name__ == "__main__":
    main()
