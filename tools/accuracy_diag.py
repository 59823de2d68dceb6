"""Accuracy diagnostics: localize where trajectory drift enters.

Compares an estimated TUM trajectory (ours) against ground truth AND against
the reference's own shipped `estimated.txt`, reporting:
  - ATE summary for both
  - per-frame RPE (delta=1 and delta=30) time series statistics
  - the worst windows (where our drift concentrates), so the offending
    frames can be inspected (icp_valid, vo state, scene content)

Usage:
  python tools/accuracy_diag.py --est /tmp/est_full.txt \
      --dataset /root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supersurfel_fusion_tpu.eval.trajectory import (  # noqa: E402
    associate_timestamps,
    ate,
    horn_align,
    quat_to_mat_np,
)


def load_tum(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split()
            out[float(v[0])] = np.array([float(x) for x in v[1:8]])
    return out


def pose44(p):
    T = np.eye(4)
    T[:3, :3] = quat_to_mat_np(p[3:7])
    T[:3, 3] = p[:3]
    return T


def per_frame_rpe(est: dict, gt: dict, delta: int = 1):
    matches = associate_timestamps(list(est), list(gt))
    Te = [pose44(est[a]) for a, _ in matches]
    Tg = [pose44(gt[b]) for _, b in matches]
    ts = [a for a, _ in matches]
    terr, rerr = [], []
    for i in range(len(matches) - delta):
        de = np.linalg.inv(Te[i]) @ Te[i + delta]
        dg = np.linalg.inv(Tg[i]) @ Tg[i + delta]
        E = np.linalg.inv(dg) @ de
        terr.append(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        rerr.append(np.degrees(np.arccos(c)))
    return np.array(ts[: len(terr)]), np.array(terr), np.array(rerr)


def aligned_error_series(est: dict, gt: dict):
    matches = associate_timestamps(list(est), list(gt))
    e = np.stack([est[a][:3] for a, _ in matches], axis=1)
    g = np.stack([gt[b][:3] for _, b in matches], axis=1)
    R, t = horn_align(e, g)
    err = np.linalg.norm(R @ e + t - g, axis=0)
    return np.array([a for a, _ in matches]), err


def summarize(name: str, est: dict, gt: dict):
    r = ate(est, gt)
    ts1, te1, re1 = per_frame_rpe(est, gt, 1)
    ts30, te30, re30 = per_frame_rpe(est, gt, 30)
    print(f"== {name}: ATE rmse={r.rmse:.4f} mean={r.mean:.4f} "
          f"max={r.max:.4f} n={r.n_pairs}")
    print(f"   RPE d=1:  trans rmse={np.sqrt(np.mean(te1**2)):.5f} m  "
          f"p95={np.percentile(te1, 95):.5f}  "
          f"rot rmse={np.sqrt(np.mean(re1**2)):.4f} deg")
    print(f"   RPE d=30: trans rmse={np.sqrt(np.mean(te30**2)):.5f} m  "
          f"p95={np.percentile(te30, 95):.5f}  "
          f"rot rmse={np.sqrt(np.mean(re30**2)):.4f} deg")
    return ts1, te1, re1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--est", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--topk", type=int, default=15)
    args = ap.parse_args()

    gt = load_tum(os.path.join(args.dataset, "groundtruth.txt"))
    ours = load_tum(args.est)
    ts1, te1, re1 = summarize("ours", ours, gt)

    ref_path = os.path.join(args.dataset, "estimated.txt")
    if os.path.exists(ref_path):
        ref = load_tum(ref_path)
        summarize("reference", ref, gt)

    # worst 1-frame relative errors: where the tracking slips
    t0 = min(ours)
    order = np.argsort(te1)[::-1][: args.topk]
    print(f"\nworst d=1 RPE frames (ours), t0={t0:.2f}:")
    for i in sorted(order):
        print(f"  t=+{ts1[i]-t0:7.2f}s  trans={te1[i]*1000:7.2f} mm  "
              f"rot={re1[i]:6.3f} deg")

    # ATE error over time (drift shape)
    ta, ea = aligned_error_series(ours, gt)
    n = len(ea)
    print("\naligned ATE error by decile (ours):")
    for d in range(10):
        seg = ea[d * n // 10: (d + 1) * n // 10]
        print(f"  {d*10:3d}-{d*10+10:3d}%: mean={seg.mean()*1000:6.1f} mm "
              f"max={seg.max()*1000:6.1f} mm")


if __name__ == "__main__":
    main()
