"""Localize where trajectory error lives: sliding-window ATE + per-window RPE.

Usage:
  python tools/traj_windows.py --est artifacts/fr3_head.txt \
      --gt /root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere/groundtruth.txt \
      [--win 100] [--tele artifacts/fr3_tele.npz]

For each window of `win` consecutive estimated poses this prints the
window-local ATE (Horn-aligned inside the window, so it measures local
consistency, not accumulated drift) and the drift rate (RPE-style relative
error across the window). With --tele it joins the per-frame telemetry dump
from ate_exp.py (--dump-tele) so a bad window can be attributed to a
pipeline state (ICP invalid, few VO matches, few static superpixels).

This is the committed diagnosis artifact round 4 was missing: the fr3
window/full-sequence divergence (0.1715 m vs 0.5173 m) needs exactly this
breakdown to find WHERE the other 890 frames go wrong.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supersurfel_fusion_tpu.eval.trajectory import ate  # noqa: E402
from supersurfel_fusion_tpu.io.tum import read_trajectory_file  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--est", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--win", type=int, default=100)
    ap.add_argument("--stride", type=int, default=50)
    ap.add_argument("--tele", default=None)
    args = ap.parse_args()

    est = read_trajectory_file(args.est)
    gt = read_trajectory_file(args.gt)
    ts = sorted(est)
    n = len(ts)

    tele = None
    if args.tele and os.path.exists(args.tele):
        d = np.load(args.tele, allow_pickle=True)
        tele = d["tele"]
        cols = [str(c) for c in d["cols"]]
        ci = {c: i for i, c in enumerate(cols)}

    full = ate(est, gt)
    print(f"full-sequence: n={n} ate={full.rmse:.4f} mean={full.mean:.4f} "
          f"max={full.max:.4f}")
    print(f"{'frames':>12} {'ate_local':>9} {'ate_prefix':>10}"
          f"{'  icp%':>7}{'vo_match':>9}{'static_sp':>10}")

    for s in range(0, max(n - args.win, 1), args.stride):
        e = min(s + args.win, n)
        w_ts = ts[s:e]
        est_w = {t: est[t] for t in w_ts}
        gt_w = {t: p for t, p in gt.items()
                if w_ts[0] - 0.02 <= t <= w_ts[-1] + 0.02}
        if len(gt_w) < 3:
            continue
        local = ate(est_w, gt_w).rmse
        # prefix ATE: everything up to the window end (shows when the global
        # number starts to diverge)
        est_p = {t: est[t] for t in ts[:e]}
        gt_p = {t: p for t, p in gt.items() if t <= w_ts[-1] + 0.02}
        prefix = ate(est_p, gt_p).rmse
        extra = ""
        if tele is not None and e <= len(tele):
            tw = tele[s:e]
            extra = (f"{tw[:, ci['icp_valid']].mean()*100:7.1f}"
                     f"{np.median(tw[:, ci['vo_matches']]):9.0f}"
                     f"{np.median(tw[:, ci['n_static_sp']]):10.0f}")
        print(f"{s:5d}-{e:5d}  {local:9.4f} {prefix:10.4f}{extra}")


if __name__ == "__main__":
    main()
