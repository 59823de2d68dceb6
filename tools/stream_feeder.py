"""Replay a TUM sequence into a watch directory as a live stream.

Producer half of the live-node demo (the "camera driver"): copies rgb/depth
PNGs into `target/rgb` + `target/depth` at a configurable rate, with
atomic-rename writes so the consumer (apps/run_live.py --watch) never sees a
partial file.

  python tools/stream_feeder.py --dataset .../rgbd_dataset_freiburg1_xyz \
      --target /tmp/live --fps 30 --max-frames 200
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supersurfel_fusion_tpu.io.tum import TUMDataset  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    rgb_dir = os.path.join(args.target, "rgb")
    depth_dir = os.path.join(args.target, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    ds = TUMDataset(args.dataset)
    n = len(ds) if not args.max_frames else min(args.max_frames, len(ds))
    dt = 1.0 / max(args.fps, 1e-6)

    def emit(src: str, dst_dir: str, stamp: float) -> None:
        dst = os.path.join(dst_dir, f"{stamp:.6f}.png")
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)  # atomic: consumer never sees partial data

    t0 = time.time()
    for i in range(n):
        a = ds.associations[i]
        emit(os.path.join(ds.root, a.rgb_file), rgb_dir, a.rgb_ts)
        emit(os.path.join(ds.root, a.depth_file), depth_dir, a.depth_ts)
        target_t = t0 + (i + 1) * dt
        lag = target_t - time.time()
        if lag > 0:
            time.sleep(lag)
    print(f"fed {n} frames at <= {args.fps} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
