"""Driver benchmark: frames/s of the full SLAM pipeline on TUM fr1/xyz.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: the reference's design target of real-time ~30 FPS per GPU
(BASELINE.md; README claim). vs_baseline = our_fps / 30.
"""

from __future__ import annotations

import json
import os
import sys
import time

DATASET = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
BASELINE_FPS = 30.0


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.eval.trajectory import ate
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(DATASET)
    n = min(N_FRAMES, len(ds))

    # pre-decode frames so PNG IO doesn't pollute the device measurement;
    # raw uint8/uint16 keeps the per-frame host->device upload at 1.5 MB
    frames = [ds.load_frame_raw(i) for i in range(n)]

    slam = SupersurfelFusionTPU(cfg)
    # warmup/compile on frame 0
    out = slam.process(frames[0].rgb, frames[0].depth, frames[0].timestamp)
    out.pose.t.block_until_ready()

    t0 = time.time()
    for f in frames[1:]:
        out = slam.process(f.rgb, f.depth, f.timestamp)
    out.pose.t.block_until_ready()
    dt = time.time() - t0
    fps = (n - 1) / dt

    extras = {}
    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {a.rgb_ts: a.gt for a in ds.associations[:n] if a.gt is not None}
    if len(gt) > 2:
        try:
            extras["ate_rmse_m"] = round(ate(est, gt).rmse, 4)
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "fps_tum_fr1_xyz",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "frames": n,
                **extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
