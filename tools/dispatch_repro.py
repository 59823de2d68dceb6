"""Reproduce / regression-check the in-process dispatch-rate collapse.

Round-4 bench.py sidestepped a real runtime defect: running two different
compiled pipelines back to back in ONE process collapsed the second one's
dispatch rate (measured 146 -> 4.6 fps for the identical fr3 loop). A real
user hits that path whenever run_live reconfigures or two sequences are
processed in-process.

This script runs:  pipeline A (fr1 cfg) for N frames -> optionally tears it
down -> pipeline B (fr3+MOD cfg) for N frames, and reports both steady-state
rates. Use --teardown {none,del,del+gc,clear_caches} to test fixes.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FR1 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"
FR3 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere"


def run(dataset, cam, n, mod=False):
    import dataclasses

    from supersurfel_fusion_tpu.config import MODConfig, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=cam)
    if mod:
        w = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "weights", "person_detector.npz")
        use = os.path.exists(w)
        cfg = dataclasses.replace(cfg, mod=MODConfig(
            enabled=True, use_yolo=use, weights_path=w if use else ""))
    ds = TUMDataset(dataset)
    n = min(n, len(ds))
    slam = SupersurfelFusionTPU(cfg)
    t_first = None
    for i in range(n):
        f = ds.load_frame_raw(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)
        if i == 0:
            out.pose.t.block_until_ready()
            t_first = time.time()
    out.pose.t.block_until_ready()
    fps = (n - 1) / max(time.time() - t_first, 1e-9)
    return slam, fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--teardown", default="del",
                    choices=["none", "del", "del+gc", "clear_caches"])
    args = ap.parse_args()

    from supersurfel_fusion_tpu.config import CameraIntrinsics

    slam_a, fps_a = run(FR1, CameraIntrinsics.tum_fr1(), args.frames)
    print(f"pipeline A (fr1):      {fps_a:6.1f} fps", flush=True)

    if args.teardown != "none":
        del slam_a
        if args.teardown in ("del+gc", "clear_caches"):
            gc.collect()
        if args.teardown == "clear_caches":
            import jax

            jax.clear_caches()

    slam_b, fps_b = run(FR3, CameraIntrinsics.tum_fr3(), args.frames, mod=True)
    print(f"pipeline B (fr3+MOD):  {fps_b:6.1f} fps", flush=True)
    print(f"RESULT teardown={args.teardown} fps_a={fps_a:.1f} "
          f"fps_b={fps_b:.1f}", flush=True)


if __name__ == "__main__":
    main()
