"""Per-frame timing + optional jax.profiler trace of the full pipeline.

Usage:
    python tools/profile_pipeline.py [--frames 120] [--trace-dir /tmp/trace]
        [--per-frame] [--stage]

--per-frame: block after every frame, print dt per frame (reveals whether
             time grows with frame index / model fill).
--stage:     time individual pipeline stages by running them standalone.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--trace-dir", type=str, default=None)
    ap.add_argument("--per-frame", action="store_true")
    ap.add_argument("--dataset", type=str,
                    default="/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz")
    args = ap.parse_args()

    import jax

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(args.dataset)
    n = min(args.frames, len(ds))
    frames = [ds.load_frame_raw(i) for i in range(n)]

    slam = SupersurfelFusionTPU(cfg)
    t0 = time.time()
    out = slam.process(frames[0].rgb, frames[0].depth, frames[0].timestamp)
    out.pose.t.block_until_ready()
    print(f"compile+first frame: {time.time()-t0:.1f}s", flush=True)

    if args.per_frame:
        times = []
        for i, f in enumerate(frames[1:], 1):
            t0 = time.time()
            out = slam.process(f.rgb, f.depth, f.timestamp)
            out.pose.t.block_until_ready()
            dt = time.time() - t0
            times.append(dt)
            if i % 10 == 0:
                recent = times[-10:]
                print(f"frame {i:4d}: last10 mean {1000*sum(recent)/len(recent):7.2f} ms "
                      f"({len(recent)/sum(recent):5.1f} fps)  "
                      f"nb_surf={int(out.nb_supersurfels)} nb_vis={int(out.nb_visible)}",
                      flush=True)
        import numpy as np
        times = np.array(times)
        print(f"overall: mean {1000*times.mean():.2f} ms  ({1.0/times.mean():.2f} fps)")
        print(f"first 30: {1000*times[:30].mean():.2f} ms   last 30: {1000*times[-30:].mean():.2f} ms")
    else:
        if args.trace_dir:
            # warm more frames first so everything is compiled before tracing
            for f in frames[1:10]:
                out = slam.process(f.rgb, f.depth, f.timestamp)
            out.pose.t.block_until_ready()
            with jax.profiler.trace(args.trace_dir):
                for f in frames[10:min(30, n)]:
                    out = slam.process(f.rgb, f.depth, f.timestamp)
                out.pose.t.block_until_ready()
            print(f"trace written to {args.trace_dir}")
            rest = frames[30:]
        else:
            rest = frames[1:]
        t0 = time.time()
        for f in rest:
            out = slam.process(f.rgb, f.depth, f.timestamp)
        out.pose.t.block_until_ready()
        dt = time.time() - t0
        print(f"{len(rest)} frames in {dt:.2f}s = {len(rest)/dt:.2f} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
