"""Driver benchmark: the FULL TUM sequences through the shipped pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol (round-2 verdict #3: "measure what a user gets"): every frame of
fr1/xyz (790, static) decoded IN the loop through the same IO path the CLI
ships (native prefetching PNG loader, PIL fallback), full-sequence ATE
against ground truth; then — time permitting — the dynamic fr3/
walking_halfsphere with MOD on, reporting both the reference's 126-pose
window ATE and the full-sequence ATE. Matches the reference benchmark
node's every-frame synchronous replay
(`node/supersurfel_fusion_rgbd_benchmark_node.cpp:573-744`).

Baseline: the reference's design target of real-time ~30 FPS per GPU
(BASELINE.md). vs_baseline = our_fps / 30.
"""

from __future__ import annotations

import json
import os
import sys
import time

FR1 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"
FR3 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere"
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "0")) or None
BASELINE_FPS = 30.0
FR3_TIME_GUARD_S = float(os.environ.get("BENCH_FR3_GUARD", "420"))


def run_sequence(dataset, cam, n_frames=None, mod=False):
    import dataclasses

    from supersurfel_fusion_tpu.config import MODConfig, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=cam)
    if mod:
        cfg = dataclasses.replace(cfg, mod=MODConfig(enabled=True))
    ds = TUMDataset(dataset)
    n = len(ds) if n_frames is None else min(n_frames, len(ds))

    # the CLI's shipped IO path: background native PNG decode; PIL fallback
    get = None
    try:
        from supersurfel_fusion_tpu.io.native_loader import PrefetchingLoader

        pairs = [
            (os.path.join(dataset, a.rgb_file),
             os.path.join(dataset, a.depth_file))
            for a in ds.associations[:n]
        ]
        loader = PrefetchingLoader(pairs, cam.width, cam.height)
        get = lambda i: loader.get(i)  # noqa: E731
    except Exception:
        get = lambda i: (  # noqa: E731
            lambda f: (f.rgb, f.depth))(ds.load_frame_raw(i))

    slam = SupersurfelFusionTPU(cfg)
    t0 = time.time()
    t_first = None
    for i in range(n):
        rgb, depth = get(i)
        out = slam.process(rgb, depth, ds.associations[i].rgb_ts)
        if i == 0:
            out.pose.t.block_until_ready()
            t_first = time.time()
    out.pose.t.block_until_ready()
    t_end = time.time()
    fps = (n - 1) / max(t_end - t_first, 1e-9)

    from supersurfel_fusion_tpu.eval.trajectory import ate

    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {a.rgb_ts: a.gt for a in ds.associations[:n] if a.gt is not None}
    full_ate = ate(est, gt).rmse if len(gt) > 2 else float("nan")
    return n, fps, full_ate, est, gt


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    t_start = time.time()

    from supersurfel_fusion_tpu.config import CameraIntrinsics
    from supersurfel_fusion_tpu.eval.trajectory import ate

    n1, fps1, ate1, _, _ = run_sequence(
        FR1, CameraIntrinsics.tum_fr1(), N_FRAMES
    )
    extras = {"frames": n1, "ate_rmse_m": round(ate1, 4),
              "ref_ate_rmse_m": 0.0195}

    # dynamic sequence with MOD, if the time guard allows (compile ~2 min)
    if time.time() - t_start < FR3_TIME_GUARD_S and os.path.isdir(FR3):
        try:
            n3, fps3, ate3, est3, gt3 = run_sequence(
                FR3, CameraIntrinsics.tum_fr3(), N_FRAMES, mod=True
            )
            extras.update(
                fr3_frames=n3, fr3_fps=round(fps3, 2),
                fr3_ate_rmse_m=round(ate3, 4),
            )
            # the reference's shipped fr3 trajectory covers only the first
            # 126 poses; report the same window for the direct comparison
            w_ts = sorted(est3)[:126]
            est_w = {t: est3[t] for t in w_ts}
            gt_w = {t: p for t, p in gt3.items() if t <= w_ts[-1] + 0.02}
            if len(gt_w) > 2:
                extras["fr3_ate_126_m"] = round(ate(est_w, gt_w).rmse, 4)
                extras["fr3_ref_ate_126_m"] = 0.0541
        except Exception as e:  # fr3 must never cost the fr1 result
            extras["fr3_error"] = str(e)[:120]

    print(
        json.dumps(
            {
                "metric": "fps_tum_fr1_xyz",
                "value": round(fps1, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps1 / BASELINE_FPS, 3),
                **extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
