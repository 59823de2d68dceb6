"""Driver benchmark: the FULL TUM sequences through the shipped pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol (round-2 verdict #3: "measure what a user gets"): every frame of
fr1/xyz (790, static) decoded IN the loop through the same IO path the CLI
ships (native prefetching PNG loader, PIL fallback), full-sequence ATE
against ground truth; then the dynamic fr3/walking_halfsphere with the
combined MOD path (detector weights committed under weights/), reporting
both the reference's 126-pose window ATE and the full-sequence ATE. Matches
the reference benchmark node's every-frame synchronous replay
(`node/supersurfel_fusion_rgbd_benchmark_node.cpp:573-744`).

Each sequence runs in its OWN subprocess, exactly like the shipped CLI runs
one sequence per invocation. (A round-4 defect collapsed the second
in-process pipeline's dispatch rate 146 -> 4.6 fps; the on-device
trajectory ring removed it — round 5 measures 70.4/70.0 fps back to back
in one process, tools/dispatch_repro.py + tests/test_dispatch.py — so the
subprocess split is now purely protocol isolation, not a workaround.)

Baseline: the reference's design target of real-time ~30 FPS per GPU
(BASELINE.md). vs_baseline = our_fps / 30.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

FR1 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"
FR3 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere"
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "0")) or None
BASELINE_FPS = 30.0
# 900s was too tight when the persistent compile cache is cold: a cold
# remote compile of the full pipeline measured 6-10 min this session
# (caches are wiped between rounds), leaving no margin for the run itself.
FR3_TIME_GUARD_S = float(os.environ.get("BENCH_FR3_GUARD", "1800"))
_WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "person_detector.npz")


def run_sequence(dataset, cam, n_frames=None, mod=False, yolo=False):
    import dataclasses

    from supersurfel_fusion_tpu.config import MODConfig, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=cam)
    if mod:
        use_yolo = yolo and os.path.exists(_WEIGHTS)
        cfg = dataclasses.replace(cfg, mod=MODConfig(
            enabled=True, use_yolo=use_yolo,
            weights_path=_WEIGHTS if use_yolo else ""))
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

    if os.environ.get("BENCH_DIAG"):
        # throughput attribution: decode | +transfer | device-step-only
        import jax
        import jax.numpy as jnp
        nd = min(n, 150)
        td0 = time.time()
        for i in range(nd):
            get(i)
        td1 = time.time()
        for i in range(nd):
            r, d = get(i)
            out = (jnp.asarray(r), jnp.asarray(d))
        jax.block_until_ready(out)
        td2 = time.time()
        print(json.dumps({
            "diag": "io", "decode_fps": round(nd / (td1 - td0), 1),
            "decode_transfer_fps": round(nd / (td2 - td1), 1)}),
            file=sys.stderr, flush=True)

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

    if os.environ.get("BENCH_DIAG"):
        # device-step-only throughput: re-feed one already-decoded frame
        # (transfers still per call, matching the real loop's async overlap)
        import jax
        rgb0, depth0 = get(0)
        ns = 100
        o = slam.process(rgb0, depth0)
        o.pose.t.block_until_ready()
        ts0 = time.time()
        for _ in range(ns):
            o = slam.process(rgb0, depth0)
        o.pose.t.block_until_ready()
        print(json.dumps({
            "diag": "step",
            "step_fps": round(ns / (time.time() - ts0), 1)}),
            file=sys.stderr, flush=True)

    from supersurfel_fusion_tpu.eval.trajectory import ate

    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {a.rgb_ts: a.gt for a in ds.associations[:n] if a.gt is not None}
    full_ate = ate(est, gt).rmse if len(gt) > 2 else float("nan")
    return n, fps, full_ate, est, gt


def seq_main(which: str) -> int:
    """Child-process entry: run one sequence, print one JSON line."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from supersurfel_fusion_tpu.config import CameraIntrinsics
    from supersurfel_fusion_tpu.eval.trajectory import ate

    if which == "fr1":
        n, fps, full_ate, _, _ = run_sequence(
            FR1, CameraIntrinsics.tum_fr1(), N_FRAMES
        )
        print(json.dumps({"frames": n, "fps": round(fps, 2),
                          "ate_rmse_m": round(full_ate, 4)}))
        return 0

    # fr3: the flagship dynamic configuration — combined MOD path with the
    # committed person-detector weights, like the reference benchmark launch
    # (`launch/supersurfel_fusion_rgbd_benchmark.launch:27` use_yolo=true)
    n, fps, full_ate, est, gt = run_sequence(
        FR3, CameraIntrinsics.tum_fr3(), N_FRAMES, mod=True, yolo=True
    )
    res = {"frames": n, "fps": round(fps, 2),
           "ate_rmse_m": round(full_ate, 4),
           "yolo": os.path.exists(_WEIGHTS)}
    # the reference's shipped fr3 trajectory covers only the first 126
    # poses; report the same window for the direct comparison
    w_ts = sorted(est)[:126]
    est_w = {t: est[t] for t in w_ts}
    gt_w = {t: p for t, p in gt.items() if t <= w_ts[-1] + 0.02}
    if len(gt_w) > 2:
        res["ate_126_m"] = round(ate(est_w, gt_w).rmse, 4)
    print(json.dumps(res))
    return 0


def _run_child(which: str, timeout_s: float):
    cmd = [sys.executable, os.path.abspath(__file__), "--seq", which]
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in p.stdout.strip().splitlines()
                if l.startswith("{")]
        if p.returncode != 0 or not line:
            return {"error": (p.stderr or p.stdout)[-300:]}
        return json.loads(line[-1])
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s}s"}


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--seq":
        return seq_main(sys.argv[2])

    t_start = time.time()
    r1 = _run_child("fr1", FR3_TIME_GUARD_S)
    out = {
        "metric": "fps_tum_fr1_xyz",
        "value": r1.get("fps", 0.0),
        "unit": "frames/s",
        "vs_baseline": round(r1.get("fps", 0.0) / BASELINE_FPS, 3),
        "frames": r1.get("frames"),
        "ate_rmse_m": r1.get("ate_rmse_m"),
        "ref_ate_rmse_m": 0.0195,
    }
    if "error" in r1:
        out["fr1_error"] = r1["error"]

    if os.path.isdir(FR3):
        left = FR3_TIME_GUARD_S - (time.time() - t_start)
        r3 = _run_child("fr3", max(left, 300.0))
        if "error" in r3:
            out["fr3_error"] = r3["error"]
        else:
            out.update(
                fr3_frames=r3.get("frames"), fr3_fps=r3.get("fps"),
                fr3_ate_rmse_m=r3.get("ate_rmse_m"),
                fr3_yolo=r3.get("yolo"),
            )
            if "ate_126_m" in r3:
                out["fr3_ate_126_m"] = r3["ate_126_m"]
                out["fr3_ref_ate_126_m"] = 0.0541
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
