"""Run a full-sequence ATE experiment with config overrides.

Usage: python tools/ate_exp.py --frames 790 [--cov-thresh 0.1] [--tag x]
Prints one line: tag, fps, icp_valid%, ATE.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/"
                    "rgbd_dataset_freiburg1_xyz")
    ap.add_argument("--frames", type=int, default=790)
    ap.add_argument("--cov-thresh", type=float, default=None)
    ap.add_argument("--max-dist", type=float, default=None)
    ap.add_argument("--max-color", type=float, default=None)
    ap.add_argument("--min-ndot", type=float, default=None)
    ap.add_argument("--icp-iters", type=int, default=None)
    ap.add_argument("--min-inliers", type=float, default=None)
    ap.add_argument("--visible-cap", type=int, default=None)
    ap.add_argument("--rel-break", type=float, default=None,
                    help="ICP rel_error_break (1.1 = never break early)")
    ap.add_argument("--damping", type=float, default=None,
                    help="ICP solve_damping (Tikhonov anchor to VO pose)")
    ap.add_argument("--cell", type=int, default=None,
                    help="VO detection NMS cell (px): 32=r3 parity, 16=dense")
    ap.add_argument("--no-harris", action="store_true",
                    help="rank keypoints by FAST score (round-3 behaviour)")
    ap.add_argument("--freeze-loss", action="store_true",
                    help="skip model update on ICP-invalid frames")
    ap.add_argument("--insert-gate", action="store_true",
                    help="skip only INSERTION on ICP-invalid frames "
                         "(single-device path)")
    ap.add_argument("--heat", type=float, default=None,
                    help="enable MOD temporal heat with this decay")
    ap.add_argument("--no-resid-direct", action="store_true",
                    help="disable the direct depth-residual MOD marking")
    ap.add_argument("--depth-cue", type=float, default=None,
                    help="override BOTH MOD depth-cue scales (0 = off)")
    ap.add_argument("--mod", action="store_true", help="enable simple MOD")
    ap.add_argument("--yolo", action="store_true",
                    help="combined MOD (needs weights/person_detector.npz)")
    ap.add_argument("--weights", default=None,
                    help="override the person-detector .npz path")
    ap.add_argument("--cam", default="auto", choices=["auto", "fr1", "fr2", "fr3"])
    ap.add_argument("--window", type=int, default=0,
                    help="also report ATE over the first N poses")
    ap.add_argument("--delta-t", type=int, default=None)
    ap.add_argument("--conf-scale", type=float, default=None)
    ap.add_argument("--ref-tps", action="store_true",
                    help="reference-cadence XLA TPS (no pallas, merge every "
                         "phase)")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-vo", action="store_true")
    ap.add_argument("--no-icp", action="store_true")
    ap.add_argument("--tag", default="exp")
    ap.add_argument("--save", default=None, help="save trajectory here")
    ap.add_argument("--dump-tele", default=None,
                    help="save per-frame telemetry (npz) here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.eval.trajectory import ate
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cam_key = args.cam
    if cam_key == "auto":
        cam_key = "fr1"
        for k in ("freiburg1", "freiburg2", "freiburg3"):
            if k in args.dataset:
                cam_key = "fr" + k[-1]
    cam = {"fr1": CameraIntrinsics.tum_fr1, "fr2": CameraIntrinsics.tum_fr2,
           "fr3": CameraIntrinsics.tum_fr3}[cam_key]()
    cfg = PipelineConfig(cam=cam)
    icp = cfg.icp
    if args.cov_thresh is not None:
        icp = dataclasses.replace(icp, cov_thresh=args.cov_thresh)
    if args.max_dist is not None:
        icp = dataclasses.replace(icp, max_dist=args.max_dist)
    if args.max_color is not None:
        icp = dataclasses.replace(icp, max_color_dist=args.max_color)
    if args.min_ndot is not None:
        icp = dataclasses.replace(icp, min_normal_dot=args.min_ndot)
    if args.icp_iters is not None:
        icp = dataclasses.replace(icp, nb_iters=args.icp_iters)
    if args.min_inliers is not None:
        icp = dataclasses.replace(icp, min_inliers=args.min_inliers)
    if args.rel_break is not None:
        icp = dataclasses.replace(icp, rel_error_break=args.rel_break)
    if args.damping is not None:
        icp = dataclasses.replace(icp, solve_damping=args.damping)
    cfg = dataclasses.replace(cfg, icp=icp)
    if args.cell is not None:
        cfg = dataclasses.replace(
            cfg, vo=dataclasses.replace(cfg.vo, detect_cell=args.cell))
    if args.no_harris:
        cfg = dataclasses.replace(
            cfg, vo=dataclasses.replace(cfg.vo, harris_rank=False))
    if args.freeze_loss:
        cfg = dataclasses.replace(cfg, fusion=dataclasses.replace(
            cfg.fusion, freeze_on_tracking_loss=True))
    if args.insert_gate:
        cfg = dataclasses.replace(cfg, fusion=dataclasses.replace(
            cfg.fusion, insert_requires_icp=True))
    if args.mod or args.yolo:
        from supersurfel_fusion_tpu.config import MODConfig

        wpath = args.weights or os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "weights", "person_detector.npz")
        use_yolo = args.yolo and os.path.exists(wpath)
        cfg = dataclasses.replace(cfg, mod=MODConfig(
            enabled=True, use_yolo=use_yolo,
            weights_path=wpath if use_yolo else ""))
        if args.yolo and not use_yolo:
            print(f"WARNING: --yolo but no weights at {wpath}", flush=True)
        if args.no_resid_direct:
            cfg = dataclasses.replace(
                cfg, mod=dataclasses.replace(cfg.mod, resid_direct=False))
        if args.heat is not None:
            cfg = dataclasses.replace(
                cfg, mod=dataclasses.replace(
                    cfg.mod, temporal_heat=True, heat_decay=args.heat))
        if args.depth_cue is not None:
            cfg = dataclasses.replace(
                cfg, mod=dataclasses.replace(
                    cfg.mod, depth_cue_scale_simple=args.depth_cue,
                    depth_cue_scale_combined=args.depth_cue))
    if args.delta_t is not None:
        cfg = dataclasses.replace(
            cfg, fusion=dataclasses.replace(cfg.fusion, delta_t=args.delta_t))
    if args.conf_scale is not None:
        cfg = dataclasses.replace(
            cfg, fusion=dataclasses.replace(
                cfg.fusion, conf_thresh_scale=args.conf_scale))
    if args.ref_tps:
        cfg = dataclasses.replace(
            cfg, tps=dataclasses.replace(
                cfg.tps, use_pallas=False, merge_every_phase=True))
    if args.no_pallas:
        cfg = dataclasses.replace(
            cfg, tps=dataclasses.replace(cfg.tps, use_pallas=False))
    if args.no_vo:
        cfg = dataclasses.replace(cfg, enable_sparse_vo=False)
    if args.no_icp:
        cfg = dataclasses.replace(cfg, enable_icp=False)
    if args.visible_cap is not None:
        cfg = dataclasses.replace(
            cfg, fusion=dataclasses.replace(
                cfg.fusion, visible_cap=args.visible_cap))

    ds = TUMDataset(args.dataset)
    n = min(args.frames, len(ds))
    slam = SupersurfelFusionTPU(cfg)
    # telemetry: coalesce per-frame rows into one device buffer per 128
    # frames — keeping one live buffer PER FRAME makes dispatch cost grow
    # with the live-buffer count on this backend (measured in pipeline.py:
    # 36.7 -> 9.6 fps over 300 frames), and mid-run downloads are worse
    tele, tele_blocks = [], []
    t0 = time.time()
    t_first = None
    for i in range(n):
        f = ds.load_frame_raw(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)
        if i == 0:
            out.pose.t.block_until_ready()
            t_first = time.time()
        tele.append(jnp.stack([
            out.icp_valid.astype(jnp.int32), out.nb_visible,
            out.nb_supersurfels, out.n_fused, out.n_inserted, out.n_removed,
            out.icp_code, out.vo_matches, out.vo_valid.astype(jnp.int32),
            out.icp_inliers.astype(jnp.int32),
            jnp.sum(out.static_sp.astype(jnp.int32)),
        ]))
        if len(tele) >= 128:
            tele_blocks.append(jnp.stack(tele))
            tele = []
        if i % 100 == 0:
            print(f"frame {i}/{n} ({time.time()-t0:.0f}s)", flush=True)
    out.pose.t.block_until_ready()
    dt = time.time() - t0
    # steady-state frame rate: clock starts after frame 0 (compile), the
    # same protocol as bench.py — but note ate_exp ALSO stacks telemetry
    # per frame, so this is a floor on the bench number, not equal to it
    fps = (n - 1) / max(time.time() - t_first, 1e-9)

    if tele:
        tele_blocks.append(jnp.stack(tele))
    tv = np.concatenate(jax.device_get(tele_blocks))
    iv = tv[:, 0]
    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {a.rgb_ts: a.gt for a in ds.associations[:n] if a.gt is not None}
    r = ate(est, gt)
    wtxt = ""
    if args.window and len(est) > args.window:
        w_ts = sorted(est)[: args.window]
        est_w = {t: est[t] for t in w_ts}
        gt_w = {t: p for t, p in gt.items() if t <= w_ts[-1] + 0.02}
        if len(gt_w) > 2:
            wtxt = f" ate_w{args.window}={ate(est_w, gt_w).rmse:.4f}"
    print(f"RESULT tag={args.tag} frames={n} wall={dt:.0f}s fps={fps:.1f} "
          f"icp_valid={iv.mean()*100:.1f}% ate={r.rmse:.4f} "
          f"mean={r.mean:.4f} max={r.max:.4f}{wtxt}", flush=True)
    print(f"  nb_visible max={tv[:, 1].max()} p50={np.median(tv[:, 1]):.0f} "
          f"model_final={tv[-1, 2]} "
          f"fused/frame p50={np.median(tv[1:, 3]):.0f} "
          f"inserted/frame p50={np.median(tv[1:, 4]):.0f} "
          f"removed/frame p50={np.median(tv[1:, 5]):.0f} "
          f"inserted_total={tv[1:, 4].sum()}", flush=True)
    if args.save:
        from supersurfel_fusion_tpu.io.tum import write_trajectory

        write_trajectory(args.save, slam.stamps, slam.trajectory)
    if args.dump_tele:
        np.savez(args.dump_tele, tele=tv,
                 cols=np.array(["icp_valid", "nb_visible", "nb_supersurfels",
                                "n_fused", "n_inserted", "n_removed",
                                "icp_code", "vo_matches", "vo_valid",
                                "icp_inliers", "n_static_sp"]))


if __name__ == "__main__":
    main()
