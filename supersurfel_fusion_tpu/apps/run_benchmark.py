"""TUM RGB-D benchmark runner (CLI).

Replaces the reference's `supersurfel_fusion_rgbd_benchmark_node`
(`node/supersurfel_fusion_rgbd_benchmark_node.cpp:573-744`): replays a TUM
sequence synchronously through the SLAM pipeline, writes a TUM-format
trajectory, and reports ATE/RPE against ground truth plus runtime stats.

Usage:
  python -m supersurfel_fusion_tpu.apps.run_benchmark \
      --dataset /path/to/rgbd_dataset_freiburg1_xyz \
      [--max-frames N] [--out estimated.txt] [--cam fr1|fr2|fr3] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True, help="TUM sequence directory")
    ap.add_argument("--out", default=None, help="trajectory output path")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--cam", default="auto", choices=["auto", "fr1", "fr2", "fr3"])
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--depth-scale", type=float, default=1.0 / 5000.0)
    ap.add_argument("--mod", action="store_true", help="enable moving-object detection")
    ap.add_argument("--yolo", action="store_true",
                    help="combined MOD: person detector + flood fill "
                         "(needs --weights)")
    ap.add_argument("--weights", default="weights/person_detector.npz",
                    help="person-detector .npz checkpoint for --yolo")
    ap.add_argument("--no-vo", action="store_true", help="disable sparse VO (ICP only)")
    ap.add_argument("--no-icp", action="store_true", help="disable dense ICP (VO only)")
    ap.add_argument("--loop-closure", action="store_true",
                    help="enable ferns + global loop closure")
    ap.add_argument("--save-model", default=None,
                    help="export the final model (reference text format, or "
                         ".ply)")
    ap.add_argument("--dump-images", default=None, metavar="DIR",
                    help="write superpixel/slanted-plane/MOD-mask/model "
                         "renders for every --dump-every frames to DIR "
                         "(the reference node's image topics)")
    ap.add_argument("--dump-every", type=int, default=25)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--stats", action="store_true",
                    help="read tracking stats from the device DURING the run "
                         "(slow on a remote TPU; the default prints them "
                         "after the run instead)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        MODConfig,
        PipelineConfig,
    )
    from supersurfel_fusion_tpu.eval.trajectory import ate, rpe
    from supersurfel_fusion_tpu.io.tum import TUMDataset, write_trajectory
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    name = os.path.basename(os.path.normpath(args.dataset))
    cam_key = args.cam
    if cam_key == "auto":
        cam_key = "fr1"
        for k in ("freiburg1", "freiburg2", "freiburg3"):
            if k in name:
                cam_key = "fr" + k[-1]
    cam = {
        "fr1": CameraIntrinsics.tum_fr1,
        "fr2": CameraIntrinsics.tum_fr2,
        "fr3": CameraIntrinsics.tum_fr3,
    }[cam_key]()

    weights = args.weights if args.yolo and os.path.exists(args.weights) else ""
    if args.yolo and not weights and not args.quiet:
        print(f"--yolo: weights {args.weights} not found; "
              "running simple MOD", flush=True)
    cfg = PipelineConfig(
        cam=cam,
        depth_scale=args.depth_scale,
        mod=MODConfig(enabled=args.mod or args.yolo, use_yolo=bool(weights),
                      weights_path=weights),
        enable_sparse_vo=not args.no_vo,
        enable_icp=not args.no_icp,
        enable_loop_closure=args.loop_closure,
    )
    if args.loop_closure:
        import dataclasses

        from supersurfel_fusion_tpu.config import FernsConfig

        cfg = dataclasses.replace(cfg, ferns=FernsConfig(enabled=True))
    ds = TUMDataset(args.dataset, depth_scale=args.depth_scale)
    n = len(ds) if args.max_frames is None else min(args.max_frames, len(ds))

    # native prefetching loader (background PNG decode); PIL fallback
    prefetcher = None
    try:
        from supersurfel_fusion_tpu.io.native_loader import PrefetchingLoader

        pairs = [
            (os.path.join(args.dataset, a.rgb_file),
             os.path.join(args.dataset, a.depth_file))
            for a in ds.associations[:n]
        ]
        prefetcher = PrefetchingLoader(pairs, cam.width, cam.height)
    except Exception as e:  # no toolchain / build failure
        if not args.quiet:
            print(f"native loader unavailable ({e}); using PIL", flush=True)

    def get_frame(i):
        # raw uint8 rgb + uint16 depth: the pipeline converts on-device,
        # keeping the host->device upload at 1.5 MB/frame
        if prefetcher is not None:
            rgb, depth16 = prefetcher.get(i)
            a = ds.associations[i]
            from supersurfel_fusion_tpu.io.tum import TUMFrame

            return TUMFrame(i, a.rgb_ts, rgb, depth16, a.gt)
        return ds.load_frame_raw(i)

    if args.dump_images:
        os.makedirs(args.dump_images, exist_ok=True)

    slam = SupersurfelFusionTPU(cfg)
    t_start = time.time()
    t_first = None
    # Mid-run device reads are poison on a tunneled TPU: a single scalar
    # download costs seconds (measured: the old per-50-frame stats print took
    # a 790-frame run from ~130 to 5.7 fps — even reading 50-frame-STALE
    # outputs). Default progress lines therefore touch no device data; the
    # per-window tracking stats are buffered on-device and printed once at
    # the end (one batched materialization), or live with --stats.
    windows = []
    import jax.numpy as _jnp
    for i in range(n):
        f = get_frame(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)
        if i == 0:
            out.pose.t.block_until_ready()
            t_first = time.time()
        if i % 50 == 0:
            if not args.quiet:
                print(f"frame {i}/{n}", flush=True)
            # fuse the window stats into ONE small device buffer: retaining
            # the whole FrameOutput (17 arrays incl. two HxW images) per
            # window grows the live-buffer count, which inflates dispatch
            # cost on remote backends (same failure mode as the old
            # per-frame pose retention, see pipeline.py:process)
            windows.append((i, _jnp.stack([
                out.icp_valid.astype(_jnp.int32), out.nb_supersurfels,
                out.nb_visible, out.vo_matches,
            ])))
            if args.stats and not args.quiet:
                print(
                    f"  icp_valid={bool(out.icp_valid)} "
                    f"nb={int(out.nb_supersurfels)} vis={int(out.nb_visible)}",
                    flush=True,
                )
        if args.dump_images and i % args.dump_every == 0:
            _np = np

            from supersurfel_fusion_tpu.viz import render as _rv

            labels = _np.asarray(out.labels)
            d = args.dump_images
            _rv.save_png(os.path.join(d, f"superpixels_{i:05d}.png"),
                         _rv.superpixel_image(f.rgb, labels))
            _rv.save_png(os.path.join(d, f"slanted_plane_{i:05d}.png"),
                         _rv.slanted_plane_image(_np.asarray(out.plane_depth)))
            if cfg.mod.enabled:
                _rv.save_png(os.path.join(d, f"mod_mask_{i:05d}.png"),
                             _rv.mod_mask_image(labels, _np.asarray(out.static_sp)))
            st = slam.state
            _rv.save_png(
                os.path.join(d, f"model_{i:05d}.png"),
                _rv.model_image(
                    _np.asarray(st.model.surfels.positions),
                    _np.asarray(st.model.surfels.colors),
                    _np.asarray(st.model.surfels.dims),
                    _np.asarray(st.model.surfels.confidences),
                    int(st.model.nb_supersurfels),
                    _np.asarray(out.pose.R), _np.asarray(out.pose.t),
                    cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                ),
            )
    out.pose.t.block_until_ready()
    t_end = time.time()
    steady = n - 1 if n > 1 else 1
    fps = steady / max(t_end - t_first, 1e-9) if t_first else 0.0

    if not args.quiet and not args.stats and windows:
        # one batched materialization of the buffered per-window stats
        sv = np.asarray(_jnp.stack([w for _, w in windows]))
        for (i, _), row in zip(windows, sv):
            print(f"frame {i}: icp_valid={bool(row[0])} nb={row[1]} "
                  f"vis={row[2]} vo_matches={row[3]}", flush=True)

    traj_path = args.out or os.path.join("/tmp", f"estimated_{name}.txt")
    write_trajectory(traj_path, slam.stamps, slam.trajectory)

    if args.save_model:
        from supersurfel_fusion_tpu.io.export import (
            export_model,
            export_model_ply,
        )

        st = slam.state
        nmod = int(st.model.nb_supersurfels)
        if args.save_model.endswith(".ply"):
            export_model_ply(args.save_model, st.model.surfels, nmod)
        else:
            export_model(args.save_model, st.model.surfels, nmod,
                         cfg.conf_thresh)

    # silent-cap warnings (VERDICT r2 #10): each of these is an accuracy
    # cliff the run would otherwise hide
    st = slam.state
    vis_peak = int(st.vis_peak)
    dropped = int(st.dropped_total)
    if vis_peak > cfg.fusion.visible_cap:
        print(f"WARNING: peak nb_visible {vis_peak} exceeded visible_cap "
              f"{cfg.fusion.visible_cap}: projective association/ICP were "
              f"truncated; raise FusionConfig.visible_cap", file=sys.stderr)
    if dropped > 0:
        print(f"WARNING: {dropped} frame surfels dropped at the "
              f"nb_supersurfels_max={cfg.fusion.nb_supersurfels_max} "
              f"capacity ceiling", file=sys.stderr)
    if (args.loop_closure or cfg.ferns.enabled) and (
            int(st.kf_store.db.count) >= cfg.ferns.max_keyframes):
        print(f"WARNING: keyframe store saturated at "
              f"{cfg.ferns.max_keyframes}; later keyframes were not "
              f"recorded (raise FernsConfig.max_keyframes)", file=sys.stderr)

    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {
        a.rgb_ts: a.gt for a in ds.associations[:n] if a.gt is not None
    }
    # 104 B/surfel: 24 floats + int2, supersurfel_fusion.cu:524-525
    model_mb = int(slam.state.model.nb_supersurfels) * 104 / 1e6
    result = {"frames": n, "fps": round(fps, 2), "trajectory": traj_path,
              "model_mb": round(model_mb, 2)}
    if args.loop_closure or cfg.ferns.enabled:
        result["lc_count"] = int(slam.state.lc_count)
        result["keyframes"] = int(slam.state.kf_store.db.count)
    if len(gt) > 2:
        r = ate(est, gt)
        result.update(
            ate_rmse=round(r.rmse, 4), ate_mean=round(r.mean, 4),
            ate_max=round(r.max, 4),
        )
        rp = rpe(est, gt)
        result.update(rpe_trans=round(rp.trans_rmse, 4))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
