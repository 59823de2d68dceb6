"""Per-stage steady-state timing of the SLAM pipeline on the current backend.

Runs the real pipeline for --warm-frames to build a realistic model state,
then times each stage standalone (jitted separately, blocked) for --reps.

Usage: python tools/stage_bench.py [--warm-frames 60] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax_block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax_block(out)
    return (time.time() - t0) / reps * 1000.0


def jax_block(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-frames", type=int, default=60)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dataset", type=str,
                    default="/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops import fusion as fusion_ops
    from supersurfel_fusion_tpu.ops import icp as icp_ops
    from supersurfel_fusion_tpu.ops import tps as tps_ops
    from supersurfel_fusion_tpu.ops import vo as vo_ops
    from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
    from supersurfel_fusion_tpu.ops.features import detect_and_describe
    from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU
    from supersurfel_fusion_tpu.utils.color import rgb_to_gray

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    cam = cfg.cam
    ds = TUMDataset(args.dataset)
    n = min(args.warm_frames, len(ds))
    # raw frames for the warmup run: matches bench.py's dtype signature so
    # the full-pipeline executable is shared via the compilation cache
    frames = [ds.load_frame_raw(i) for i in range(n)]

    slam = SupersurfelFusionTPU(cfg)
    t0 = time.time()
    for f in frames:
        out = slam.process(f.rgb, f.depth, f.timestamp)
    out.pose.t.block_until_ready()
    print(f"warmup {n} frames (incl. compile): {time.time()-t0:.1f}s  "
          f"nb_surf={int(out.nb_supersurfels)} nb_vis={int(out.nb_visible)}",
          flush=True)

    state = slam.state
    last = ds.load_frame(n - 1)
    rgb = jnp.asarray(last.rgb, jnp.float32)
    depth = jnp.asarray(last.depth, jnp.float32)
    reps = args.reps
    R = {}

    # stage 1: bilateral + disparity
    f_bil = jax.jit(lambda d: depth_to_disp(bilateral_filter(
        d, cfg.bilateral_sigma_value, cfg.bilateral_sigma_space,
        cfg.bilateral_radius)))
    R["bilateral+disp"] = timeit(f_bil, depth, reps=reps)
    fdepth = jax.jit(lambda d: bilateral_filter(
        d, cfg.bilateral_sigma_value, cfg.bilateral_sigma_space,
        cfg.bilateral_radius))(depth)
    disp = depth_to_disp(fdepth)

    # stage 2: TPS segmentation
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from supersurfel_fusion_tpu.ops import tps_pallas

        f_tps = jax.jit(partial(tps_pallas.segment, cfg=cfg.tps))
        R["tps_pallas"] = timeit(f_tps, rgb, disp, reps=reps)
    f_tps_xla = jax.jit(partial(tps_ops.segment, cfg=cfg.tps))
    R["tps_xla"] = timeit(f_tps_xla, rgb, disp, reps=max(3, reps // 4))
    tps = f_tps(rgb, disp) if on_tpu else f_tps_xla(rgb, disp)

    # stage 3: plane smoothing + slanted depth
    gh, gw, cs = cfg.grid_h, cfg.grid_w, cfg.tps.cell_size

    @jax.jit
    def f_smooth(tps):
        th = tps_ops.smooth_planes(tps.stats, cfg.tps)
        return tps_ops.render_plane_depth(th, tps.labels, gh, gw, cs)
    R["smooth+render"] = timeit(f_smooth, tps, reps=reps)
    plane_depth = f_smooth(tps)

    # stage 4: supersurfel generation
    f_gen = jax.jit(lambda rgb, pd, tps, st: generate_supersurfels(
        rgb, pd, tps, cam, cfg.tps, cfg.generation,
        cfg.fusion.range_min, cfg.fusion.range_max, st))
    R["generate"] = timeit(f_gen, rgb, plane_depth, tps, state.stamp, reps=reps)
    frame = f_gen(rgb, plane_depth, tps, state.stamp)

    # stage 5: features
    f_feat = jax.jit(lambda g: detect_and_describe(g, cfg.vo))
    gray = rgb_to_gray(rgb)
    R["features"] = timeit(f_feat, gray, reps=reps)
    kp = f_feat(gray)

    # stage 6: VO match + PnP
    @jax.jit
    def f_vo(lmap, kp, pose_R, pose_t):
        matches, lm = vo_ops.find_matches(lmap, kp, pose_R, pose_t, cam, cfg.vo)
        return vo_ops.pnp_solve(pose_R, pose_t, matches.map_pos,
                                matches.kp_xy, matches.ok, cam, cfg.vo)
    R["vo_match+pnp"] = timeit(
        f_vo, state.local_map, kp, state.pose.R, state.pose.t, reps=reps)

    # stage 7: ICP target maps
    f_tm = jax.jit(lambda fr, lb, pd: icp_ops.build_target_maps(
        fr, lb, pd, cam, cs, cfg.fusion.range_min, cfg.fusion.range_max))
    R["icp_target_maps"] = timeit(f_tm, frame, tps.labels, plane_depth, reps=reps)
    tm = f_tm(frame, tps.labels, plane_depth)

    # stage 8: symmetric ICP
    Rv = state.pose.R.T
    tv = -(Rv @ state.pose.t)

    @jax.jit
    def f_icp(model, nbv, tm, Rv, tv):
        return icp_ops.symmetric_icp(model, nbv, tm, Rv, tv, cam, cfg.icp)
    R["icp_gn"] = timeit(
        f_icp, state.model.surfels, state.model.nb_visible, tm, Rv, tv, reps=reps)

    # stage 9: fusion/model update
    @jax.jit
    def f_fuse(mstate, frame, labels, pd, R_, t_, stamp):
        return fusion_ops.update_model(
            mstate, frame, labels, pd, R_, t_, cam, cfg.fusion,
            cfg.conf_thresh, stamp)
    R["fusion"] = timeit(
        f_fuse, state.model, frame, tps.labels, plane_depth,
        state.pose.R, state.pose.t, state.stamp, reps=reps)

    # fusion micro-split
    vcap = min(cfg.fusion.visible_cap, cfg.fusion.nb_supersurfels_max)
    vis_model = jax.tree.map(lambda a: a[:vcap], state.model.surfels)

    @jax.jit
    def f_match(vm, nbv, frame, labels, R_, t_):
        return fusion_ops.find_best_matches(
            vm, nbv, frame, labels, R_, t_, cam, cfg.fusion)
    R["fusion/match"] = timeit(
        f_match, vis_model, state.model.nb_visible, frame, tps.labels,
        state.pose.R, state.pose.t, reps=reps)
    match = f_match(vis_model, state.model.nb_visible, frame, tps.labels,
                    state.pose.R, state.pose.t)

    @jax.jit
    def f_fi(model, frame, match, nb, R_, t_, stamp):
        fused = fusion_ops._fuse(frame, model, match, R_, t_, stamp)
        return fusion_ops._insert(frame, fused, match, nb, R_, t_, stamp)
    R["fusion/fuse+ins"] = timeit(
        f_fi, state.model.surfels, frame, match, state.model.nb_supersurfels,
        state.pose.R, state.pose.t, state.stamp, reps=reps)

    @jax.jit
    def f_fc(model, nb, pd, R_, t_, stamp):
        return fusion_ops.filter_and_compact(
            model, nb, pd, R_, t_, cam, cfg.fusion, cfg.conf_thresh, stamp)
    R["fusion/compact"] = timeit(
        f_fc, state.model.surfels, state.model.nb_supersurfels, plane_depth,
        state.pose.R, state.pose.t, state.stamp, reps=reps)

    total = sum(v for k, v in R.items()
                if k != "tps_xla" and "/" not in k)
    print()
    for k, v in sorted(R.items(), key=lambda kv: -kv[1]):
        mark = "  (excl.)" if k == "tps_xla" else ""
        print(f"{k:18s} {v:8.2f} ms{mark}")
    print(f"{'SUM (pipeline)':18s} {total:8.2f} ms  -> {1000.0/total:.1f} fps upper bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
