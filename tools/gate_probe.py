"""Probe the ICP correspondence-gate funnel and normal distributions.

Answers: why are per-frame ICP inlier counts ~700 (of ~1300 visible model
surfels), and why is the x-translation covariance marginal (~0.05)? Prints
per-gate rejection counts and |n| component statistics for the model and the
frame, on a chosen frame of a TUM sequence.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/"
                    "rgbd_dataset_freiburg1_xyz")
    ap.add_argument("--frame", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops import icp as icp_ops
    from supersurfel_fusion_tpu.ops import tps as tps_ops
    from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
    from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU
    from supersurfel_fusion_tpu.utils.color import rgb_to_lab

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    cam = cfg.cam
    ds = TUMDataset(args.dataset)
    N = args.frame

    slam = SupersurfelFusionTPU(cfg)
    for i in range(N):
        f = ds.load_frame_raw(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)
    model = jax.tree.map(lambda a: np.asarray(a), slam.state.model.surfels)
    nbv = int(slam.state.model.nb_visible)

    f = ds.load_frame_raw(N)
    out = slam.process(f.rgb, f.depth, f.timestamp)
    R = np.asarray(out.pose.R)
    t = np.asarray(out.pose.t)

    # recompute the frame's front half (same ops as the pipeline)
    @jax.jit
    def front(rgb, depth):
        rgb = rgb.astype(jnp.float32)
        depth = depth.astype(jnp.float32) * cfg.depth_scale
        with jax.default_matmul_precision("float32"):
            fdepth = bilateral_filter(
                depth, cfg.bilateral_sigma_value, cfg.bilateral_sigma_space,
                cfg.bilateral_radius)
            disp = depth_to_disp(fdepth)
            tps = tps_ops.segment(rgb, disp, cfg.tps)
            theta_s = tps_ops.smooth_planes(tps.stats, cfg.tps)
            tps = tps._replace(stats=tps.stats._replace(theta=theta_s))
            pd = tps_ops.render_plane_depth(
                theta_s, tps.labels, cfg.grid_h, cfg.grid_w, cfg.tps.cell_size)
            frame = generate_supersurfels(
                rgb, pd, tps, cam, cfg.tps, cfg.generation,
                cfg.fusion.range_min, cfg.fusion.range_max, jnp.int32(N))
            tm = icp_ops.build_target_maps(
                frame, tps.labels, pd, cam, cfg.tps.cell_size,
                cfg.fusion.range_min, cfg.fusion.range_max)
        return frame, tm, fdepth

    frame, tm, fdepth = front(jnp.asarray(f.rgb), jnp.asarray(f.depth))
    frame = jax.tree.map(np.asarray, frame)
    tm = np.asarray(tm)
    fdepth = np.asarray(fdepth)

    # ---- numpy gate funnel (mirrors ops/icp.py:_build_system)
    Rv, tv = R.T, -(R.T @ t)
    H, W = cam.height, cam.width
    vcap = min(cfg.fusion.visible_cap, model.positions.shape[0])
    pos = model.positions[:vcap]
    conf = model.confidences[:vcap]
    nrm = model.orientations[:vcap, 2, :]
    lab = np.asarray(rgb_to_lab(jnp.asarray(model.colors[:vcap])))

    ids = np.arange(vcap)
    src = (ids < nbv) & (conf > 0)
    ps = pos @ Rv.T + tv
    u = np.round(ps[:, 0] * cam.fx / np.where(ps[:, 2] != 0, ps[:, 2], 1e-9)
                 + cam.cx).astype(int)
    v = np.round(ps[:, 1] * cam.fy / np.where(ps[:, 2] != 0, ps[:, 2], 1e-9)
                 + cam.cy).astype(int)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (ps[:, 2] > 0) & src
    idx = np.clip(v, 0, H - 1) * W + np.clip(u, 0, W - 1)
    tmf = tm.reshape(-1, 10)[idx]
    pt, nt, tlab, tval = tmf[:, 0:3], tmf[:, 3:6], tmf[:, 6:9], tmf[:, 9]

    ns = nrm @ Rv.T
    ns /= np.maximum(np.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
    cdist = np.linalg.norm(lab - tlab, axis=-1)
    dist = np.linalg.norm(ps - pt, axis=-1)
    ndot = np.abs(np.sum(ns * nt, axis=-1))

    cand = inb & (tval > 0.5)
    g_c = cdist < cfg.icp.max_color_dist
    g_d = dist < cfg.icp.max_dist
    g_n = ndot > cfg.icp.min_normal_dot
    print(f"frame {N}: nbv={nbv} src_valid={src.sum()} inb+tvalid={cand.sum()}")
    print(f"  color<20 : {(cand & g_c).sum()}")
    print(f"  dist<0.1 : {(cand & g_d).sum()}")
    print(f"  ndot>0.8 : {(cand & g_n).sum()}")
    print(f"  ALL      : {(cand & g_c & g_d & g_n).sum()}")
    print(f"  color+dist (no ndot): {(cand & g_c & g_d).sum()}")
    rej = cand & g_c & g_d & ~g_n
    print(f"  rejected by ndot only: {rej.sum()}; their ndot percentiles "
          f"p25/50/75: {np.percentile(ndot[rej], [25, 50, 75]).round(3)
                        if rej.sum() else '-'}")

    ok = cand & g_c & g_d & g_n
    for name, nn in (("model ns (inliers, cam frame)", ns[ok]),
                     ("frame nt (inliers)", nt[ok])):
        a = np.abs(nn)
        print(f"  {name}: mean|nx|={a[:,0].mean():.3f} "
              f"mean|ny|={a[:,1].mean():.3f} mean|nz|={a[:,2].mean():.3f}")

    # frame surfel normal distribution (all valid, camera frame)
    fval = frame.confidences > 0
    fn = np.abs(frame.orientations[fval][:, 2, :])
    print(f"frame surfels valid={fval.sum()}: mean|nx|={fn[:,0].mean():.3f} "
          f"mean|ny|={fn[:,1].mean():.3f} mean|nz|={fn[:,2].mean():.3f}")
    hist = np.histogram(fn[:, 2], bins=[0, .5, .8, .9, .95, .99, 1.001])[0]
    print(f"  |nz| hist [0,.5,.8,.9,.95,.99,1]: {hist}")

    # gate funnel with relaxed ndot, what-if inliers
    for th in (0.5, 0.6, 0.7, 0.8, 0.9):
        m = cand & g_c & g_d & (ndot > th)
        print(f"  what-if ndot>{th}: inliers={m.sum()}")

    # covariance with actual inliers
    w = ok.astype(np.float64)
    d3 = pt - ps
    c1 = np.cross(pt, ns)
    c2 = np.cross(ps, nt)
    x1 = np.concatenate([c1, ns], axis=-1) * w[:, None]
    x2 = np.concatenate([c2, nt], axis=-1) * w[:, None]
    JtJ = x1.T @ x1 + x2.T @ x2
    cov = np.linalg.inv(JtJ)
    print(f"  f64 cov diag: {np.diagonal(cov).round(4)}")


if __name__ == "__main__":
    main()
