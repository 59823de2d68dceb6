"""MOD internals census on a real clip: why are movers not rejected?

Runs the pipeline on a TUM segment with MOD on and, for each frame, re-runs
the MOD internals OUTSIDE the jit to extract intermediates (rigid fit
validity, cluster count/sizes, per-cluster flow + depth-residual stats,
threshold values, dynamic counts), printing a per-frame census and writing
mask/residual PNGs for visual inspection.

  python tools/mod_diag.py --start 20 --count 30 --out /tmp/mod_diag
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
                    "rgbd_dataset_freiburg3_walking_halfsphere")
    ap.add_argument("--start", type=int, default=20)
    ap.add_argument("--count", type=int, default=30)
    ap.add_argument("--out", default="/tmp/mod_diag")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        MODConfig,
        PipelineConfig,
    )
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops import motion as mo
    from supersurfel_fusion_tpu.ops import tps as tps_ops
    from supersurfel_fusion_tpu.ops.depth import bilateral_filter, depth_to_disp
    from supersurfel_fusion_tpu.ops.features import detect_and_describe
    from supersurfel_fusion_tpu.ops.flow import (
        dense_flow,
        estimate_similarity_ransac,
        se3_depth_residual,
        warp_similarity,
    )
    from supersurfel_fusion_tpu.ops.loop_closure import ransac_rigid_3d
    from supersurfel_fusion_tpu.ops.matching import gms_filter, match_bruteforce
    from supersurfel_fusion_tpu.ops.supersurfels import generate_supersurfels
    from supersurfel_fusion_tpu.utils.color import rgb_to_gray
    from supersurfel_fusion_tpu.viz.render import save_png

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr3(),
                         mod=MODConfig(enabled=True))
    cam, cs = cfg.cam, cfg.tps.cell_size
    gh, gw = cfg.grid_h, cfg.grid_w
    n_sp = gh * gw
    ds = TUMDataset(args.dataset)
    os.makedirs(args.out, exist_ok=True)

    @jax.jit
    def front(rgb, depth16):
        depth = depth16.astype(jnp.float32) * cfg.depth_scale
        fdepth = bilateral_filter(depth, cfg.bilateral_sigma_value,
                                  cfg.bilateral_sigma_space,
                                  cfg.bilateral_radius)
        disp = depth_to_disp(fdepth)
        tps = tps_ops.segment(rgb.astype(jnp.float32), disp, cfg.tps)
        theta_s = tps_ops.smooth_planes(tps.stats, cfg.tps)
        tps = tps._replace(stats=tps.stats._replace(theta=theta_s))
        plane_depth = tps_ops.render_plane_depth(theta_s, tps.labels, gh, gw, cs)
        frame = generate_supersurfels(
            rgb.astype(jnp.float32), plane_depth, tps, cam, cfg.tps,
            cfg.generation, cfg.fusion.range_min, cfg.fusion.range_max,
            jnp.int32(0),
        )
        gray = rgb_to_gray(rgb.astype(jnp.float32))
        kp = detect_and_describe(gray, cfg.vo)
        return tps, plane_depth, frame, gray, kp, fdepth

    prev = None
    for i in range(args.start, args.start + args.count):
        f = ds.load_frame_raw(i)
        tps, plane_depth, frame, gray, kp, fdepth = front(
            jnp.asarray(f.rgb), jnp.asarray(f.depth))
        H, W = cam.height, cam.width
        ui = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
        zk = fdepth[vi, ui]
        kp_z_ok = (zk >= 0.2) & (zk < 5.0)
        kp_p3d = jnp.stack(
            [zk * (kp.xy[:, 0] - cam.cx) / cam.fx,
             zk * (kp.xy[:, 1] - cam.cy) / cam.fy, zk], axis=-1)

        if prev is not None:
            (pgray, pdepth, pxy, pp3d, pdesc, pvalid) = prev
            adj = mo.superpixel_adjacency(tps.labels, gh, gw, cs)
            pos_t = frame.positions.reshape(gh, gw, 3)
            nrm_t = frame.orientations[:, 2, :].reshape(gh, gw, 3)
            conf_t = frame.confidences.reshape(gh, gw)
            root, _ = mo.geometric_clusters(
                adj, pos_t, nrm_t, conf_t, gh, gw, cfg.mod)

            midx, _, mok = match_bruteforce(pdesc, pvalid, kp.desc, kp.valid)
            mxy = kp.xy[midx]
            inl = gms_filter(pxy, mxy, mok, float(W), float(H))
            a, b, tx, ty, H_ok = estimate_similarity_ransac(pxy, mxy, inl)
            gray_est = warp_similarity(pgray, a, b, tx, ty, 0.0)
            flow = dense_flow(gray, gray_est)

            pair_ok = inl & kp_z_ok[midx] & pvalid & (pp3d[:, 2] >= 0.2) \
                & (pp3d[:, 2] < 5.0)
            R_rig, t_rig, rigid_ok, n_in = ransac_rigid_3d(
                pp3d, kp_p3d[midx], pair_ok, thresh=0.05,
                min_inliers=15, min_ratio=0.15)
            resid = se3_depth_residual(
                fdepth, pdepth, R_rig, t_rig,
                cam.fx, cam.fy, cam.cx, cam.cy)

            # cluster stats
            root_f = np.asarray(root.reshape(-1))
            csize = np.bincount(root_f, minlength=n_sp)
            in_cluster = csize[root_f] > 1
            label = np.where(in_cluster, root_f, -1)
            conf_np = np.asarray(frame.confidences)
            resid_np = np.asarray(resid)
            labels_np = np.asarray(tps.labels)
            # per-sp mean resid
            r_sum = np.zeros(n_sp)
            r_cnt = np.zeros(n_sp)
            np.add.at(r_sum, labels_np.ravel(), resid_np.ravel())
            np.add.at(r_cnt, labels_np.ravel(),
                      (resid_np > 0).ravel().astype(np.float64))
            sp_zdiff = r_sum / np.maximum(r_cnt, 32.0)
            zsp = np.asarray(frame.positions)[:, 2]

            # which sps have big residual, and are they in clusters?
            hot = sp_zdiff > 0.15
            uniq = [
                (int(l), int((label == l).sum()),
                 float(sp_zdiff[label == l].mean()))
                for l in np.unique(label[label >= 0])
            ]
            big = sorted(uniq, key=lambda u: -u[2])[:4]
            print(
                f"f{i}: H_ok={bool(H_ok)} rigid_ok={bool(rigid_ok)} "
                f"n_in={int(n_in)} hot_sps={int(hot.sum())} "
                f"hot_in_cluster={int((hot & (label >= 0)).sum())} "
                f"hot_conf>0={int((hot & (conf_np > 0)).sum())} "
                f"clusters(top zdiff)={[(c, s, round(z, 3)) for c, s, z in big]}",
                flush=True,
            )
            # dumps
            if (i - args.start) % 5 == 0:
                rim = np.clip(resid_np / 0.5 * 255, 0, 255).astype(np.uint8)
                save_png(os.path.join(args.out, f"resid_{i:04d}.png"),
                         np.stack([rim] * 3, -1))
                hot_px = hot[labels_np]
                mk = np.asarray(f.rgb).copy()
                mk[hot_px] = (255, 0, 0)
                clu_px = (label >= 0)[labels_np]
                mk[~clu_px & hot_px] = (255, 255, 0)
                save_png(os.path.join(args.out, f"hot_{i:04d}.png"), mk)

        prev = (gray, fdepth, kp.xy, kp_p3d, kp.desc, kp.valid)


if __name__ == "__main__":
    main()
