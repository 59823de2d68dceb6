"""Upper-bound probe: what ATE would PERFECT mover rejection give?

Builds an oracle dynamic mask per frame from ground-truth poses (non-causal:
residual vs both t-1 and t+1), zeroes the depth under the mask so movers
never enter supersurfel generation / fusion / ICP targets, and runs the
pipeline with MOD off. The result bounds what any causal in-pipeline MOD
can achieve — if the oracle ATE is far above the reference's number, the
VO/ICP core (not mover rejection) is the limiting factor on this sequence.

  python tools/oracle_probe.py --frames 140 --thresh 0.08
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/"
                    "rgbd_dataset_freiburg3_walking_halfsphere")
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--thresh", type=float, default=0.15,
                    help="positive-residual threshold (m)")
    ap.add_argument("--baseline", type=int, default=10,
                    help="temporal baseline in frames: residual vs t-K and "
                         "t+K. A 1-frame baseline only sees mover EDGES "
                         "(lateral walkers keep near-constant depth over "
                         "33 ms); 10 frames of walking displace the body "
                         "enough that interiors fire")
    ap.add_argument("--dilate", type=int, default=2)
    ap.add_argument("--window", type=int, default=126)
    ap.add_argument("--save-masks", default=None)
    ap.add_argument("--save", default=None, help="save trajectory here")
    ap.add_argument("--min-inliers", type=float, default=None)
    ap.add_argument("--no-vo", action="store_true")
    ap.add_argument("--no-icp", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.eval.trajectory import ate, quat_to_mat_np
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.ops.flow import se3_depth_residual
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    import dataclasses

    cam = CameraIntrinsics.tum_fr3()
    cfg = PipelineConfig(cam=cam)
    if args.min_inliers is not None:
        cfg = dataclasses.replace(
            cfg, icp=dataclasses.replace(cfg.icp,
                                         min_inliers=args.min_inliers))
    if args.no_vo:
        cfg = dataclasses.replace(cfg, enable_sparse_vo=False)
    if args.no_icp:
        cfg = dataclasses.replace(cfg, enable_icp=False)
    ds = TUMDataset(args.dataset)
    n = min(args.frames, len(ds))

    @jax.jit
    def pos_resid_mask(d_cur16, d_oth16, R, t, thresh):
        dc = d_cur16.astype(jnp.float32) * cfg.depth_scale
        do = d_oth16.astype(jnp.float32) * cfg.depth_scale
        r = se3_depth_residual(dc, do, R, t, cam.fx, cam.fy, cam.cx, cam.cy)
        return r > thresh

    @jax.jit
    def dilate(m, iters):
        def step(_, mm):
            g = mm
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    g = g | jnp.roll(mm, (dy, dx), (0, 1))
            return g
        return jax.lax.fori_loop(0, iters, step, m)

    def gt_Rt(i):
        g = ds.associations[i].gt
        R = quat_to_mat_np(np.asarray(g[3:7]))
        return R, np.asarray(g[0:3])

    frames = [ds.load_frame_raw(i) for i in range(n)]
    slam = SupersurfelFusionTPU(cfg)
    masked_frac = []
    tele = []
    t0 = time.time()
    for i in range(n):
        d_i = jnp.asarray(frames[i].depth)
        mask = jnp.zeros(d_i.shape, bool)
        if ds.associations[i].gt is not None:
            Rw_i, tw_i = gt_Rt(i)
            for j in (i - args.baseline, i + args.baseline):
                if 0 <= j < n and ds.associations[j].gt is not None:
                    Rw_j, tw_j = gt_Rt(j)
                    # (R, t) maps j-cam points to i-cam points
                    R_ij = Rw_i.T @ Rw_j
                    t_ij = Rw_i.T @ (tw_j - tw_i)
                    mask = mask | pos_resid_mask(
                        d_i, jnp.asarray(frames[j].depth),
                        jnp.asarray(R_ij, jnp.float32),
                        jnp.asarray(t_ij, jnp.float32), args.thresh)
        mask = dilate(mask, args.dilate)
        dm = jnp.where(mask, jnp.uint16(0), d_i)
        masked_frac.append(float(jnp.mean(mask)))
        out = slam.process(np.asarray(frames[i].rgb), dm,
                           ds.associations[i].rgb_ts)
        tele.append([int(out.icp_valid), int(out.icp_code),
                     int(out.vo_valid), int(out.vo_matches),
                     int(out.icp_inliers)])
        if args.save_masks and i % 10 == 0:
            from supersurfel_fusion_tpu.viz.render import save_png
            os.makedirs(args.save_masks, exist_ok=True)
            mk = np.asarray(frames[i].rgb).copy()
            mk[np.asarray(mask)] = (255, 0, 0)
            save_png(os.path.join(args.save_masks, f"oracle_{i:04d}.png"), mk)
    dt = time.time() - t0

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
    tv = np.asarray(tele)
    print(f"ORACLE frames={n} wall={dt:.0f}s thresh={args.thresh} "
          f"masked_frac_mean={np.mean(masked_frac):.3f} "
          f"icp_valid={tv[:, 0].mean()*100:.1f}% "
          f"vo_valid={tv[:, 2].mean()*100:.1f}% "
          f"vo_m_p50={np.median(tv[:, 3]):.0f} "
          f"ate={r.rmse:.4f} mean={r.mean:.4f} max={r.max:.4f}{wtxt}",
          flush=True)
    bad = np.where(tv[:, 0] == 0)[0]
    print(f"icp-failed frames: {bad.tolist()}", flush=True)
    if args.save:
        from supersurfel_fusion_tpu.io.tum import write_trajectory
        write_trajectory(args.save, slam.stamps, slam.trajectory)


if __name__ == "__main__":
    main()
