"""Per-frame tracking diagnostics: icp/vo validity, inliers, errors.

Runs N frames of a TUM sequence and dumps a per-frame table of the scalar
tracking signals (kept on-device during the run, materialized once), plus a
summary of how often each stage fails and the correlation of failures with
ground-truth motion.

Usage: python tools/icp_diag.py --dataset ... --frames 200 [--out diag.npz]
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
    ap.add_argument("--dataset", default="/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--out", default="/tmp/icp_diag.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(args.dataset)
    n = min(args.frames, len(ds))
    frames = [ds.load_frame_raw(i) for i in range(n)]

    slam = SupersurfelFusionTPU(cfg)
    keep = []
    t0 = time.time()
    for f in frames:
        out = slam.process(f.rgb, f.depth, f.timestamp)
        keep.append((out.vo_valid, out.vo_matches, out.icp_valid,
                     out.icp_inliers, out.icp_error, out.nb_visible,
                     out.icp_code, out.icp_cov))
    out.pose.t.block_until_ready()
    dt = time.time() - t0
    print(f"{n} frames in {dt:.1f}s ({n/dt:.1f} fps incl. compile)")

    import jax.numpy as jnp

    cols = [np.asarray(jnp.stack(c)) for c in zip(*keep)]
    (vo_valid, vo_matches, icp_valid, icp_inl, icp_err, nbv, code,
     cov) = cols

    print(f"vo_valid: {vo_valid.mean()*100:.1f}%  "
          f"matches mean={vo_matches.mean():.0f} min={vo_matches.min()}")
    print(f"icp_valid: {icp_valid.mean()*100:.1f}%  "
          f"inliers mean={icp_inl.mean():.0f} min={icp_inl.min():.0f}  "
          f"err mean={icp_err.mean():.4f} max={icp_err.max():.4f}")

    bad = np.where(~icp_valid)[0]
    print(f"icp-invalid frames ({len(bad)}):", bad[:60].tolist())
    fail_inl = np.sum((code[bad] & 1) == 0)
    fail_cov = np.sum((code[bad] & 2) == 0)
    fail_tr = np.sum((code[bad] & 4) == 0)
    print(f"gate failures: min_inliers={fail_inl} cov={fail_cov} "
          f"translation={fail_tr}")
    for i in bad[:25]:
        cd = ' '.join(f'{x:.3f}' for x in cov[i])
        print(f"  f{i:4d}: code={code[i]:2d} inl={icp_inl[i]:7.0f} "
              f"err={icp_err[i]:.4f} "
              f"vo={bool(vo_valid[i])} m={vo_matches[i]:4d} nbv={nbv[i]:5d} "
              f"cov=[{cd}]")

    np.savez(args.out, vo_valid=vo_valid, vo_matches=vo_matches,
             icp_valid=icp_valid, icp_inliers=icp_inl, icp_error=icp_err,
             nb_visible=nbv, icp_code=code, icp_cov=cov)
    print("saved", args.out)


if __name__ == "__main__":
    main()
