"""Full-sequence ICP gate census: which gate rejects ICP on invalid frames.

Runs N frames, keeps per-frame icp_code / icp_cov / inliers / error on
device, fetches once, prints the gate-failure histogram and the offending
covariance components.
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
    ap.add_argument("--frames", type=int, default=790)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(args.dataset)
    n = min(args.frames, len(ds))
    slam = SupersurfelFusionTPU(cfg)

    codes, covs, inls, errs, vos, nvis = [], [], [], [], [], []
    for i in range(n):
        f = ds.load_frame_raw(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)
        codes.append(out.icp_code)
        covs.append(out.icp_cov)
        inls.append(out.icp_inliers)
        errs.append(out.icp_error)
        vos.append(out.vo_valid)
        nvis.append(out.nb_visible)

    codes = np.asarray(jnp.stack(codes))
    covs = np.asarray(jnp.stack(covs))
    inls = np.asarray(jnp.stack(inls))
    errs = np.asarray(jnp.stack(errs))
    vos = np.asarray(jnp.stack(vos))
    nvis = np.asarray(jnp.stack(nvis))

    valid = codes == 15
    print(f"frames={n} icp_valid={valid.mean()*100:.1f}% "
          f"vo_valid={vos.mean()*100:.1f}%")
    print("code histogram (bit1=inliers, bit2=cov, bit4=trans, bit8=ran):")
    for c in np.unique(codes):
        m = codes == c
        print(f"  code={c:2d}: {m.sum():4d} frames "
              f"(inliers med={np.median(inls[m]):.0f}, "
              f"err med={np.median(errs[m]):.4f}, "
              f"nvis med={np.median(nvis[m]):.0f})")
    # cov-gate failures: which component exceeds the threshold
    cov_fail = (codes & 2) == 0
    if cov_fail.any():
        cf = covs[cov_fail]
        # cov_ok also requires finiteness (ops/icp.py): report NaN/inf rows
        # separately so percentiles stay informative
        finite = np.isfinite(cf).all(axis=1)
        if (~finite).any():
            print(f"cov-gate failures with non-finite cov: {(~finite).sum()}")
        cf = cf[finite]
        cov_thresh = cfg.icp.cov_thresh
        names = ["wx", "wy", "wz", "tx", "ty", "tz"]
        print(f"cov-gate failures: {cov_fail.sum()} frames; "
              f"per-component p50/p90 of failing frames:")
        for j, nm in enumerate(names):
            if not len(cf):
                break
            print(f"  {nm}: p50={np.percentile(cf[:, j], 50):.4f} "
                  f"p90={np.percentile(cf[:, j], 90):.4f} "
                  f"exceeds={np.mean(cf[:, j] >= cov_thresh)*100:.0f}%")
        # overall cov distribution on valid frames for contrast
        cv = covs[valid]
        if len(cv):
            print("valid-frame cov p90 per component:",
                  np.round(np.percentile(cv, 90, axis=0), 5))
    # where in the sequence do failures cluster?
    idx = np.where(~valid)[0]
    if len(idx):
        print(f"invalid frame indices: first 20 = {idx[:20].tolist()}")
        h, _ = np.histogram(idx, bins=10, range=(0, n))
        print(f"failure count per decile: {h.tolist()}")


if __name__ == "__main__":
    main()
