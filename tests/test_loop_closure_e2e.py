"""Loop closure on REAL data (round-2 verdict #5).

The synthetic unit tests in test_loop_closure.py validate the math; this
drives the full pipeline over an fr1/xyz clip with an artificial revisit
(frames 0..N then 0..k again) so the fern detector must fire, the
relocalization must align the revisit against the stored keyframe, and an
accepted closure must not corrupt the trajectory.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_loop_closure_fires_on_real_revisit(fr1_xyz_path):
    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        FernsConfig,
        PipelineConfig,
    )
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(
        cam=CameraIntrinsics.tum_fr1(),
        enable_loop_closure=True,
        ferns=FernsConfig(enabled=True, min_frame_gap=8),
    )
    ds = TUMDataset(fr1_xyz_path)
    slam = SupersurfelFusionTPU(cfg)

    # 14 forward frames (every 2nd: some baseline), then revisit the start
    seq = list(range(0, 28, 2)) + [0, 1, 2]
    for i in seq:
        f = ds.load_frame_raw(i)
        out = slam.process(f.rgb, f.depth, f.timestamp)

    lc_count = int(slam.state.lc_count)
    kf_count = int(slam.state.kf_store.db.count)
    assert kf_count >= 1
    assert lc_count >= 1, (
        f"no loop closure accepted on a literal revisit "
        f"(keyframes={kf_count})"
    )
    # the revisit pose must be close to the original frame-0 pose (identity):
    # an accepted-but-wrong closure would teleport the camera
    t_end = np.asarray(slam.state.pose.t)
    assert np.linalg.norm(t_end) < 0.25, t_end
    assert np.all(np.isfinite(np.asarray(slam.state.pose.R)))
