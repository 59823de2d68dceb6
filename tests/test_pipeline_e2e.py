"""End-to-end pipeline regression tests on a real TUM fr1/xyz clip (CPU).

Covers the gaps called out in round 1: nothing previously invoked
`process_frame` on real frames. The reference's own validation is the
benchmark-node replay (`node/supersurfel_fusion_rgbd_benchmark_node.cpp:
573-744`); this is the CI-sized version with an ATE bound, plus
checkpoint-resume equivalence and model-export round-trips.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from supersurfel_fusion_tpu.config import CameraIntrinsics, PipelineConfig

N_FRAMES = 40


@pytest.fixture(scope="module")
def slam_run(fr1_xyz_path):
    """Run N_FRAMES of fr1/xyz through the full pipeline once per module."""
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = PipelineConfig(cam=CameraIntrinsics.tum_fr1())
    ds = TUMDataset(fr1_xyz_path)
    # raw uint8/uint16 frames: same ingestion path as the production bench
    frames = [ds.load_frame_raw(i) for i in range(N_FRAMES)]
    slam = SupersurfelFusionTPU(cfg)
    outs = [slam.process(f.rgb, f.depth, f.timestamp) for f in frames]
    return cfg, ds, frames, slam, outs


def test_trajectory_ate_bound(slam_run):
    """ATE RMSE of the clip must stay near the reference's quality
    (full-run reference: 0.0195 m, BASELINE.md)."""
    from supersurfel_fusion_tpu.eval.trajectory import ate

    cfg, ds, frames, slam, outs = slam_run
    est = {t: p for t, p in zip(slam.stamps, slam.trajectory)}
    gt = {a.rgb_ts: a.gt for a in ds.associations[:N_FRAMES] if a.gt is not None}
    assert len(gt) > 10
    res = ate(est, gt)
    assert res.rmse < 0.03, f"ATE RMSE {res.rmse:.4f} m exceeds 0.03 m bound"


def test_pipeline_tracks_and_builds_model(slam_run):
    cfg, ds, frames, slam, outs = slam_run
    # VO and ICP must both be live by the end of the clip
    assert bool(outs[-1].vo_valid)
    assert bool(outs[-1].icp_valid)
    assert int(outs[-1].nb_supersurfels) > 1000
    assert int(outs[-1].nb_visible) > 500
    # model stays within capacity
    assert int(outs[-1].nb_supersurfels) <= cfg.fusion.nb_supersurfels_max


def test_checkpoint_resume_equivalence(slam_run, tmp_path):
    """save -> load -> continue must produce the exact same poses as an
    uninterrupted run (orbax round-trip, io/export.py)."""
    import jax

    from supersurfel_fusion_tpu.io.export import load_checkpoint, save_checkpoint
    from supersurfel_fusion_tpu.io.tum import TUMDataset
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU, init_state

    cfg, ds, frames, _, _ = slam_run
    k, extra = 10, 3

    slam_a = SupersurfelFusionTPU(cfg)
    for f in frames[:k]:
        slam_a.process(f.rgb, f.depth, f.timestamp)
    ckpt_dir = save_checkpoint(str(tmp_path / "ckpt"), slam_a.state)

    cont_poses = []
    for f in frames[k:k + extra]:
        out = slam_a.process(f.rgb, f.depth, f.timestamp)
        cont_poses.append((np.asarray(out.pose.R), np.asarray(out.pose.t)))

    slam_b = SupersurfelFusionTPU(cfg)
    slam_b.state = load_checkpoint(ckpt_dir, init_state(cfg))
    resumed_poses = []
    for f in frames[k:k + extra]:
        out = slam_b.process(f.rgb, f.depth, f.timestamp)
        resumed_poses.append((np.asarray(out.pose.R), np.asarray(out.pose.t)))

    for (Ra, ta), (Rb, tb) in zip(cont_poses, resumed_poses):
        np.testing.assert_allclose(Ra, Rb, atol=1e-6)
        np.testing.assert_allclose(ta, tb, atol=1e-6)


def test_export_model_roundtrip(slam_run, tmp_path):
    """The text export must parse back to the same surfels (reference layout:
    6 lines + blank per surfel, supersurfel_fusion.cu:595-633)."""
    from supersurfel_fusion_tpu.io.export import export_model, export_model_ply

    cfg, ds, frames, slam, outs = slam_run
    model = slam.state.model
    path = str(tmp_path / "model.txt")
    n = export_model(path, model.surfels, int(model.nb_supersurfels),
                     conf_thresh=0.0)
    assert n > 500

    text = open(path).read().strip("\n")
    blocks = text.split("\n\n")
    assert len(blocks) == n
    # re-parse and compare against the surfel arrays
    conf = np.asarray(model.surfels.confidences)
    pos = np.asarray(model.surfels.positions)
    exported = [i for i in range(int(model.nb_supersurfels)) if conf[i] > 0.0]
    first = blocks[0].split("\n")
    assert len(first) == 6
    head = first[0].split()
    assert len(head) == 3 and abs(float(head[2]) - conf[exported[0]]) < 1e-4
    p0 = np.array([float(v) for v in first[1].split()])
    np.testing.assert_allclose(p0, pos[exported[0]], atol=1e-4)

    ply_path = str(tmp_path / "model.ply")
    n_ply = export_model_ply(ply_path, model.surfels,
                             int(model.nb_supersurfels), 0.0)
    assert n_ply == n
    header = open(ply_path).read().split("end_header")[0]
    assert f"element vertex {n_ply}" in header
