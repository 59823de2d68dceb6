"""Validates the ATE/RPE evaluator against the reference repo's own shipped
trajectory (`estimated.txt`), reproducing the BASELINE.md numbers."""

import os

import numpy as np
import pytest

from supersurfel_fusion_tpu.eval.trajectory import ate, rpe
from supersurfel_fusion_tpu.io.tum import read_trajectory_file


def test_ate_fr1_xyz_matches_baseline(fr1_xyz_path):
    est = read_trajectory_file(os.path.join(fr1_xyz_path, "estimated.txt"))
    gt = read_trajectory_file(os.path.join(fr1_xyz_path, "groundtruth.txt"))
    r = ate(est, gt)
    # BASELINE.md: ATE RMSE 0.0195 m (mean 0.0174, max 0.0490) over 790 pairs
    assert abs(r.rmse - 0.0195) < 0.0015, r
    assert abs(r.mean - 0.0174) < 0.0015, r
    assert r.n_pairs >= 780


def test_ate_fr3_walking_matches_baseline(fr3_walking_path):
    est = read_trajectory_file(os.path.join(fr3_walking_path, "estimated.txt"))
    gt = read_trajectory_file(os.path.join(fr3_walking_path, "groundtruth.txt"))
    r = ate(est, gt)
    # BASELINE.md: ATE RMSE 0.0541 m over 126 poses
    assert abs(r.rmse - 0.0541) < 0.003, r


def test_rpe_runs(fr1_xyz_path):
    est = read_trajectory_file(os.path.join(fr1_xyz_path, "estimated.txt"))
    gt = read_trajectory_file(os.path.join(fr1_xyz_path, "groundtruth.txt"))
    r = rpe(est, gt, delta=1)
    assert r.trans_rmse < 0.05
    assert r.n_pairs > 700


def test_ate_identity():
    t = np.linspace(0, 10, 50)
    poses = {
        float(ti): np.array([np.sin(ti), np.cos(ti), ti * 0.1, 0, 0, 0, 1])
        for ti in t
    }
    r = ate(poses, poses)
    assert r.rmse < 1e-9


def test_ate_alignment_invariance():
    rng = np.random.default_rng(0)
    t = np.arange(40, dtype=float)
    pts = rng.normal(size=(40, 3))
    gt = {float(ti): np.concatenate([p, [0, 0, 0, 1]]) for ti, p in zip(t, pts)}
    # rotate+translate the whole trajectory: ATE must be ~0 after alignment
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    est = {
        float(ti): np.concatenate([R @ p + np.array([1.0, -2.0, 3.0]), [0, 0, 0, 1]])
        for ti, p in zip(t, pts)
    }
    r = ate(est, gt)
    assert r.rmse < 1e-9


def test_dataset_loader(fr1_xyz_path):
    from supersurfel_fusion_tpu.io.tum import TUMDataset

    ds = TUMDataset(fr1_xyz_path)
    assert len(ds) >= 790
    f = ds.load_frame(0)
    assert f.rgb.shape == (480, 640, 3)
    assert f.depth.shape == (480, 640)
    assert f.rgb.dtype == np.uint8
    valid = f.depth[f.depth > 0]
    assert 0.3 < np.median(valid) < 5.0  # metres
    assert f.gt_pose is not None and f.gt_pose.shape == (7,)
