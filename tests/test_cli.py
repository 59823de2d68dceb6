"""Subprocess smoke tests for the benchmark CLI default path.

Round-2 verdict: the documented default invocation (no --quiet/--stats)
crashed with a NameError after processing every frame and before writing the
trajectory (apps/run_benchmark.py post-run stats block). These tests run the
actual CLI in a subprocess so a module-level or default-path regression can't
hide behind in-process imports.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "-m", "supersurfel_fusion_tpu.apps.run_benchmark",
         *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, f"CLI failed:\n{out.stdout}\n{out.stderr}"
    # last stdout line is the result JSON
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    return json.loads(lines[-1]), out.stdout


@pytest.mark.slow
def test_default_invocation_completes(fr1_xyz_path, tmp_path):
    """Default flags (non-quiet, non-stats): the round-2 crash path."""
    traj = tmp_path / "est.txt"
    result, stdout = _run_cli(
        ["--dataset", fr1_xyz_path, "--max-frames", "5", "--cpu",
         "--out", str(traj)],
        tmp_path,
    )
    assert result["frames"] == 5
    assert traj.exists()
    assert len(traj.read_text().strip().splitlines()) == 5
    # the buffered post-run stats block must have printed
    assert "icp_valid=" in stdout


@pytest.mark.slow
def test_live_runner_consumes_stream(fr1_xyz_path, tmp_path):
    """Feed 5 frames into a watch dir, run the live node equivalent."""
    live = tmp_path / "live"
    traj = tmp_path / "live_traj.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    feeder = subprocess.run(
        [sys.executable, "tools/stream_feeder.py", "--dataset", fr1_xyz_path,
         "--target", str(live), "--fps", "100", "--max-frames", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert feeder.returncode == 0, feeder.stderr
    out = subprocess.run(
        [sys.executable, "-m", "supersurfel_fusion_tpu.apps.run_live",
         "--watch", str(live), "--out", str(traj), "--cpu",
         "--idle-timeout", "3", "--quiet"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["frames"] == 5
    lines = traj.read_text().strip().splitlines()
    assert len(lines) == 5
    # stamps must be in order (stream was associated + sorted)
    stamps = [float(ln.split()[0]) for ln in lines]
    assert stamps == sorted(stamps)


@pytest.mark.slow
def test_loop_closure_invocation_reports_lc(fr1_xyz_path, tmp_path):
    traj = tmp_path / "est_lc.txt"
    result, _ = _run_cli(
        ["--dataset", fr1_xyz_path, "--max-frames", "5", "--cpu",
         "--loop-closure", "--quiet", "--out", str(traj)],
        tmp_path,
    )
    assert "lc_count" in result
    assert "keyframes" in result
    assert result["keyframes"] >= 1  # frame 0 always becomes a keyframe
