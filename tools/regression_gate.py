"""Golden-trajectory regression gate (round-4 verdict #4 / round-5 #2).

The reference ships its own saved trajectories (`estimated.txt`) precisely so
changes can be regressed against them (SURVEY §4.1). This script is the
committed, fast version of that check for this repo: it runs a 300-frame
fr1/xyz probe and a 130-frame fr3/walking_halfsphere probe (combined MOD +
detector) ON THE REAL CHIP, compares ATE / ICP-valid% / fps against the
thresholds below, writes `artifacts/regression_gate.json`, and exits nonzero
on any failure.

Run it before every snapshot:  python tools/regression_gate.py
A one-line config change (round 4's `_CELL = 16`) erased the round-3 headline
with no committed artifact noticing; failing this gate blocks "done".

Thresholds are derived from measured-good runs (see artifacts/
exp1_features.log) with a small margin for run-to-run noise:
  fr1/300: round-3-parity code measures ~0.021-0.023 m, icp_valid 99.7%
  fr3/130: the reference's own window scores 0.0541 m; our accepted state
           must stay at least as good as the best committed measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FR1 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"
FR3 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere"

# ---- thresholds (checked in; update ONLY with a measured justification) ----
FR1_FRAMES = 300
FR1_ATE_MAX = 0.025        # m   (measured good: 0.021-0.023)
FR1_ICP_VALID_MIN = 98.0   # %   (measured good: 99.7)
FR3_FRAMES = 130
FR3_ATE_W126_MAX = 0.16    # m   (measured good: <= 0.15; ref 0.0541)
MIN_FPS = 25.0             # floor on the probe's steady-state rate; the
                           # full-sequence bench measures the real number


def _parse_result(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("RESULT"):
            d = {}
            for tok in line.split()[1:]:
                k, _, v = tok.partition("=")
                d[k] = v
            return d
    return {}


def _run(args: list[str], timeout_s: float = 900.0) -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ate_exp.py"), *args],
        capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
    )
    r = _parse_result(p.stdout)
    r["wall_s"] = round(time.time() - t0, 1)
    if not r or p.returncode != 0:
        r["error"] = (p.stderr or p.stdout)[-400:]
    return r


def main() -> int:
    checks = []

    r1 = _run(["--frames", str(FR1_FRAMES), "--tag", "gate_fr1"])
    ate1 = float(r1.get("ate", "nan"))
    icp1 = float(r1.get("icp_valid", "nan%").rstrip("%"))
    fps1 = float(r1.get("fps", "nan"))
    checks.append(("fr1_ate", ate1, f"<= {FR1_ATE_MAX}", ate1 <= FR1_ATE_MAX))
    checks.append(("fr1_icp_valid", icp1, f">= {FR1_ICP_VALID_MIN}",
                   icp1 >= FR1_ICP_VALID_MIN))
    checks.append(("fr1_fps_floor", round(fps1, 1), f">= {MIN_FPS}",
                   fps1 >= MIN_FPS))

    r3 = _run(["--dataset", FR3, "--frames", str(FR3_FRAMES), "--window",
               "126", "--yolo", "--tag", "gate_fr3"])
    ate3w = float(r3.get("ate_w126", r3.get("ate", "nan")))
    checks.append(("fr3_ate_w126", ate3w, f"<= {FR3_ATE_W126_MAX}",
                   ate3w <= FR3_ATE_W126_MAX))

    ok = all(c[3] for c in checks)
    out = {
        "ok": ok,
        "checks": [
            {"name": n, "value": v, "require": req, "pass": p}
            for n, v, req, p in checks
        ],
        "fr1_raw": r1,
        "fr3_raw": r3,
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    path = os.path.join(REPO, "artifacts", "regression_gate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    for n, v, req, p in checks:
        print(f"{'PASS' if p else 'FAIL'}  {n} = {v}  (require {req})")
    print(f"{'GATE PASS' if ok else 'GATE FAIL'} -> {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
