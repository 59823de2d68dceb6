"""Feature-stage attribution bench (round-5 fps task).

Times the jitted ORB stage alone (the round-4 throughput suspect,
ops/features.py) on the real chip at 640x480, harris ranking on vs off,
so the fr1 fps regression can be attributed before optimizing. Small
programs -> fast compiles, unlike full-pipeline A/Bs.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.config import VOConfig
from supersurfel_fusion_tpu.ops.features import (
    detect_and_describe,
    fast_scores,
    gaussian_blur,
    harris_response,
)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
    cfg = VOConfig()

    R = {}
    R["fast_scores_L0"] = timeit(
        jax.jit(lambda g: fast_scores(g, 15.0, 5.0)), gray)
    R["harris_L0"] = timeit(jax.jit(harris_response), gray)
    R["gauss_L0"] = timeit(jax.jit(gaussian_blur), gray)

    for harris in (True, False):
        c = dataclasses.replace(cfg, harris_rank=harris)
        f = jax.jit(lambda g, _c=c: detect_and_describe(g, _c))
        R[f"detect_full_harris={int(harris)}"] = timeit(f, gray)

    for k, v in R.items():
        print(f"{k:28s} {v:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
