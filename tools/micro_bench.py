"""Sub-stage microbenchmarks for generate/features/tps building blocks."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1000.0


def main():
    from supersurfel_fusion_tpu.config import PipelineConfig, VOConfig
    from supersurfel_fusion_tpu.ops import tps as tps_ops
    from supersurfel_fusion_tpu.ops.features import (
        _extract_patches,
        _descriptors,
        _orientations,
        _select_level_keypoints,
        fast_scores,
        gaussian_blur,
    )
    from supersurfel_fusion_tpu.utils.color import rgb_to_lab
    from supersurfel_fusion_tpu.utils.geometry import eigh3x3

    cfg = PipelineConfig()
    H, W, cs = 480, 640, 16
    gh, gw = H // cs, W // cs
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    gray = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    labels = jnp.asarray(
        (np.mgrid[0:H, 0:W][0] // cs) * gw + np.mgrid[0:H, 0:W][1] // cs,
        jnp.int32)
    feats13 = jnp.asarray(rng.normal(size=(H, W, 13)), jnp.float32)
    covs = jnp.asarray(rng.normal(size=(1200, 3, 3)), jnp.float32)
    covs = covs @ covs.transpose(0, 2, 1)

    R = {}
    R["rgb_to_lab"] = timeit(jax.jit(rgb_to_lab), rgb)
    R["cell_reduce13"] = timeit(
        jax.jit(lambda f, l: tps_ops.cell_reduce(f, l, gh, gw, cs)),
        feats13, labels)
    code = jnp.zeros((H, W), jnp.int32) + 4
    table = jnp.asarray(rng.normal(size=(gh, gw, 3)), jnp.float32)
    R["lookup_cells3"] = timeit(
        jax.jit(lambda t, c: tps_ops.lookup_cells(t, c, gh, gw, cs)),
        table, code)
    R["eigh3x3_1200"] = timeit(jax.jit(eigh3x3), covs)

    # features sub-parts (level 0)
    R["fast_scores_L0"] = timeit(
        jax.jit(lambda g: fast_scores(g, 15.0, 5.0)), gray)
    R["gauss_blur_L0"] = timeit(jax.jit(gaussian_blur), gray)
    hi, lo, score = jax.jit(lambda g: fast_scores(g, 15.0, 5.0))(gray)
    R["select_L0"] = timeit(
        jax.jit(lambda h, l, s: _select_level_keypoints(h, l, s, 180, 21)),
        hi, lo, score)
    cx, cy, val, valid = jax.jit(
        lambda h, l, s: _select_level_keypoints(h, l, s, 180, 21))(hi, lo, score)
    R["patches_L0"] = timeit(
        jax.jit(_extract_patches), gray, cx, cy)
    patches = jax.jit(_extract_patches)(gray, cx, cy)
    R["orient_L0"] = timeit(jax.jit(_orientations), patches)
    ang = jax.jit(_orientations)(patches)
    R["descr_L0"] = timeit(jax.jit(_descriptors), patches, ang)

    # resize chain (levels 1..7)
    def resize_chain(g):
        outs = []
        for lvl in range(1, 8):
            s = 1.2 ** lvl
            Hl, Wl = max(int(round(H / s)), 43), max(int(round(W / s)), 43)
            outs.append(jnp.sum(jax.image.resize(g, (Hl, Wl), "bilinear")))
        return jnp.stack(outs)
    R["resize_chain_7"] = timeit(jax.jit(resize_chain), gray)

    for k, v in sorted(R.items(), key=lambda kv: -kv[1]):
        print(f"{k:18s} {v:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
