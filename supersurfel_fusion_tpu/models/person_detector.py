"""Person detection for semantics-assisted MOD.

The reference optionally runs tiny-YOLOv4 through vendored darknet
(`motion_detection.cu:156-178`; the weights blob is absent from its repo —
`.MISSING_LARGE_BLOBS`). The TPU equivalent is a small anchor-free
fully-convolutional detector (CenterNet-style: stride-16 heatmap + box size),
expressed in pure jnp so it runs inside the jitted pipeline.

Without trained weights the detector stays disabled (the shipped reference is
in the same position); `load_params` accepts an .npz checkpoint, and
`init_params` provides the randomly-initialized structure for training or
distillation. The MOD integration consumes only `detect -> boxes`, so any
person detector honouring that contract can be swapped in.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (out_channels, stride) per stage; input is grayscale+depth (2 channels)
_STAGES = [(16, 2), (32, 2), (64, 2), (96, 2)]
_HEAD_CH = 96


class Detections(NamedTuple):
    boxes: Array    # (K, 4) x0, y0, x1, y1 (pixels)
    scores: Array   # (K,)
    valid: Array    # (K,)


def init_params(key=None, in_ch: int = 2) -> dict:
    key = jax.random.PRNGKey(0) if key is None else key
    params = {}
    c_in = in_ch
    for i, (c_out, _) in enumerate(_STAGES):
        key, k1 = jax.random.split(key)
        params[f"conv{i}_w"] = (
            jax.random.normal(k1, (3, 3, c_in, c_out)) * np.sqrt(2.0 / (9 * c_in))
        ).astype(jnp.float32)
        params[f"conv{i}_b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
    key, k1, k2 = jax.random.split(key, 3)
    params["heat_w"] = (
        jax.random.normal(k1, (3, 3, _HEAD_CH, 1)) * 0.01
    ).astype(jnp.float32)
    params["heat_b"] = jnp.full((1,), -4.0, jnp.float32)  # low prior
    params["size_w"] = (
        jax.random.normal(k2, (3, 3, _HEAD_CH, 2)) * 0.01
    ).astype(jnp.float32)
    params["size_b"] = jnp.zeros((2,), jnp.float32)
    return params


def load_params(path: str) -> dict:
    """Load checkpoint params; `label_*` keys are training-label provenance
    metadata (strings/ints recorded by tools/train_person_detector.py), not
    network parameters."""
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files
            if not k.startswith("label_")}


def _conv(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return jax.nn.relu(y + b)


def detect(params: dict, gray: Array, depth: Array, max_det: int = 8,
           score_thresh: float = 0.3) -> Detections:
    """Run the detector: returns up to `max_det` person boxes."""
    H, W = gray.shape
    x = jnp.stack([gray / 255.0, jnp.clip(depth, 0, 5.0) / 5.0], axis=-1)
    for i, (_, s) in enumerate(_STAGES):
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], s)
    heat = jax.nn.sigmoid(
        jax.lax.conv_general_dilated(
            x[None], params["heat_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, ..., 0]
        + params["heat_b"][0]
    )
    size = jax.lax.conv_general_dilated(
        x[None], params["size_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + params["size_b"]

    # 3x3 NMS + top-k peaks
    from supersurfel_fusion_tpu.ops.depth import shift2d

    is_peak = jnp.ones_like(heat, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            is_peak &= heat >= shift2d(heat, dy, dx, fill=0.0)
    scores = jnp.where(is_peak, heat, 0.0).reshape(-1)
    top_s, top_i = jax.lax.top_k(scores, max_det)
    hh, ww = heat.shape
    cy = (top_i // ww).astype(jnp.float32)
    cx = (top_i % ww).astype(jnp.float32)
    stride = H / hh
    bw = jnp.abs(size.reshape(-1, 2)[top_i, 0]) * stride
    bh = jnp.abs(size.reshape(-1, 2)[top_i, 1]) * stride
    x0 = cx * stride - bw / 2
    y0 = cy * stride - bh / 2
    boxes = jnp.stack([x0, y0, x0 + bw, y0 + bh], axis=-1)
    return Detections(
        boxes=boxes, scores=top_s, valid=top_s > score_thresh
    )
