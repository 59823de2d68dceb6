"""RGB <-> CIELab conversion matching the reference's device functions
(`core/include/supersurfel_fusion/vector_math.cuh:543-566` and `:567-587`) so
that the Lab-distance gates (ICP < 20, fusion < 15) keep their meaning.

Inputs/outputs are float arrays with RGB in [0, 255], Lab in the usual
(L in [0,100], a/b roughly [-128,128]) range; channels on the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# numpy (not jnp) module constants: jnp arrays created at import time live on
# the accelerator, so every jit LOWERING must download them to embed their
# bytes — a multi-second blocking sync each through a remote-TPU tunnel.
# numpy constants embed directly and hash deterministically.
_XYZ_FROM_RGB = np.array(
    [
        [0.4124, 0.3575, 0.1805],
        [0.2126, 0.7152, 0.0722],
        [0.0193, 0.1192, 0.9505],
    ],
    dtype=np.float32,
)
_RGB_FROM_XYZ = np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ],
    dtype=np.float32,
)
_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def _srgb_to_linear(c: Array) -> Array:
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c: Array) -> Array:
    return jnp.where(c > 0.0031308, 1.055 * c ** (1.0 / 2.4) - 0.055, 12.92 * c)


def _f(t: Array) -> Array:
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _finv(t: Array) -> Array:
    t3 = t**3
    return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)


def rgb_to_lab(rgb: Array) -> Array:
    lin = _srgb_to_linear(rgb.astype(jnp.float32) / 255.0)
    xyz = jnp.einsum("ij,...j->...i", _XYZ_FROM_RGB, lin) / _WHITE
    fx, fy, fz = _f(xyz[..., 0]), _f(xyz[..., 1]), _f(xyz[..., 2])
    return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1)


def lab_to_rgb(lab: Array) -> Array:
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = lab[..., 1] / 500.0 + fy
    fz = fy - lab[..., 2] / 200.0
    xyz = jnp.stack([_finv(fx), _finv(fy), _finv(fz)], axis=-1) * _WHITE
    lin = jnp.einsum("ij,...j->...i", _RGB_FROM_XYZ, xyz)
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0) * 255.0


def rgb_to_gray(rgb: Array) -> Array:
    """Luma matching OpenCV's RGB2GRAY (used for feature extraction/flow)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.einsum("...c,c->...", rgb.astype(jnp.float32), w)
