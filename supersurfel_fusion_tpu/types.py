"""Core pytree containers.

`Supersurfels` is the TPU equivalent of the reference's SoA device store
(`core/include/supersurfel_fusion/supersurfels.hpp:32-93`): fixed-capacity
struct-of-arrays, where validity is encoded in `confidences` (<= 0 means
invalid/dead, exactly like the reference) so every consumer is maskable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Supersurfels(NamedTuple):
    """SoA of oriented Gaussian-ellipse surfels (one per superpixel or model
    slot). All arrays share leading dim N (static capacity)."""

    positions: Array      # (N, 3) float32, world or camera frame
    colors: Array         # (N, 3) float32 RGB 0..255
    stamps: Array         # (N, 2) int32 (birth, last-seen)
    orientations: Array   # (N, 3, 3) float32; rows = (major, minor, normal)
    shapes: Array         # (N, 3, 3) float32 covariance
    dims: Array           # (N, 2) float32 first two eigenvalues
    confidences: Array    # (N,) float32; <= 0 -> invalid

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    @property
    def valid(self) -> Array:
        return self.confidences > 0.0

    @staticmethod
    def empty(n: int) -> "Supersurfels":
        return Supersurfels(
            positions=jnp.zeros((n, 3), jnp.float32),
            colors=jnp.zeros((n, 3), jnp.float32),
            stamps=jnp.zeros((n, 2), jnp.int32),
            orientations=jnp.tile(jnp.eye(3, dtype=jnp.float32), (n, 1, 1)),
            shapes=jnp.zeros((n, 3, 3), jnp.float32),
            dims=jnp.zeros((n, 2), jnp.float32),
            confidences=jnp.full((n,), -1.0, jnp.float32),
        )

    def gather(self, idx: Array) -> "Supersurfels":
        return jax.tree.map(lambda a: a[idx], self)


class ModelState(NamedTuple):
    """Global map state carried across frames."""

    surfels: Supersurfels
    nb_supersurfels: Array   # () int32 — count of live slots (prefix)
    nb_visible: Array        # () int32 — active slots visible last frame


class Pose(NamedTuple):
    """Camera-to-world rigid transform."""

    R: Array   # (3, 3)
    t: Array   # (3,)

    @staticmethod
    def identity() -> "Pose":
        return Pose(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
