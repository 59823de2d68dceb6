"""supersurfel_fusion_tpu — a TPU-native dense RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BruceCanovas/supersurfel_fusion (IROS 2020): superpixel-based supersurfel
mapping, dense symmetric ICP odometry, sparse feature VO, moving-object
detection, fern loop closure and deformation-graph map correction — built
TPU-first (static shapes, fused stencil/einsum kernels, on-device
Gauss-Newton, `jax.sharding` scale-out) rather than as a CUDA port.
"""

__version__ = "0.1.0"

from supersurfel_fusion_tpu.config import (
    CameraIntrinsics,
    TPSConfig,
    ICPConfig,
    FusionConfig,
    PipelineConfig,
)

__all__ = [
    "CameraIntrinsics",
    "TPSConfig",
    "ICPConfig",
    "FusionConfig",
    "PipelineConfig",
]
