"""supersurfel_fusion_tpu — a TPU-native dense RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BruceCanovas/supersurfel_fusion (IROS 2020): superpixel-based supersurfel
mapping, dense symmetric ICP odometry, sparse feature VO, moving-object
detection, fern loop closure and deformation-graph map correction — built
TPU-first (static shapes, fused stencil/einsum kernels, on-device
Gauss-Newton, `jax.sharding` scale-out) rather than as a CUDA port.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the full frame pipeline is one large
# program whose first (remote) compile can take minutes; caching the
# serialized executable makes every subsequent process start in seconds.
_cache_dir = _os.environ.get(
    "SSF_TPU_COMPILATION_CACHE", _os.path.expanduser("~/.cache/jax_comp")
)
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # Without this, the Pallas/Mosaic kernel payload embeds the full user
        # call stack (including the entry script's path) in its serialized
        # MLIR locations; strip-debuginfo cannot reach inside that payload, so
        # the cache key changed with every differently-named driver script and
        # the 5-minute pipeline compile was never reused.
        _jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # older jax without these flags
        pass

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
