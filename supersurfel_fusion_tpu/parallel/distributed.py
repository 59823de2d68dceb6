"""Multi-host bring-up for the distributed layer.

The reference is a single-process system; multi-host execution is introduced
here (SURVEY.md §2.3, §5 "distributed communication backend"). JAX handles
the transport: ICI collectives inside a slice, DCN across hosts — the code
only needs `jax.distributed.initialize` before any device access, then the
same `Mesh`/`shard_map` programs in parallel/{mesh,sharding,ba,
pipeline_sharded}.py run unchanged with `jax.devices()` spanning all hosts.
"""

from __future__ import annotations

import os

import jax


def initialize_from_env() -> bool:
    """Initialize `jax.distributed` from standard environment variables.

    Reads (in order of preference):
      * JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
        explicit contract;
      * else falls back to jax.distributed.initialize()'s own auto-detection
        (TPU pods, Slurm, GKE all provide it).

    Returns True if a multi-process runtime was initialized; False when the
    environment describes a single process (the caller should proceed
    single-host). Safe to call twice.
    """
    if getattr(initialize_from_env, "_done", False):
        return initialize_from_env._done > 1

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    multi = False
    if addr and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
        multi = True
    elif os.environ.get("JAX_AUTO_DISTRIBUTED", ""):
        # TPU-pod / cluster auto-detection
        jax.distributed.initialize()
        multi = jax.process_count() > 1
    initialize_from_env._done = 2 if multi else 1
    return multi


def global_mesh(axis: str = "map"):
    """A 1-D mesh over every addressable device on every host."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
