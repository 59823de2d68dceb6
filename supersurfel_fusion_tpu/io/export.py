"""Model export, local point-cloud extraction and checkpoint/resume.

* `export_model`: text format byte-compatible with the reference's
  `SupersurfelFusion::exportModel` (`core/src/supersurfel_fusion.cu:595-633`)
  so downstream tooling can consume either.
* `export_model_ply`: the same surfels as a standard PLY point cloud with
  normals + colors (positions only — a friendlier interchange format).
* `extract_local_point_cloud`: TPU equivalent of
  `extractLocalPointCloudKernel` (`supersurfel_fusion_kernels.cu:490-520`).
* `save_checkpoint` / `load_checkpoint`: full SLAM-state persistence with
  orbax — the elastic-resume capability the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from supersurfel_fusion_tpu.types import Supersurfels

Array = jax.Array


def export_model(path: str, model: Supersurfels, nb_supersurfels: int,
                 conf_thresh: float) -> int:
    """Write surfels with confidence > conf_thresh in the reference's text
    layout: per surfel 6 lines (stamps+conf / position / color / dims /
    orientation 9 / shape upper-tri 6) + blank. Returns #exported."""
    n = int(nb_supersurfels)
    pos = np.asarray(model.positions[:n])
    ori = np.asarray(model.orientations[:n])
    shp = np.asarray(model.shapes[:n])
    dims = np.asarray(model.dims[:n])
    conf = np.asarray(model.confidences[:n])
    col = np.asarray(model.colors[:n])
    stamps = np.asarray(model.stamps[:n])

    count = 0
    with open(path, "w") as f:
        for i in range(n):
            if conf[i] > conf_thresh:
                f.write(f"{stamps[i, 0]} {stamps[i, 1]} {conf[i]:.6f}\n")
                f.write(f"{pos[i, 0]:.6f} {pos[i, 1]:.6f} {pos[i, 2]:.6f}\n")
                f.write(f"{col[i, 0]:.6f} {col[i, 1]:.6f} {col[i, 2]:.6f}\n")
                f.write(f"{dims[i, 0]:.6f} {dims[i, 1]:.6f}\n")
                f.write(" ".join(f"{v:.6f}" for v in ori[i].reshape(-1)) + "\n")
                f.write(
                    f"{shp[i, 0, 0]:.6f} {shp[i, 0, 1]:.6f} {shp[i, 0, 2]:.6f} "
                    f"{shp[i, 1, 1]:.6f} {shp[i, 1, 2]:.6f} {shp[i, 2, 2]:.6f}\n"
                )
                f.write("\n")
                count += 1
    return count


def export_model_ply(path: str, model: Supersurfels, nb_supersurfels: int,
                     conf_thresh: float = 0.0) -> int:
    """Surfel centres as a PLY point cloud with normals + RGB."""
    n = int(nb_supersurfels)
    conf = np.asarray(model.confidences[:n])
    keep = conf > conf_thresh
    pos = np.asarray(model.positions[:n])[keep]
    nrm = np.asarray(model.orientations[:n, 2, :])[keep]
    col = np.clip(np.asarray(model.colors[:n])[keep], 0, 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pos)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, nv, c in zip(pos, nrm, col):
            f.write(
                f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                f"{nv[0]:.4f} {nv[1]:.4f} {nv[2]:.4f} "
                f"{c[0]} {c[1]} {c[2]}\n"
            )
    return len(pos)


def extract_local_point_cloud(model: Supersurfels, nb_supersurfels: Array,
                              R: Array, t: Array, conf_thresh: float,
                              radius: float):
    """Confident surfels within `radius` of the camera, in camera frame.
    Returns (positions (C,3), normals (C,3), mask (C,)) — fixed shape with a
    validity mask instead of the reference's compacted output."""
    ids = jnp.arange(model.capacity, dtype=jnp.int32)
    Rv = R.T
    tv = -(Rv @ t)
    p = model.positions @ Rv.T + tv
    nrm = model.orientations[:, 2, :] @ Rv.T
    ok = (
        (ids < nb_supersurfels)
        & (model.confidences >= conf_thresh)
        & (jnp.linalg.norm(p, axis=-1) < radius)
    )
    return p, nrm, ok


# ---------------------------------------------------------------------------
# Checkpoint / resume (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state, step: Optional[int] = None) -> str:
    """Persist a full SLAMState pytree. Returns the checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template):
    """Restore a SLAMState saved by `save_checkpoint`; `template` is a state
    with the right structure/shapes (e.g. `init_state(cfg)`)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
