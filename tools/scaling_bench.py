"""Scaling measurements for the sharded pipeline (BASELINE.md:28, SURVEY §2.3).

Three measurements, each a section of SCALING.md:

1. --mode tpu1   (real chip): steady-state step time of the SHARDED pipeline
   on a D=1 mesh vs the single-device pipeline, full 640x480 fr1 frames.
   Isolates the cost of the shard_map + collective structure itself.
2. --mode cpu    (CPU mesh, --devices 1 2 4 8): step time of the full sharded
   pipeline at VGA shapes over D virtual devices, with per-device model
   capacity held constant (weak scaling in map capacity: D devices own a
   D x larger world). The per-frame work is capacity-independent outside the
   sharded fusion/ICP blocks, so flat step time = the collective/fan-out
   structure does not erode throughput as the map scales out.
3. --mode audit  : compile the sharded step and COUNT the cross-device
   collectives in the optimized HLO (all-reduce / all-gather /
   collective-permute ops and their shapes -> bytes/frame), verifying the
   "a few KB over ICI per frame" claim in pipeline_sharded.py's module doc.

CPU-mesh numbers are a structural proxy (no ICI; XLA:CPU collectives are
memcpys) — honest for "does the design serialize or blow up with D", not for
absolute multi-chip frame rates, which need real multi-chip hardware this
environment does not have.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FR1 = "/root/reference/rgbd_benchmark/rgbd_dataset_freiburg1_xyz"


def _cfg(n_devices: int, per_dev_cap: int = 8192, small: bool = False):
    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        FusionConfig,
        PipelineConfig,
        TPSConfig,
        VOConfig,
    )

    if small:
        # QVGA + reduced iteration counts: identical collective structure
        # (same psum/pmin/all_gather graph), ~10x less per-device arithmetic
        # so an 8-way mesh of virtual CPU devices on a 2-core host finishes
        # in minutes. Used for the D-trend only; absolute times come from
        # the real chip (--mode tpu1).
        return PipelineConfig(
            cam=CameraIntrinsics(fx=262.5, fy=262.5, cx=159.5, cy=119.5,
                                 width=320, height=240),
            tps=TPSConfig(nb_iters=4, nb_samples=8, filter_iter=1,
                          use_pallas=False),
            vo=VOConfig(nb_features=256, nb_levels=4,
                        local_map_capacity=1024),
            fusion=FusionConfig(nb_supersurfels_max=per_dev_cap * n_devices
                                // 4, visible_cap=1024),
        )
    return PipelineConfig(
        cam=CameraIntrinsics.tum_fr1(),
        fusion=FusionConfig(nb_supersurfels_max=per_dev_cap * n_devices,
                            visible_cap=4096),
    )


def _frames(n: int):
    from supersurfel_fusion_tpu.io.tum import TUMDataset

    ds = TUMDataset(FR1)
    return [ds.load_frame_raw(i) for i in range(min(n, len(ds)))]


def _run_sharded(n_devices: int, frames, tag: str, small: bool = False
                 ) -> dict:
    import jax

    from supersurfel_fusion_tpu.parallel.mesh import make_mesh
    from supersurfel_fusion_tpu.parallel.pipeline_sharded import (
        init_sharded_state,
        make_process_frame_sharded,
    )

    cfg = _cfg(n_devices, small=small)
    mesh = make_mesh(n_devices)
    step = make_process_frame_sharded(mesh, cfg)
    state = init_sharded_state(cfg, mesh)

    t0 = time.time()
    state, pose, nb = step(state, frames[0].rgb, frames[0].depth)
    pose.t.block_until_ready()
    t_compile = time.time() - t0

    t0 = time.time()
    for f in frames[1:]:
        state, pose, nb = step(state, f.rgb, f.depth)
    pose.t.block_until_ready()
    dt = (time.time() - t0) / max(len(frames) - 1, 1)
    r = {"tag": tag, "devices": n_devices, "compile_s": round(t_compile, 1),
         "step_ms": round(dt * 1e3, 1), "fps": round(1.0 / dt, 1),
         "model_cap": cfg.fusion.nb_supersurfels_max,
         "nb_total": int(jax.device_get(nb))}
    print(json.dumps(r), flush=True)
    return r


def _run_single(frames, tag: str) -> dict:
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cfg = _cfg(1)
    slam = SupersurfelFusionTPU(cfg)
    t0 = time.time()
    out = slam.process(frames[0].rgb, frames[0].depth, frames[0].timestamp)
    out.pose.t.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    for f in frames[1:]:
        out = slam.process(f.rgb, f.depth, f.timestamp)
    out.pose.t.block_until_ready()
    dt = (time.time() - t0) / max(len(frames) - 1, 1)
    r = {"tag": tag, "devices": 1, "compile_s": round(t_compile, 1),
         "step_ms": round(dt * 1e3, 1), "fps": round(1.0 / dt, 1)}
    print(json.dumps(r), flush=True)
    return r


# shape may be a tuple "(f32[6,6]{1,0}, f32[6]{0})" — match non-greedily up
# to the op name so tuple-shaped all-reduces (the ICP psum) are counted too
_COLL_RE = re.compile(
    r"[%\w][\w.\-]* = (.*?) (all-reduce|all-gather|collective-permute|"
    r"all-to-all|reduce-scatter)(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z]+[0-9]+)\[([0-9,]*)\]")


def _dtype_bytes(d: str) -> int:
    m = re.search(r"(\d+)$", d)
    return (int(m.group(1)) // 8) if m else 4


def _audit(n_devices: int) -> dict:
    from supersurfel_fusion_tpu.parallel.mesh import make_mesh
    from supersurfel_fusion_tpu.parallel.pipeline_sharded import (
        init_sharded_state,
        make_process_frame_sharded,
    )
    import jax

    cfg = _cfg(n_devices)
    mesh = make_mesh(n_devices)
    step = make_process_frame_sharded(mesh, cfg)
    state = init_sharded_state(cfg, mesh)
    rgb = jax.numpy.zeros((cfg.cam.height, cfg.cam.width, 3), "float32")
    depth = jax.numpy.ones((cfg.cam.height, cfg.cam.width), "float32")
    lowered = jax.jit(
        lambda s, r, d: step(s, r, d), donate_argnames=()
    ).lower(state, rgb, depth)
    hlo = lowered.compile().as_text()

    counts: dict = {}
    total_bytes = 0
    for m in _COLL_RE.finditer(hlo):
        shape, op = m.group(1), m.group(2)
        nbytes = 0
        for sm in _SHAPE_RE.finditer(shape):
            dt_b = _dtype_bytes(sm.group(1))
            dims = [int(x) for x in sm.group(2).split(",") if x]
            n = int(np.prod(dims)) if dims else 1
            nbytes += n * dt_b
        key = f"{op} {shape}"
        counts[key] = counts.get(key, 0) + 1
        total_bytes += nbytes
    r = {"devices": n_devices, "collectives": counts,
         "static_collective_bytes": total_bytes,
         "note": ("bytes are per listed op instance; ops inside a while-loop "
                  "body (ICP psum) execute once per GN iteration (<=10)")}
    print(json.dumps(r, indent=1), flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["tpu1", "cpu", "audit"])
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--small", action="store_true",
                    help="--mode cpu: QVGA/reduced config (same collective "
                         "structure) so the virtual-device trend is "
                         "measurable on a 2-core host")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = []
    if args.mode == "tpu1":
        frames = _frames(args.frames)
        results.append(_run_single(frames, "single_device_pipeline"))
        results.append(_run_sharded(1, frames, "sharded_D1"))
    elif args.mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        if args.small:
            from types import SimpleNamespace

            rng = np.random.default_rng(0)
            yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
            # a tilted plane + gentle bumps: every superpixel passes the
            # plane-inlier and size gates, so generation/fusion/ICP all see
            # a realistic populated model
            base_d = (1.5 + 0.4 * xx / 320 + 0.3 * yy / 240
                      + 0.05 * np.sin(xx / 40) * np.sin(yy / 30))
            tex = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
            for _ in range(2):
                tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3.0
            frames = [
                SimpleNamespace(
                    rgb=tex,
                    depth=(base_d * (1.0 + 0.002 * i)).astype(np.float32),
                    timestamp=float(i),
                )
                for i in range(args.frames)
            ]
        else:
            frames = _frames(args.frames)
        for d in args.devices:
            results.append(_run_sharded(d, frames, f"cpu_mesh_D{d}",
                                        small=args.small))
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")
        results.append(_audit(max(args.devices)))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
