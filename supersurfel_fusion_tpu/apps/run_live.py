"""Live/streaming SLAM runner (the reference's live sensor node, ROS-free).

TPU-native equivalent of `supersurfel_fusion_node`
(`node/supersurfel_fusion_node.cpp:74-196, 304-716`): consumes an UNBOUNDED,
incrementally-arriving stream of synchronized RGB-D frames, publishes the
pose online, and periodically emits the node's visualization surfaces
(superpixel image, slanted-plane depth, MOD mask, rendered model) as files.
Where the reference subscribes to ROS image topics with an ApproximateTime
synchronizer, this runner supports two transports:

* ``--watch DIR``: poll a directory laid out like a TUM sequence
  (``rgb/<stamp>.png`` + ``depth/<stamp>.png``) that another process is
  filling (a camera driver, a network receiver, ...). New rgb/depth files
  are associated by closest timestamp (<= 0.02 s, the ApproximateTime
  policy's contract) and processed in stamp order as they appear.
* ``--stdin``: read lines ``<rgb_path> <depth_path> [timestamp]`` from
  stdin — composable with any producer via a pipe; EOF ends the stream.

Online outputs:
* pose stream: TUM-format lines appended (and flushed) to ``--out`` per
  frame — the /vo + /trajectory topics;
* ``--render-every N``: visualization PNGs under ``--render-dir`` — the
  /superpixels, /slanted_plane, /mod_mask and model marker topics;
* final model export with ``--save-model`` (reference: shutdown save,
  `supersurfel_fusion_node.cpp:718-724`).

Demo (replay fr1 as a live stream):
  python tools/stream_feeder.py --dataset .../rgbd_dataset_freiburg1_xyz \
      --target /tmp/live --fps 30 &
  python -m supersurfel_fusion_tpu.apps.run_live --watch /tmp/live \
      --out /tmp/live_traj.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_png_pair(rgb_path: str, depth_path: str):
    from PIL import Image

    rgb = np.asarray(Image.open(rgb_path), dtype=np.uint8)[..., :3]
    depth = np.ascontiguousarray(
        np.asarray(Image.open(depth_path)).astype(np.uint16)
    )
    return rgb, depth


def _stamp_of(fname: str) -> float:
    try:
        return float(os.path.splitext(os.path.basename(fname))[0])
    except ValueError:
        return -1.0


class DirectoryStream:
    """Poll `root`/rgb + `root`/depth for new frames; associate by closest
    timestamp (<=max_dt) and yield them in stamp order. A frame pair is only
    consumed once both files have stopped growing (size stable across polls),
    so partially-written PNGs are never decoded."""

    def __init__(self, root: str, max_dt: float = 0.02,
                 poll_interval: float = 0.05, idle_timeout: float = 10.0):
        self.rgb_dir = os.path.join(root, "rgb")
        self.depth_dir = os.path.join(root, "depth")
        self.max_dt = max_dt
        self.poll = poll_interval
        self.idle_timeout = idle_timeout
        self._seen_rgb: dict[float, str] = {}
        self._seen_depth: dict[float, str] = {}
        self._done_rgb: set[float] = set()
        self._done_depth: set[float] = set()
        self._sizes: dict[str, int] = {}

    def _scan(self, d: str, seen: dict, done: set) -> bool:
        new = False
        if not os.path.isdir(d):
            return False
        for f in os.listdir(d):
            path = os.path.join(d, f)
            ts = _stamp_of(f)
            if ts < 0 or ts in done or ts in seen:
                # size-stability check for frames seen but not yet stable
                continue
            seen[ts] = path
            new = True
        return new

    def _stable(self, path: str) -> bool:
        try:
            sz = os.path.getsize(path)
        except OSError:
            return False
        prev = self._sizes.get(path)
        self._sizes[path] = sz
        return prev == sz and sz > 0

    def __iter__(self):
        last_new = time.time()
        while True:
            self._scan(self.rgb_dir, self._seen_rgb, self._done_rgb)
            self._scan(self.depth_dir, self._seen_depth, self._done_depth)
            # pair the oldest stable rgb with the closest stable depth
            emitted = False
            for rts in sorted(self._seen_rgb):
                rpath = self._seen_rgb[rts]
                if not self._stable(rpath):
                    continue
                cands = [
                    (abs(rts - dts), dts) for dts in self._seen_depth
                    if abs(rts - dts) <= self.max_dt
                ]
                if not cands:
                    continue
                _, dts = min(cands)
                dpath = self._seen_depth[dts]
                if not self._stable(dpath):
                    continue
                del self._seen_rgb[rts]
                del self._seen_depth[dts]
                self._done_rgb.add(rts)
                self._done_depth.add(dts)
                last_new = time.time()
                emitted = True
                yield rts, rpath, dpath
            if not emitted:
                if time.time() - last_new > self.idle_timeout:
                    return
                time.sleep(self.poll)


def stdin_stream():
    for line in sys.stdin:
        parts = line.split()
        if not parts or parts[0].startswith("#"):
            continue
        if len(parts) < 2:
            continue
        ts = float(parts[2]) if len(parts) > 2 else _stamp_of(parts[0])
        yield ts, parts[0], parts[1]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--watch", metavar="DIR",
                     help="poll DIR/rgb + DIR/depth for new frames")
    src.add_argument("--stdin", action="store_true",
                     help="read '<rgb> <depth> [stamp]' lines from stdin")
    ap.add_argument("--out", default="/tmp/live_trajectory.txt",
                    help="pose stream (TUM format, appended per frame)")
    ap.add_argument("--cam", default="fr1", choices=["fr1", "fr2", "fr3"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--depth-scale", type=float, default=1.0 / 5000.0)
    ap.add_argument("--mod", action="store_true")
    ap.add_argument("--yolo", action="store_true",
                    help="combined MOD with the person detector "
                         "(needs --weights)")
    ap.add_argument("--weights", default="weights/person_detector.npz",
                    help="person-detector .npz checkpoint for --yolo")
    ap.add_argument("--loop-closure", action="store_true")
    ap.add_argument("--idle-timeout", type=float, default=10.0,
                    help="--watch: end the stream after this many seconds "
                         "with no new frames")
    ap.add_argument("--render-every", type=int, default=0,
                    help="write visualization PNGs every N frames")
    ap.add_argument("--render-dir", default="/tmp/live_render")
    ap.add_argument("--save-model", default=None)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from supersurfel_fusion_tpu.config import (
        CameraIntrinsics,
        FernsConfig,
        MODConfig,
        PipelineConfig,
    )
    from supersurfel_fusion_tpu.pipeline import SupersurfelFusionTPU

    cam = {
        "fr1": CameraIntrinsics.tum_fr1,
        "fr2": CameraIntrinsics.tum_fr2,
        "fr3": CameraIntrinsics.tum_fr3,
    }[args.cam]()
    weights = (args.weights
               if args.yolo and os.path.exists(args.weights) else "")
    if args.yolo and not weights and not args.quiet:
        print(f"--yolo: weights {args.weights} not found; running the "
              "simple MOD path", file=sys.stderr, flush=True)
    cfg = PipelineConfig(
        cam=cam,
        depth_scale=args.depth_scale,
        mod=MODConfig(enabled=args.mod or args.yolo, use_yolo=bool(weights),
                      weights_path=weights),
        enable_loop_closure=args.loop_closure,
    )
    if args.loop_closure:
        cfg = dataclasses.replace(cfg, ferns=FernsConfig(enabled=True))

    slam = SupersurfelFusionTPU(cfg)

    stream = (
        DirectoryStream(args.watch, idle_timeout=args.idle_timeout)
        if args.watch else stdin_stream()
    )

    if args.render_every:
        os.makedirs(args.render_dir, exist_ok=True)

    n = 0
    t0 = None
    with open(args.out, "w") as traj:
        for ts, rgb_path, depth_path in stream:
            try:
                rgb, depth = _load_png_pair(rgb_path, depth_path)
            except Exception as e:
                print(f"skipping unreadable frame {rgb_path}: {e}",
                      file=sys.stderr, flush=True)
                continue
            out = slam.process(rgb, depth, ts)
            # online pose: this DOES force a device sync per frame — the
            # price of a live pose topic; the offline runner batches instead
            p = SupersurfelFusionTPU.pose_tum(out.pose)
            traj.write(f"{ts:.6f} " + " ".join(f"{v:.6f}" for v in p) + "\n")
            traj.flush()
            if n == 0:
                t0 = time.time()
            n += 1
            if not args.quiet and n % 30 == 0:
                fps = (n - 1) / max(time.time() - t0, 1e-9)
                print(f"frame {n} stamp={ts:.3f} "
                      f"t=[{p[0]:.3f} {p[1]:.3f} {p[2]:.3f}] "
                      f"({fps:.1f} fps)", flush=True)
            if args.render_every and n % args.render_every == 0:
                from supersurfel_fusion_tpu.viz import render as rv

                labels = np.asarray(out.labels)
                rv.save_png(
                    os.path.join(args.render_dir, f"superpixels_{n:05d}.png"),
                    rv.superpixel_image(rgb, labels))
                rv.save_png(
                    os.path.join(args.render_dir, f"slanted_{n:05d}.png"),
                    rv.slanted_plane_image(np.asarray(out.plane_depth)))
                if cfg.mod.enabled:
                    rv.save_png(
                        os.path.join(args.render_dir, f"mod_{n:05d}.png"),
                        rv.mod_mask_image(labels, np.asarray(out.static_sp)))
                st = slam.state
                rv.save_png(
                    os.path.join(args.render_dir, f"model_{n:05d}.png"),
                    rv.model_image(
                        np.asarray(st.model.surfels.positions),
                        np.asarray(st.model.surfels.colors),
                        np.asarray(st.model.surfels.dims),
                        np.asarray(st.model.surfels.confidences),
                        int(st.model.nb_supersurfels),
                        np.asarray(out.pose.R), np.asarray(out.pose.t),
                        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                    ))

    if args.save_model and n:
        from supersurfel_fusion_tpu.io.export import export_model

        st = slam.state
        export_model(args.save_model, st.model.surfels,
                     int(st.model.nb_supersurfels), cfg.conf_thresh)

    fps = (n - 1) / max(time.time() - t0, 1e-9) if n > 1 else 0.0
    print(json.dumps({"frames": n, "fps": round(fps, 2),
                      "trajectory": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
