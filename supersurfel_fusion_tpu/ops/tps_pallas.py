"""Pallas TPU kernel for the TPS superpixel iteration loop.

The XLA formulation (ops/tps.py) streams ~50 full-resolution intermediates
through HBM per checkerboard phase; this kernel keeps the ENTIRE segmentation
state resident in VMEM across all phases of an invocation:

  labels (int32), inliers (f32), the per-pixel stat image S (bfloat16,
  cell-relative encodings so bf16 stays exact), and the (9, GH, GW) stats
  table (f32) — plus the rgb/disp inputs.

Per iteration the kernel runs 4 masked checkerboard phase updates (pure VPU
stencils) and one merge: per-(cell, code) feature sums are computed as
A @ (mask * feature) @ B matmul poolings on the MXU (A/B are constant block
aggregation matrices), the disparity plane is refit per superpixel with a
closed-form 3x3 solve, and the stat image is rebuilt from the new table by
masked broadcast upsampling.

bf16-exactness encodings in S:
* centroids are stored RELATIVE to the label's cell centre (|.| <= ~24 px);
* the plane is (theta_a, theta_b, dp0) with dp0 the disparity at the label's
  cell centre; absolute values are reconstructed per pixel from the label id
  (integer arithmetic), so the 8-bit mantissa never sees 640-scale values.
The merge/fit accumulates in f32 on the MXU.

`run_iterations` is invoked twice per frame (RGB-only iterations, then —
after the XLA-side RANSAC plane init — RGBD iterations), mirroring
TPS_RGBD::compute (core/src/TPS_RGBD.cu:101-478).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersurfel_fusion_tpu.config import TPSConfig
from supersurfel_fusion_tpu.ops import tps as tps_ref

Array = jax.Array

_PHASES = tps_ref._PHASES
_NEIGH4 = tps_ref._NEIGH4
_OFFS = tps_ref._OFFS  # 3x3 cell-offset codes

NF = 9  # stat channels: cxr cyr r g b n ta tb dp0


def _pool_mats(H: int, W: int, cs: int):
    """A (GH, H) and B (W, GW) block-sum matrices (f32)."""
    gh, gw = H // cs, W // cs
    A = np.kron(np.eye(gh, dtype=np.float32), np.ones((1, cs), np.float32))
    B = np.kron(np.eye(gw, dtype=np.float32), np.ones((cs, 1), np.float32))
    return jnp.asarray(A), jnp.asarray(B)


def _roll2(x, dy: int, dx: int):
    """out[y, x] = in[y+dy, x+dx] circularly."""
    out = x
    if dy:
        out = jnp.roll(out, -dy, 0)
    if dx:
        out = jnp.roll(out, -dx, 1)
    return out


def _edge_mask_i32(H, W, dy: int, dx: int):
    """0/1 int32 mask of pixels whose (y+dy, x+dx) neighbour is in-image.

    Built with pure integer clip arithmetic — NO boolean vectors. Mosaic
    hoists loop-invariant values out of fori_loops and cannot round-trip an
    i1 vector through the loop boundary (stored as i8, trunci unsupported),
    so loop-invariant masks must never be i1.
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    m = jnp.ones((H, W), jnp.int32)
    if dy > 0:
        m = m * jnp.clip(H - dy - y, 0, 1)
    if dy < 0:
        m = m * jnp.clip(y + dy + 1, 0, 1)
    if dx > 0:
        m = m * jnp.clip(W - dx - x, 0, 1)
    if dx < 0:
        m = m * jnp.clip(x + dx + 1, 0, 1)
    return m


def _shift_i(img, dy, dx, H, W, fill):
    """Shift with fill, as arithmetic select (no boolean intermediates)."""
    m = _edge_mask_i32(H, W, dy, dx)
    rolled = _roll2(img, dy, dx)
    if img.dtype == jnp.int32:
        return rolled * m + jnp.int32(fill) * (1 - m)
    mf = m.astype(img.dtype)
    return rolled * mf + jnp.asarray(fill, img.dtype) * (1 - mf)


def _upsample(t, At, Bt):
    """(GH, GW) -> (H, W) block upsample as two matmuls (MXU; Mosaic has no
    general repeat/reshape): At (H, GH), Bt (GW, W) are 0/1 expanders."""
    u = jnp.dot(At, t, preferred_element_type=jnp.float32)
    return jnp.dot(u, Bt, preferred_element_type=jnp.float32)


def _make_kernel(H: int, W: int, cs: int, n_iters: int, use_disp: bool,
                 cfg: TPSConfig):
    gh, gw = H // cs, W // cs
    min_size = cs * cs / 4.0
    lam_pos, lam_b, lam_s = cfg.lambda_pos, cfg.lambda_bound, cfg.lambda_size
    lam_d, thr_d = cfg.lambda_disp, cfg.thresh_disp
    half = (cs - 1) * 0.5

    def kernel(rgb_ref, disp_ref, dval_ref, A_ref, B_ref, At_ref, Bt_ref,
               li_ref, ii_ref, ti_ref,
               labels_io, inl_io, table_io, S_scr):
        # li/ii/ti are the aliased input views of labels/inl/table; all
        # reads and writes go through the output refs. The body is written
        # for MINIMAL VMEM liveness: stats are streamed channel-by-channel,
        # the winning candidate is tracked as an index (not a stat copy),
        # and masks are recomputed from the label image instead of cached.
        del li_ref, ii_ref, ti_ref
        y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        yf = y.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        gyp = y // cs
        gxp = x // cs
        disp = disp_ref[:]        # pre-zeroed where invalid
        dval = dval_ref[:]        # 1.0 where depth valid
        A = A_ref[:]
        B = B_ref[:]
        At = At_ref[:]
        Bt = Bt_ref[:]

        gx0_t = (jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
                 * cs).astype(jnp.float32) + half
        gy0_t = (jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
                 * cs).astype(jnp.float32) + half

        def pool(img):
            t = jnp.dot(A, img, preferred_element_type=jnp.float32)
            return jnp.dot(t, B, preferred_element_type=jnp.float32)

        def rebuild_S():
            labels = labels_io[:]
            gyl = labels // gw
            gxl = labels % gw
            cx0 = (gxl * cs).astype(jnp.float32) + half
            cy0 = (gyl * cs).astype(jnp.float32) + half

            def up_sel(ch):
                acc = jnp.zeros((H, W), jnp.float32)
                for k, (dy, dx) in enumerate(_OFFS):
                    sel = (gyl == gyp + dy) & (gxl == gxp + dx)
                    tks = _shift_i(table_io[ch], dy, dx, gh, gw, 0.0)
                    acc = jnp.where(sel, _upsample(tks, At, Bt), acc)
                return acc

            S_scr[0] = (up_sel(0) - cx0).astype(jnp.bfloat16)
            S_scr[1] = (up_sel(1) - cy0).astype(jnp.bfloat16)
            for ch in range(2, 8):
                S_scr[ch] = up_sel(ch).astype(jnp.bfloat16)
            dp0 = up_sel(6) * cx0 + up_sel(7) * cy0 + up_sel(8)
            S_scr[8] = dp0.astype(jnp.bfloat16)

        def merge():
            labels = labels_io[:]
            gyl = labels // gw
            gxl = labels % gw
            cx0 = (gxl * cs).astype(jnp.float32) + half
            cy0 = (gyl * cs).astype(jnp.float32) + half

            def reduce_feat(make_feat):
                acc = jnp.zeros((gh, gw), jnp.float32)
                for k, (dy, dx) in enumerate(_OFFS):
                    sel = (gyl == gyp + dy) & (gxl == gxp + dx)
                    part = pool(jnp.where(sel, make_feat(), 0.0))
                    acc = acc + _shift_i(part, -dy, -dx, gh, gw, 0.0)
                return acc

            n = reduce_feat(lambda: jnp.ones((H, W), jnp.float32))
            safe_n = jnp.maximum(n, 1e-6)
            table_io[0] = reduce_feat(lambda: xf) / safe_n
            table_io[1] = reduce_feat(lambda: yf) / safe_n
            table_io[2] = reduce_feat(lambda: rgb_ref[0]) / safe_n
            table_io[3] = reduce_feat(lambda: rgb_ref[1]) / safe_n
            table_io[4] = reduce_feat(lambda: rgb_ref[2]) / safe_n
            table_io[5] = n

            if use_disp:
                def wf(f):
                    # inliers are stored as 0/1 f32; validity is arithmetic
                    return lambda: inl_io[:] * dval * f()

                xl = lambda: xf - cx0
                yl = lambda: yf - cy0
                dz = lambda: disp
                dn = reduce_feat(wf(lambda: jnp.ones((H, W), jnp.float32)))
                dx_ = reduce_feat(wf(xl))
                dy_ = reduce_feat(wf(yl))
                dxx = reduce_feat(wf(lambda: xl() * xl()))
                dyy = reduce_feat(wf(lambda: yl() * yl()))
                dxy = reduce_feat(wf(lambda: xl() * yl()))
                dd = reduce_feat(wf(dz))
                dxd = reduce_feat(wf(lambda: xl() * dz()))
                dyd = reduce_feat(wf(lambda: yl() * dz()))

                a00, a01, a02 = dxx, dxy, dx_
                a11, a12, a22 = dyy, dy_, dn
                c00 = a11 * a22 - a12 * a12
                c01 = a12 * a02 - a01 * a22
                c02 = a01 * a12 - a02 * a11
                det = a00 * c00 + a01 * c01 + a02 * c02
                ok = jnp.abs(det) > 1e-12
                sdet = jnp.where(ok, det, 1.0)
                c11 = a00 * a22 - a02 * a02
                c12 = a01 * a02 - a00 * a12
                c22 = a00 * a11 - a01 * a01
                ta = (c00 * dxd + c01 * dyd + c02 * dd) / sdet
                tb = (c01 * dxd + c11 * dyd + c12 * dd) / sdet
                tcl = (c02 * dxd + c12 * dyd + c22 * dd) / sdet
                tc_abs = tcl - ta * gx0_t - tb * gy0_t
                table_io[6] = jnp.where(ok, ta, 0.0)
                table_io[7] = jnp.where(ok, tb, 0.0)
                table_io[8] = jnp.where(ok, tc_abs, -1e30)

        def cand_energy(dy, dx, lab):
            """Energy/inlier for adopting the label of pixel (y+dy, x+dx);
            (0, 0) means the pixel's own label. Streams S channels."""
            own = dy == 0 and dx == 0

            def S_at(ch):
                v = S_scr[ch].astype(jnp.float32)
                if own:
                    return v
                return _shift_i(v, dy, dx, H, W, 0.0)

            gxl = lab % gw
            gyl = lab // gw
            cx0 = (gxl * cs).astype(jnp.float32) + half
            cy0 = (gyl * cs).astype(jnp.float32) + half

            n = S_at(5)
            if own:
                s = n / jnp.maximum(n - 1.0, 1e-6)
                dsize = n - min_size
            else:
                s = 1.0
                dsize = n + 1.0 - min_size
            dxp = ((xf - cx0) - S_at(0)) * s
            dyp = ((yf - cy0) - S_at(1)) * s
            E = lam_pos * (dxp * dxp + dyp * dyp) \
                - lam_s * jnp.minimum(dsize, 0.0)
            dr = (rgb_ref[0] - S_at(2)) * s
            E = E + dr * dr
            dg = (rgb_ref[1] - S_at(3)) * s
            E = E + dg * dg
            db = (rgb_ref[2] - S_at(4)) * s
            E = E + db * db
            inl = None
            if use_disp:
                dp = S_at(8) + S_at(6) * (xf - cx0) + S_at(7) * (yf - cy0)
                # invalid depth -> huge effective error -> fails the gate
                e = (dp - disp) ** 2 + (1.0 - dval) * 1e9
                good = (e <= thr_d) & (dp > 0.0)
                E = E + lam_d * jnp.where(good, e, thr_d)
                # keep the inlier bit as f32: Mosaic cannot select between
                # i1 vectors (it widens to i8 and fails the trunci back)
                inl = good.astype(jnp.float32)
            return E, inl

        def phase(off_x, off_y):
            labels = labels_io[:]

            bounds = jnp.zeros((H, W), jnp.int32)
            for dy, dx in _NEIGH4:
                bounds += (_shift_i(labels, dy, dx, H, W, -1)
                           != labels).astype(jnp.int32)

            ring = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0),
                    (1, -1), (0, -1)]
            prev = _shift_i(labels, *ring[0], H, W, -1) == labels
            jumps = jnp.zeros((H, W), jnp.int32)
            for dy, dx in ring[1:]:
                cur = _shift_i(labels, dy, dx, H, W, -1) == labels
                jumps += (cur != prev).astype(jnp.int32)
                prev = cur
            frozen = jumps > 2

            xm = x % 4
            col = ((xm + 1 + 2 * off_x) % 4) <= 1
            active = (y % 2 == off_y) & col & (bounds > 0) & ~frozen

            E_best, inl_best = cand_energy(0, 0, labels)
            E_best = E_best + lam_b * bounds.astype(jnp.float32)
            best_label = labels
            best_cand = jnp.zeros((H, W), jnp.int32)

            for c, (dy, dx) in enumerate(_NEIGH4):
                nl = _shift_i(labels, dy, dx, H, W, -1)
                gyn = nl // gw
                gxn = nl % gw
                in_win = (
                    (gyn >= gyp - 1) & (gyn <= gyp + 1)
                    & (gxn >= gxp - 1) & (gxn <= gxp + 1)
                )
                valid = (nl >= 0) & (nl != labels) & in_win
                E, inl = cand_energy(dy, dx, nl)
                bb = jnp.zeros((H, W), jnp.int32)
                for dy2, dx2 in _NEIGH4:
                    bb += (_shift_i(labels, dy2, dx2, H, W, -1)
                           != nl).astype(jnp.int32)
                E = E + lam_b * bb.astype(jnp.float32)
                take = active & valid & (E < E_best)
                E_best = jnp.where(take, E, E_best)
                best_label = jnp.where(take, nl, best_label)
                best_cand = jnp.where(take, c + 1, best_cand)
                if use_disp:
                    inl_best = jnp.where(take, inl, inl_best)

            labels_io[:] = best_label
            if use_disp:
                inl_io[:] = inl_best.astype(jnp.float32)
            # adopt the winning candidate's stat vector channel-by-channel:
            # candidate c's stat at p is the shifted own-stat image
            for ch in range(NF):
                v = S_scr[ch].astype(jnp.float32)
                out = v
                for c, (dy, dx) in enumerate(_NEIGH4):
                    out = jnp.where(best_cand == c + 1,
                                    _shift_i(v, dy, dx, H, W, 0.0), out)
                S_scr[ch] = out.astype(jnp.bfloat16)

        merge()
        rebuild_S()

        # fori_loops keep the Mosaic program small (one phase body + one
        # merge/rebuild body instead of a 20x unroll); phase offsets are
        # decoded from the loop index: order (0,0) (1,1) (0,1) (1,0)
        def phase_body(p, _):
            off_x = p & 1
            off_y = ((p + 1) >> 1) & 1
            phase(off_x, off_y)
            return 0

        def iter_body(_, __):
            jax.lax.fori_loop(0, 4, phase_body, 0)
            merge()
            rebuild_S()
            return 0

        jax.lax.fori_loop(0, n_iters, iter_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cs", "n_iters", "use_disp", "cfg",
                                    "interpret"))
def run_iterations(rgb_chw: Array, disp: Array, labels: Array, inliers: Array,
                   table: Array, cs: int, n_iters: int, use_disp: bool,
                   cfg: TPSConfig, interpret: bool = False):
    """Run `n_iters` TPS iterations in one Pallas kernel invocation.

    rgb_chw (3, H, W) f32; disp (H, W) (inf marks invalid); labels (H, W)
    int32; inliers (H, W) f32 0/1; table (9, GH, GW) f32 with channels
    [cx, cy, r, g, b, n, ta, tb, tc_abs]. Returns (labels, inliers, table).
    """
    H, W = disp.shape
    gh, gw = H // cs, W // cs
    A, B = _pool_mats(H, W, cs)
    At, Bt = A.T, B.T
    dval = jnp.isfinite(disp).astype(jnp.float32)
    dispz = jnp.where(jnp.isfinite(disp), disp, 0.0)
    kernel = _make_kernel(H, W, cs, n_iters, use_disp, cfg)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((9, gh, gw), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((NF, H, W), jnp.bfloat16)],
        input_output_aliases={7: 0, 8: 1, 9: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=119 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rgb_chw, dispz, dval, A, B, At, Bt, labels, inliers, table)


# ---------------------------------------------------------------------------
# Drop-in segment() built on the kernel
# ---------------------------------------------------------------------------


def _stats_from_table(table: Array) -> tps_ref.SuperpixelStats:
    bad = table[8] < -1e29
    nan = jnp.float32(jnp.nan)
    theta = jnp.stack(
        [jnp.where(bad, 0.0, table[6]), jnp.where(bad, 0.0, table[7]),
         jnp.where(bad, nan, table[8])], axis=-1,
    )
    return tps_ref.SuperpixelStats(
        centroid=jnp.stack([table[0], table[1]], axis=-1),
        color=jnp.stack([table[2], table[3], table[4]], axis=-1),
        size=table[5],
        theta=theta,
    )


def segment(rgb: Array, disp: Array, cfg: TPSConfig,
            interpret: bool = False) -> tps_ref.TPSResult:
    """Pallas-accelerated TPS segmentation (same contract as tps.segment)."""
    H, W, _ = rgb.shape
    cs = cfg.cell_size
    gh, gw = H // cs, W // cs

    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    labels = (y // cs) * gw + (x // cs)
    inliers = jnp.zeros((H, W), jnp.float32)
    rgb_chw = jnp.transpose(rgb, (2, 0, 1))
    table0 = jnp.zeros((9, gh, gw), jnp.float32)

    n_rgb = cfg.nb_iters // 2
    n_rgbd = cfg.nb_iters - n_rgb

    labels, inliers, table = run_iterations(
        rgb_chw, disp, labels, inliers, table0, cs, n_rgb, False, cfg,
        interpret,
    )

    stats = _stats_from_table(table)
    if cfg.use_ransac:
        _, inl_b = tps_ref.ransac_plane_init(disp, labels, stats, cfg, gh, gw)
    else:
        inl_b = jnp.isfinite(disp)
    inliers = inl_b.astype(jnp.float32)

    labels, inliers, table = run_iterations(
        rgb_chw, disp, labels, inliers, table, cs, n_rgbd, True, cfg,
        interpret,
    )

    stats = _stats_from_table(table)
    return tps_ref.TPSResult(
        labels=labels,
        boundary=tps_ref.boundary_count(labels),
        inliers=inliers > 0.5,
        stats=stats,
        disp=disp,
    )
