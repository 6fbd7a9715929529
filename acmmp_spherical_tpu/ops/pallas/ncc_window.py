"""Fused windowed bilateral-NCC kernel (pinhole).

Computes one plane-field's per-view NCC costs -- the hot evaluation of the
PatchMatch half-step -- with the source sampling done from per-tile VMEM
windows using per-lane ``tpu.dynamic_gather`` instead of HBM gather rows
(PERF.md: the gather unit caps the XLA path at ~120 M samples/s while
in-register gathers run at VPU rate).

Per (view, tile) grid step:

1. DMA an aligned ``WIN_H x WIN_W`` window of the source image into VMEM; its
   origin comes from an XLA pre-pass that projects the centre taps
   (gather-free VPU math) and takes per-tile minima.
2. Loop the 36 patch taps: evaluate the plane depth at the tap, transform into
   the source frame with a precomputed relative pose, project, and extract the
   bilinear sample from the window (row one-hot of lane-gathers, gated to the
   tap's actual row range).
3. Accumulate the six bilateral-NCC sums with the precomputed reference tap
   intensities/weights and emit the per-view cost tile.

Samples that leave the window are treated as invalid taps (weight 0), the
same semantics as out-of-image patch taps; plane fields whose *centre*
projection leaves the window get ``cost_max``.  For smooth fields (propagation
candidates, current planes, perturbations) windows cover everything and the
result equals the exact XLA path; wildly scattered fields (random-depth
candidates) should use the exact path instead.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core.camera import Camera, Cameras, PINHOLE, camera_center
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.ops.ncc import RefTapContext

TILE_H = 8
TILE_W = 128
WIN_H = 40     # 8-aligned origin + slack; must be a multiple of 8
WIN_W = 384    # 128-aligned origin + slack; multiple of 128
_MARGIN_Y = 10
_MARGIN_X = 24


def pack_pair_params(ref_cam: Camera, src_cams: Cameras) -> jax.Array:
    """Per-(ref, src) relative pose + intrinsics, one 128-float row per view.

    Layout: [0:9] R_rel (row major), [9:12] t_rel, [12] fx_ref_inv, [13]
    fy_ref_inv, [14] cx_ref, [15] cy_ref, [16] fx_src, [17] fy_src, [18]
    cx_src, [19] cy_src, [20] src_w, [21] src_h, [22] fx_ref, [23] fy_ref,
    [24] fx_src_inv, [25] fy_src_inv.
    ``X_src = R_rel @ (ray_ref * depth) + t_rel`` (cancels the world hop).
    """
    def per_view(src):
        R_rel = src.R @ ref_cam.R.T
        t_rel = src.R @ (camera_center(ref_cam) - camera_center(src))
        row = jnp.zeros(128, jnp.float32)
        row = row.at[0:9].set(R_rel.reshape(-1))
        row = row.at[9:12].set(t_rel)
        row = row.at[12].set(1.0 / ref_cam.K[0, 0])
        row = row.at[13].set(1.0 / ref_cam.K[1, 1])
        row = row.at[14].set(ref_cam.K[0, 2])
        row = row.at[15].set(ref_cam.K[1, 2])
        row = row.at[16].set(src.K[0, 0])
        row = row.at[17].set(src.K[1, 1])
        row = row.at[18].set(src.K[0, 2])
        row = row.at[19].set(src.K[1, 2])
        row = row.at[20].set(src.width)
        row = row.at[21].set(src.height)
        row = row.at[22].set(ref_cam.K[0, 0])
        row = row.at[23].set(ref_cam.K[1, 1])
        row = row.at[24].set(1.0 / src.K[0, 0])
        row = row.at[25].set(1.0 / src.K[1, 1])
        return row

    return jax.vmap(
        lambda i: per_view(jax.tree.map(lambda a: a[i], src_cams))
    )(jnp.arange(src_cams.t.shape[0]))


def compute_center_windows(
    src_cams: Cameras,
    ref_cam: Camera,
    normal: jax.Array,
    w: jax.Array,
    xs: jax.Array,
    ys: jax.Array,
    src_shape: tuple[int, int],
):
    """XLA pre-pass: per-(view, tile) window origins from the centre-tap
    projections (pure VPU math, no gathers).  Returns (off_y, off_x) int32
    arrays of shape (S, TY*TX) plus nothing else."""
    H, W = xs.shape
    ty, tx = H // TILE_H, W // TILE_W
    depth = G.depth_from_plane(ref_cam, xs, ys, normal, w)
    X = G.unproject_world(ref_cam, xs, ys, depth)

    def per_view(cam_i):
        cam = jax.tree.map(lambda a: a, cam_i)
        px, py, pd = G.project(cam_i, X)
        ok = jnp.isfinite(px) & jnp.isfinite(py) & (jnp.abs(px) < 1e7) & (jnp.abs(py) < 1e7)
        big = jnp.float32(1e9)
        pxt = jnp.where(ok, px, big).reshape(ty, TILE_H, tx, TILE_W)
        pyt = jnp.where(ok, py, big).reshape(ty, TILE_H, tx, TILE_W)
        xmin = jnp.min(pxt, axis=(1, 3))
        ymin = jnp.min(pyt, axis=(1, 3))
        off_x = (jnp.floor(xmin).astype(jnp.int32) - _MARGIN_X) // TILE_W * TILE_W
        off_y = (jnp.floor(ymin).astype(jnp.int32) - _MARGIN_Y) // TILE_H * TILE_H
        max_x = max((src_shape[1] - WIN_W) // TILE_W * TILE_W, 0)
        max_y = max((src_shape[0] - WIN_H) // TILE_H * TILE_H, 0)
        return (jnp.clip(off_y, 0, max_y).reshape(-1),
                jnp.clip(off_x, 0, max_x).reshape(-1))

    off_y, off_x = jax.vmap(
        lambda i: per_view(jax.tree.map(lambda a: a[i], src_cams))
    )(jnp.arange(src_cams.t.shape[0]))
    return off_y, off_x


def _ncc_kernel(off_y_ref, off_x_ref, toff_ref, cam_ref, src_ref, *rest,
                n_taps, params: PatchMatchParams, with_geom: bool):
    if with_geom:
        (dep_ref, nx_ref, ny_ref, nz_ref, w_ref, xs_ref, ys_ref,
         taps_ref, wgt_ref, out_ref, gout_ref, win, dwin, sem, dsem) = rest
    else:
        (nx_ref, ny_ref, nz_ref, w_ref, xs_ref, ys_ref,
         taps_ref, wgt_ref, out_ref, win, sem) = rest
        dep_ref = gout_ref = dwin = dsem = None
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    tile_id = s * (n_i * n_j) + i * n_j + j
    y0 = pl.multiple_of(off_y_ref[tile_id], TILE_H)
    x0 = pl.multiple_of(off_x_ref[tile_id], TILE_W)
    cp = pltpu.make_async_copy(
        src_ref.at[s, pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)], win, sem
    )
    cp.start()
    if with_geom:
        dcp = pltpu.make_async_copy(
            dep_ref.at[s, pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)], dwin, dsem
        )
        dcp.start()

    def c(k):
        return cam_ref[0, 0, k]

    nx = nx_ref[0]
    ny = ny_ref[0]
    nz = nz_ref[0]
    pw = w_ref[0]
    xs = xs_ref[0]
    ys = ys_ref[0]
    n_chunks = WIN_W // TILE_W

    def project(dx, dy):
        """Tap projection into the source view; returns (px, py, in_img)."""
        rx = (xs + dx - c(14)) * c(12)
        ry = (ys + dy - c(15)) * c(13)
        denom = nx * rx + ny * ry + nz
        depth = jnp.where(jnp.abs(denom) < 1e-6, 1e6, -pw / denom)
        Xx = rx * depth
        Xy = ry * depth
        sx = c(0) * Xx + c(1) * Xy + c(2) * depth + c(9)
        sy = c(3) * Xx + c(4) * Xy + c(5) * depth + c(10)
        sz = c(6) * Xx + c(7) * Xy + c(8) * depth + c(11)
        inv_z = 1.0 / jnp.where(jnp.abs(sz) < 1e-6, 1e-6, sz)
        px = (c(16) * sx) * inv_z + c(18)
        py = (c(17) * sy) * inv_z + c(19)
        in_img = (px >= 0.0) & (px < c(20)) & (py >= 0.0) & (py < c(21))
        return px, py, in_img

    def extract(px, py, in_img):
        """Bilinear window extraction; returns (value, ok)."""
        pxf = jnp.floor(px)
        pyf = jnp.floor(py)
        fx = px - pxf
        fy = py - pyf
        relx = pxf.astype(jnp.int32) - x0
        rely = pyf.astype(jnp.int32) - y0
        in_win = ((relx >= 0) & (relx <= WIN_W - 2)
                  & (rely >= 0) & (rely <= WIN_H - 2))
        ok = in_img & in_win
        relx_c = jnp.clip(relx, 0, WIN_W - 2)
        rely_c = jnp.clip(rely, 0, WIN_H - 2)

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        # gate 8-row groups on the tap's actual row span: smooth fields touch
        # only 2-3 of the WIN_H//8 groups (lax.cond lowers to scf.if and
        # skips the work at runtime)
        rmin = jnp.min(rely_c)
        rmax = jnp.max(rely_c) + 1  # the y+1 bilinear corner

        def group(base, accs):
            a0, a1 = accs
            for r in range(base, base + TILE_H):
                g0 = zero
                g1 = zero
                for cidx in range(n_chunks):
                    chunk = jnp.broadcast_to(
                        win[r:r + 1, cidx * TILE_W:(cidx + 1) * TILE_W],
                        (TILE_H, TILE_W))
                    i0 = jnp.clip(relx_c - cidx * TILE_W, 0, TILE_W - 1)
                    i1 = jnp.clip(relx_c + 1 - cidx * TILE_W, 0, TILE_W - 1)
                    v0 = jnp.take_along_axis(chunk, i0, axis=1,
                                             mode="promise_in_bounds")
                    v1 = jnp.take_along_axis(chunk, i1, axis=1,
                                             mode="promise_in_bounds")
                    g0 = jnp.where((relx_c >= cidx * TILE_W)
                                   & (relx_c < (cidx + 1) * TILE_W), v0, g0)
                    g1 = jnp.where((relx_c + 1 >= cidx * TILE_W)
                                   & (relx_c + 1 < (cidx + 1) * TILE_W), v1, g1)
                rv = g0 + (g1 - g0) * fx
                a0 = jnp.where(rely_c == r, rv, a0)
                a1 = jnp.where(rely_c + 1 == r, rv, a1)
            return a0, a1

        accs = (zero, zero)
        for gidx in range(WIN_H // TILE_H):
            lo = gidx * TILE_H
            accs = jax.lax.cond(
                (rmax >= lo) & (rmin < lo + TILE_H),
                lambda a, lo=lo: group(lo, a),
                lambda a: a,
                accs,
            )
        a0, a1 = accs
        return a0 + (a1 - a0) * fy, ok

    cp.wait()

    # centre validation (the stride-2 tap grid does not include (0, 0);
    # reference ACMMP.cu:418-433 validates the centre separately)
    _, _, center_in = project(0.0, 0.0)

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def tap_body(ti, sums):
        s_bw, s_r, s_rr, s_s, s_ss, s_rs = sums
        dx = toff_ref[2 * ti].astype(jnp.float32)
        dy = toff_ref[2 * ti + 1].astype(jnp.float32)
        px, py, in_img = project(dx, dy)
        val, ok = extract(px, py, in_img)
        wgt = jnp.where(ok, wgt_ref[ti], 0.0)
        ref_pix = taps_ref[ti]
        return (
            s_bw + wgt,
            s_r + wgt * ref_pix,
            s_rr + wgt * ref_pix * ref_pix,
            s_s + wgt * val,
            s_ss + wgt * val * val,
            s_rs + wgt * ref_pix * val,
        )

    s_bw, s_r, s_rr, s_s, s_ss, s_rs = jax.lax.fori_loop(
        0, n_taps, tap_body, (zeros,) * 6
    )

    inv_bw = 1.0 / jnp.maximum(s_bw, 1e-12)
    m_ref = s_r * inv_bw
    m_src = s_s * inv_bw
    var_ref = s_rr * inv_bw - m_ref * m_ref
    var_src = s_ss * inv_bw - m_src * m_src
    covar = s_rs * inv_bw - m_ref * m_src
    ncc = 1.0 - covar * jax.lax.rsqrt(jnp.maximum(var_ref * var_src, 1e-30))
    cost = jnp.clip(ncc, 0.0, params.cost_max)
    bad = (s_bw < 1e-6) | (var_ref < 1e-5) | (var_src < 1e-5) | ~center_in
    out_ref[0] = jnp.where(bad, params.cost_max, cost)

    if with_geom:
        # fused geometric-consistency cost (reference ACMMP.cu:646-671):
        # look up the source depth at the truncated centre projection, then
        # forward-backward reproject.  The depth window shares the NCC window
        # origin -- both are centred on the same projection.
        dcp.wait()
        gmax = params.geom_max_cost
        pxc, pyc, _ = project(0.0, 0.0)
        xi = pxc.astype(jnp.int32)  # C-truncation ((int)x, ACMMP.cu:657)
        yi = pyc.astype(jnp.int32)
        in_img = ((pxc >= 0.0) & (xi < c(20).astype(jnp.int32))
                  & (pyc >= 0.0) & (yi < c(21).astype(jnp.int32)))
        relx = xi - x0
        rely = yi - y0
        in_win = (relx >= 0) & (relx <= WIN_W - 1) & (rely >= 0) & (rely <= WIN_H - 1)
        ok = in_img & in_win
        relx_c = jnp.clip(relx, 0, WIN_W - 1)
        rely_c = jnp.clip(rely, 0, WIN_H - 1)
        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        rmin = jnp.min(rely_c)
        rmax = jnp.max(rely_c)

        def dgroup(base, acc):
            for r in range(base, base + TILE_H):
                g = zero
                for cidx in range(n_chunks):
                    chunk = jnp.broadcast_to(
                        dwin[r:r + 1, cidx * TILE_W:(cidx + 1) * TILE_W],
                        (TILE_H, TILE_W))
                    i0 = jnp.clip(relx_c - cidx * TILE_W, 0, TILE_W - 1)
                    v0 = jnp.take_along_axis(chunk, i0, axis=1,
                                             mode="promise_in_bounds")
                    g = jnp.where((relx_c >= cidx * TILE_W)
                                  & (relx_c < (cidx + 1) * TILE_W), v0, g)
                acc = jnp.where(rely_c == r, g, acc)
            return acc

        src_d = zero
        for gidx in range(WIN_H // TILE_H):
            lo = gidx * TILE_H
            src_d = jax.lax.cond(
                (rmax >= lo) & (rmin < lo + TILE_H),
                lambda a, lo=lo: dgroup(lo, a),
                lambda a: a,
                src_d,
            )
        # unproject the *float* projection at the looked-up depth
        # (ACMMP.cu:663), map into the ref frame with R_rel^T, re-project
        rxs = (pxc - c(18)) * c(24)
        rys = (pyc - c(19)) * c(25)
        ax = rxs * src_d - c(9)
        ay = rys * src_d - c(10)
        az = src_d - c(11)
        Xr_x = c(0) * ax + c(3) * ay + c(6) * az
        Xr_y = c(1) * ax + c(4) * ay + c(7) * az
        Xr_z = c(2) * ax + c(5) * ay + c(8) * az
        inv_z = 1.0 / jnp.where(jnp.abs(Xr_z) < 1e-6, 1e-6, Xr_z)
        bx = c(22) * Xr_x * inv_z + c(14)
        by = c(23) * Xr_y * inv_z + c(15)
        err = jnp.sqrt((xs - bx) ** 2 + (ys - by) ** 2)
        gcost = jnp.minimum(gmax, err)
        gout_ref[0] = jnp.where(ok & (src_d > 0.0), gcost, gmax)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def windowed_multiview_ncc(
    src_images: jax.Array,   # (S, Hp, Wp)
    src_cams: Cameras,
    ref_cam: Camera,
    normal: jax.Array,       # (H, W, 3) plane field (any packed grid)
    w: jax.Array,            # (H, W)
    ctx: RefTapContext,      # fields on the same grid
    params: PatchMatchParams,
    src_depths: jax.Array | None = None,  # (S, Hp, Wp): also emit geom cost
    *,
    interpret: bool = False,
):
    """Drop-in fast replacement for :func:`ops.ncc.multiview_ncc` (pinhole).

    Returns (S, H, W) costs; positions whose sampling left the per-tile window
    cost ``cost_max`` (centre) / lose the tap (others).  With ``src_depths``
    the kernel also computes the geometric-consistency cost from a fused depth
    window (same origin) and returns ``(cost, geom_cost)``.
    """
    assert ref_cam.model == PINHOLE and src_cams.model == PINHOLE
    S, Hp, Wp = src_images.shape
    H, W = w.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    ty, tx = H // TILE_H, W // TILE_W
    with_geom = src_depths is not None

    pad_h = max(WIN_H - Hp, 0)
    pad_w = max(WIN_W - Wp, 0)
    if pad_h or pad_w:
        src_images = jnp.pad(src_images, ((0, 0), (0, pad_h), (0, pad_w)))
        if with_geom:
            src_depths = jnp.pad(src_depths, ((0, 0), (0, pad_h), (0, pad_w)))

    off_y, off_x = compute_center_windows(
        src_cams, ref_cam, normal, w, ctx.xs, ctx.ys, src_images.shape[1:]
    )  # (S, TY*TX)
    cam_rows = pack_pair_params(ref_cam, src_cams)  # (S, 128)

    T = ctx.ref_taps.shape[0]
    # (dx, dy) interleaved per tap as int32 scalar-prefetch
    toff = jnp.zeros((2 * T,), jnp.int32)
    toff = toff.at[0::2].set(ctx.offsets[:, 0].astype(jnp.int32))
    toff = toff.at[1::2].set(ctx.offsets[:, 1].astype(jnp.int32))
    kernel = functools.partial(_ncc_kernel, n_taps=T, params=params,
                               with_geom=with_geom)

    tile_spec = lambda plane: pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda s, i, j, *_, p=plane: (p, i, j))
    in_specs = [
        pl.BlockSpec((1, 1, 128), lambda s, i, j, *_: (s, 0, 0)),     # cam
        pl.BlockSpec(memory_space=pltpu.ANY),                         # src
    ]
    if with_geom:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))         # depths
    in_specs += [
        tile_spec(0), tile_spec(1), tile_spec(2),                     # nx ny nz
        tile_spec(0),                                                 # w
        tile_spec(0), tile_spec(0),                                   # xs ys
        pl.BlockSpec((T, TILE_H, TILE_W), lambda s, i, j, *_: (0, i, j)),  # taps
        pl.BlockSpec((T, TILE_H, TILE_W), lambda s, i, j, *_: (0, i, j)),  # wgts
    ]
    out_spec = pl.BlockSpec((1, TILE_H, TILE_W), lambda s, i, j, *_: (s, i, j))
    scratch = [
        pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
    ]
    if with_geom:
        scratch.append(pltpu.VMEM((WIN_H, WIN_W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)
    if with_geom:
        scratch.append(pltpu.SemaphoreType.DMA)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, ty, tx),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec) if with_geom else out_spec,
        scratch_shapes=scratch,
    )
    out_shape = jax.ShapeDtypeStruct((S, H, W), jnp.float32)
    ncf = jnp.moveaxis(normal, -1, 0)  # (3, H, W)
    args = [off_y.reshape(-1), off_x.reshape(-1), toff,
            cam_rows[:, None, :], src_images]
    if with_geom:
        args.append(src_depths)
    args += [ncf, ncf, ncf, w[None], ctx.xs[None], ctx.ys[None],
             ctx.ref_taps, ctx.weights]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape) if with_geom else out_shape,
        interpret=interpret,
    )(*args)
