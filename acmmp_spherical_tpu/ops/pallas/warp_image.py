"""Pallas image-warp kernels for the rectified context build.

``build_rect_context`` warps every source image (and, in geom passes, every
source depth map) into its pair's rectified frame.  The XLA path pays one
packed-row gather per sample (~39-54 ns on v5e -- per-row fixed cost), which
made the 8-pair source warp the single largest stage of the context build
(554 ms of 862 ms at the bench point, scripts/profile_ctx_build.py).

These kernels warp per (8, 128) rect-frame tile: compute the tile's original
-image coordinates from the pair homography (same f32 formulas as
rectify.rect_coords / sampling.sample_bicubic_packed16, so values match the
XLA path bit-for-bit on every VALID sample), DMA the original-image window
covering the tile's coordinate bbox, and extract the Catmull-Rom bicubic
taps with in-register row one-hots + lane gathers.  Tiles outside the warped
source footprint (any corner behind the rotated frame, or bbox fully off-
image) write SENTINEL and skip the window loop entirely; a tile straddling
the vanishing line is always strictly outside the footprint (the footprint
is the image of the source quad, which lies wholly on the z > 0 side), so
the corner test is exact, not a heuristic.

Only the SENTINEL (source) variant is kernelised: its invalid samples are
sentinel by definition, so far-from-footprint tiles need no edge-clamp
semantics.  The reference-frame warp (clamp variant, 149 ms) stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_spherical_tpu.ops.rectify import PAD_X, PAD_Y, SENTINEL

TILE_H = 8
TILE_W = 128


def _catmull_rom(t):
    t2 = t * t
    t3 = t2 * t
    return (-0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2)


def _warp_kernel(const_ref, img_ref, out_ref, win, sem,
                 *, WR, WC, Hp, Wp, mode):
    """mode: 'bicubic' (image, sentinel outside) or 'disp' (depth map,
    trunc-nearest lookup + implied-rect-disparity conversion)."""
    s = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    Hm = [const_ref[s, i] for i in range(9)]        # Hinv row-major
    wi = const_ref[s, 9]
    hi = const_ref[s, 10]

    # rect coords of this tile (storage-frame pixels minus the PAD offsets),
    # identical formula to rectify.rect_coords in f32
    y00 = 8.0 * ty.astype(jnp.float32) - PAD_Y
    x00 = 128.0 * tx.astype(jnp.float32) - PAD_X
    # Mosaic's tpu.iota is integer-only; cast after (exact for these ranges)
    ys = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + y00
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + x00

    def coords(x, y):
        z = Hm[6] * x + Hm[7] * y + Hm[8]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ox = (Hm[0] * x + Hm[1] * y + Hm[2]) / zs
        oy = (Hm[3] * x + Hm[4] * y + Hm[5]) / zs
        return ox, oy, z

    ox, oy, z = coords(xs, ys)
    if mode == "bicubic":
        valid = (z > 0) & (ox >= 0.0) & (ox < wi) & (oy >= 0.0) & (oy < hi)
    else:
        # trunc-nearest validity (rectify warp_disp: px >= 0 & int(px) < wd)
        valid = (z > 0) & (ox >= 0.0) & (oy >= 0.0)

    out_ref[0] = jnp.full((TILE_H, TILE_W), SENTINEL, jnp.float32)

    # exact footprint gate: corner z's of the tile; outside tiles are all-
    # sentinel (see module docstring) and also bbox-reject off-image tiles
    cz = [coords(x_, y_)
          for x_ in (x00, x00 + 127.0)
          for y_ in (y00, y00 + 7.0)]
    corners_ok = jnp.minimum(
        jnp.minimum(cz[0][2], cz[1][2]), jnp.minimum(cz[2][2], cz[3][2])
    ) > 1e-6
    cx_lo = jnp.minimum(jnp.minimum(cz[0][0], cz[1][0]),
                        jnp.minimum(cz[2][0], cz[3][0]))
    cx_hi = jnp.maximum(jnp.maximum(cz[0][0], cz[1][0]),
                        jnp.maximum(cz[2][0], cz[3][0]))
    cy_lo = jnp.minimum(jnp.minimum(cz[0][1], cz[1][1]),
                        jnp.minimum(cz[2][1], cz[3][1]))
    cy_hi = jnp.maximum(jnp.maximum(cz[0][1], cz[1][1]),
                        jnp.maximum(cz[2][1], cz[3][1]))
    tile_live = (corners_ok & (cx_hi >= -2.0) & (cx_lo < wi + 2.0)
                 & (cy_hi >= -2.0) & (cy_lo < hi + 2.0)
                 & (cx_hi - cx_lo < WC - 8.0) & (cy_hi - cy_lo < WR - 8.0))

    @pl.when(tile_live)
    def _():
        # window origin: tile coordinate bbox minus bicubic slack, aligned
        y0 = jnp.clip(jnp.floor(cy_lo).astype(jnp.int32) - 2, 0,
                      Hp - (WR + 8)) & ~7
        x0 = jnp.clip(jnp.floor(cx_lo).astype(jnp.int32) - 3, 0,
                      Wp - (WC + 128)) & ~127
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)
        cp = pltpu.make_async_copy(
            img_ref.at[s, pl.ds(y0, WR + 8), pl.ds(x0, WC + 128)], win, sem)
        cp.start()

        wi_i = wi.astype(jnp.int32)
        hi_i = hi.astype(jnp.int32)
        if mode == "bicubic":
            x0f = jnp.floor(ox)
            y0f = jnp.floor(oy)
            fx = ox - x0f
            fy = oy - y0f
            xa = jnp.clip(x0f.astype(jnp.int32), 0, wi_i - 1)
            ya = jnp.clip(y0f.astype(jnp.int32), 0, hi_i - 1)
            wx = _catmull_rom(fx)
            wy = _catmull_rom(fy)
            # clamped tap coordinates (pack_bicubic edge-clamp semantics)
            tap_y = [jnp.clip(ya + (r - 1), 0, hi_i - 1) for r in range(4)]
            tap_x = [jnp.clip(xa + (c - 1), 0, wi_i - 1) - x0
                     for c in range(4)]
            row_lo = tap_y[0]
            row_hi = tap_y[3]
        else:
            xa = ox.astype(jnp.int32)           # C truncation (valid => >=0)
            ya = oy.astype(jnp.int32)
            valid2 = valid & (xa < wi_i) & (ya < hi_i)
            tap_x = [jnp.clip(xa, 0, wi_i - 1) - x0]
            tap_y = [jnp.clip(ya, 0, hi_i - 1)]
            row_lo = tap_y[0]
            row_hi = tap_y[0]
        vrow = valid if mode == "bicubic" else valid2
        n_groups = jnp.clip(
            (jnp.max(jnp.where(vrow, row_hi, 0)) - y0 + 8) // 8 + 1,
            0, (WR + 8) // 8)
        g_lo = jnp.clip(jnp.min(jnp.where(vrow, row_lo, 1 << 30)) - y0,
                        0, 1 << 30) // 8
        cp.wait()
        n_chunks = (WC + 128) // 128

        def body(g, acc):
            r0 = pl.multiple_of(g * 8, 8)
            grp = win[pl.ds(r0, 8), :]              # (8, WC+128)
            for r in range(8):
                wrow = y0 + r0 + r                  # absolute original row
                rowv = grp[r]
                if mode == "bicubic":
                    rsum = None
                    for c in range(4):
                        gc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                        for cxk in range(n_chunks):
                            lo = cxk * 128
                            idx = jnp.clip(tap_x[c] - lo, 0, 127)
                            sel = (tap_x[c] >= lo) & (tap_x[c] < lo + 128)
                            v = jnp.take_along_axis(
                                jnp.broadcast_to(rowv[lo:lo + 128][None],
                                                 (TILE_H, TILE_W)),
                                idx, axis=1, mode="promise_in_bounds")
                            gc = jnp.where(sel, v, gc)
                        term = wx[c] * gc
                        rsum = term if rsum is None else rsum + term
                    # accumulate per TAP row (not a summed weight): clamped
                    # duplicate tap rows then add twice, bit-matching the
                    # XLA pack path's per-row accumulation order
                    for r_t in range(4):
                        acc = acc + jnp.where(tap_y[r_t] == wrow,
                                              wy[r_t], 0.0) * rsum
                else:
                    gc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                    for cxk in range(n_chunks):
                        lo = cxk * 128
                        idx = jnp.clip(tap_x[0] - lo, 0, 127)
                        sel = (tap_x[0] >= lo) & (tap_x[0] < lo + 128)
                        v = jnp.take_along_axis(
                            jnp.broadcast_to(rowv[lo:lo + 128][None],
                                             (TILE_H, TILE_W)),
                            idx, axis=1, mode="promise_in_bounds")
                        gc = jnp.where(sel, v, gc)
                    acc = jnp.where(tap_y[0] == wrow, gc, acc)
            return acc

        acc = jax.lax.fori_loop(g_lo, n_groups, body,
                                jnp.zeros((TILE_H, TILE_W), jnp.float32))

        if mode == "bicubic":
            out_ref[0] = jnp.where(valid & (z > 0), acc, SENTINEL)
        else:
            # implied rect disparity f*B / z_rect (rectify warp_disp)
            fB = const_ref[s, 11]
            r20, r21, r22 = (const_ref[s, 12], const_ref[s, 13],
                             const_ref[s, 14])
            kfx, kfy, kcx, kcy = (const_ref[s, 15], const_ref[s, 16],
                                  const_ref[s, 17], const_ref[s, 18])
            u = (ox - kcx) / kfx
            v = (oy - kcy) / kfy
            z_rect = acc * (r20 * u + r21 * v + r22)
            disp = fB / jnp.maximum(z_rect, 1e-6)
            ok = valid2 & (acc > 0) & (z_rect > 0)
            out_ref[0] = jnp.where(ok, disp, SENTINEL)


def _run_warp(consts, imgs, rect_hw, warp_win, *, mode, interpret):
    S = imgs.shape[0]
    hr, wr = rect_hw
    WR, WC = warp_win
    Hp, Wp = imgs.shape[1], imgs.shape[2]
    pht = max(0, (WR + 8) - Hp)
    pwt = max(0, (WC + 128) - Wp)
    pht += (-(Hp + pht)) % 8
    pwt += (-(Wp + pwt)) % 128
    if pht or pwt:
        imgs = jnp.pad(imgs, ((0, 0), (0, pht), (0, pwt)))
    HpR = hr + 2 * PAD_Y
    WpR = wr + 2 * PAD_X
    kern = functools.partial(_warp_kernel, WR=WR, WC=WC,
                             Hp=Hp + pht, Wp=Wp + pwt, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(S, HpR // TILE_H, WpR // TILE_W),
        in_specs=[
            pl.BlockSpec((S, 24), lambda s, ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda s, ty, tx: (s, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((S, HpR, WpR), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WR + 8, WC + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(consts, imgs)


def warp_src_frames(src_images, Hinv, widths, heights, rect_hw, warp_win,
                    *, interpret=False):
    """Kernelised sentinel-variant source warp: (S, Hp, Wp) + per-pair
    Hinv (S, 3, 3) -> (S, hr+2*PAD_Y, wr+2*PAD_X) rect frames, matching
    rectify.warp_to_rect(sentinel=True, bicubic) on every valid sample."""
    S = src_images.shape[0]
    consts = jnp.zeros((S, 24), jnp.float32)
    consts = consts.at[:, :9].set(Hinv.reshape(S, 9))
    consts = consts.at[:, 9].set(jnp.asarray(widths, jnp.float32))
    consts = consts.at[:, 10].set(jnp.asarray(heights, jnp.float32))
    return _run_warp(consts, src_images, rect_hw, warp_win, mode="bicubic",
                     interpret=interpret)


def warp_src_disparities(src_depths, Hinv, R_sr, K_s, fB, widths, heights,
                         rect_hw, warp_win, *, interpret=False):
    """Kernelised geom-pass disparity warp: per-pair source depth maps ->
    implied rect disparity frames (SENTINEL where invalid), matching the
    XLA warp_disp in build_rect_context."""
    S = src_depths.shape[0]
    consts = jnp.zeros((S, 24), jnp.float32)
    consts = consts.at[:, :9].set(Hinv.reshape(S, 9))
    consts = consts.at[:, 9].set(jnp.asarray(widths, jnp.float32))
    consts = consts.at[:, 10].set(jnp.asarray(heights, jnp.float32))
    consts = consts.at[:, 11].set(fB)
    consts = consts.at[:, 12:15].set(R_sr[:, 2, :])
    consts = consts.at[:, 15].set(K_s[:, 0, 0])
    consts = consts.at[:, 16].set(K_s[:, 1, 1])
    consts = consts.at[:, 17].set(K_s[:, 0, 2])
    consts = consts.at[:, 18].set(K_s[:, 1, 2])
    return _run_warp(consts, src_depths, rect_hw, warp_win, mode="disp",
                     interpret=interpret)
