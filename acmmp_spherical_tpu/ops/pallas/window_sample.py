"""Windowed bilinear sampling kernel (the fast-NCC building block).

Motivation (PERF.md): XLA gathers cost ~10 ns per *row* on TPU, but Mosaic's
in-register ``tpu.dynamic_gather`` (per-lane ``take_along_axis``) runs at full
VPU rate.  This kernel exploits it: for each (8, 128) output tile it DMAs a
small source window (WIN_H x WIN_W) from HBM into VMEM at a precomputed
offset, then extracts per-pixel bilinear samples with a row one-hot of
per-lane lane-gathers -- no HBM gather rows at all.

Samples whose bilinear footprint falls outside the window (or the logical
image) return ``valid=False`` -- the same semantics the NCC cost assigns to
out-of-bounds patch taps.  Windows are exact for smooth plane fields; only
wild (random) candidates lose taps, which saturates their cost toward
cost_max.

This module provides the standalone sampling op + the window-offset pre-pass;
the fused NCC kernel builds on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
# Window origins must be DMA-aligned to the (8, 128) tile grid, so the window
# carries up to (7, 127) px of quantisation slack on top of the coverage
# margin: 40 rows x 384 cols f32 = 60 KB of VMEM.
WIN_H = 40
WIN_W = 384


def compute_window_offsets(
    x: jax.Array, y: jax.Array, src_h: int, src_w: int, *, margin: int = 2
):
    """Per-tile window origins from per-pixel sample coords.

    ``x``/``y``: (H, W) float sample positions (H, W multiples of the tile).
    Returns (off_y, off_x) int32 arrays of shape (H/8, W/128): the window is
    placed so the tile's minimum coordinate sits ``margin`` px inside it, then
    clamped to keep the window inside the padded source.
    """
    H, W = x.shape
    ty, tx = H // TILE_H, W // TILE_W
    xt = x.reshape(ty, TILE_H, tx, TILE_W)
    yt = y.reshape(ty, TILE_H, tx, TILE_W)
    # ignore non-finite coords when placing the window
    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(jnp.isfinite(xt), xt, big), axis=(1, 3))
    ymin = jnp.min(jnp.where(jnp.isfinite(yt), yt, big), axis=(1, 3))
    # quantise to the DMA tiling (sublane 8 / lane 128); the window size
    # includes the quantisation slack
    off_x = jnp.floor(xmin).astype(jnp.int32) - margin
    off_y = jnp.floor(ymin).astype(jnp.int32) - margin
    off_x = (off_x // TILE_W) * TILE_W
    off_y = (off_y // TILE_H) * TILE_H
    max_x = max(((src_w - WIN_W) // TILE_W) * TILE_W, 0)
    max_y = max(((src_h - WIN_H) // TILE_H) * TILE_H, 0)
    off_x = jnp.clip(off_x, 0, max_x)
    off_y = jnp.clip(off_y, 0, max_y)
    return off_y, off_x


def _extract_bilinear(win, relx, rely, fx, fy):
    """Bilinear extraction from a VMEM window via lane-gathers + row one-hot.

    ``win``: (WIN_H, WIN_W) ref or array; ``relx``/``rely``: (8, 128) int32
    window-local integer corner coords; ``fx``/``fy``: fractional parts.
    Assumes relx in [0, WIN_W-2] and rely in [0, WIN_H-2] (caller masks).
    Returns the interpolated (8, 128) values.
    """
    n_chunks = WIN_W // TILE_W
    acc0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc1 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    rx0 = relx
    rx1 = relx + 1

    def row_value(row):
        """Value of window row ``row`` lane-gathered at rx0/rx1, x-lerped."""
        g0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        g1 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for c in range(n_chunks):
            chunk = jnp.broadcast_to(win[row, c * TILE_W:(c + 1) * TILE_W]
                                     .reshape(1, TILE_W), (TILE_H, TILE_W))
            i0 = jnp.clip(rx0 - c * TILE_W, 0, TILE_W - 1)
            i1 = jnp.clip(rx1 - c * TILE_W, 0, TILE_W - 1)
            v0 = jnp.take_along_axis(chunk, i0, axis=1, mode="promise_in_bounds")
            v1 = jnp.take_along_axis(chunk, i1, axis=1, mode="promise_in_bounds")
            in0 = (rx0 >= c * TILE_W) & (rx0 < (c + 1) * TILE_W)
            in1 = (rx1 >= c * TILE_W) & (rx1 < (c + 1) * TILE_W)
            g0 = jnp.where(in0, v0, g0)
            g1 = jnp.where(in1, v1, g1)
        return g0 + (g1 - g0) * fx

    for r in range(WIN_H):
        rv = row_value(r)
        acc0 = jnp.where(rely == r, rv, acc0)
        acc1 = jnp.where(rely + 1 == r, rv, acc1)
    return acc0 + (acc1 - acc0) * fy


def _sample_kernel(off_y_ref, off_x_ref, src_ref, x_ref, y_ref,
                   out_ref, ok_ref, win, sem, *, src_h, src_w):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    y0 = pl.multiple_of(off_y_ref[i * n_j + j], TILE_H)
    x0 = pl.multiple_of(off_x_ref[i * n_j + j], TILE_W)
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)], win, sem
    )
    cp.start()

    x = x_ref[:]
    y = y_ref[:]
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    fx = x - xf
    fy = y - yf
    xi = xf.astype(jnp.int32)
    yi = yf.astype(jnp.int32)
    relx = xi - x0
    rely = yi - y0
    in_win = (
        (relx >= 0) & (relx <= WIN_W - 2) & (rely >= 0) & (rely <= WIN_H - 2)
    )
    in_img = (x >= 0.0) & (x < src_w) & (y >= 0.0) & (y < src_h)
    ok = in_win & in_img
    relx_c = jnp.clip(relx, 0, WIN_W - 2)
    rely_c = jnp.clip(rely, 0, WIN_H - 2)

    cp.wait()
    val = _extract_bilinear(win, relx_c, rely_c, fx, fy)
    out_ref[:] = jnp.where(ok, val, 0.0)
    ok_ref[:] = ok


@functools.partial(jax.jit, static_argnames=("src_h", "src_w", "interpret"))
def windowed_sample(
    src: jax.Array,   # (Hp, Wp) source image (HBM)
    x: jax.Array,     # (H, W) sample x coords
    y: jax.Array,     # (H, W)
    *,
    src_h: int,
    src_w: int,
    interpret: bool = False,
):
    """Bilinear-sample ``src`` at per-pixel coords using windowed VMEM tiles.

    Returns (values, ok): ``ok`` False where the sample left the window or the
    logical image.  H, W must be multiples of (8, 128).
    """
    H, W = x.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    ty, tx = H // TILE_H, W // TILE_W
    # the DMA window must fit inside the (padded) source
    pad_h = max(WIN_H - src.shape[0], 0)
    pad_w = max(WIN_W - src.shape[1], 0)
    if pad_h or pad_w:
        src = jnp.pad(src, ((0, pad_h), (0, pad_w)))
    off_y, off_x = compute_window_offsets(x, y, src.shape[0], src.shape[1])

    kernel = functools.partial(_sample_kernel, src_h=src_h, src_w=src_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.bool_),
        ],
        interpret=interpret,
    )(off_y.reshape(-1), off_x.reshape(-1), src, x, y)
