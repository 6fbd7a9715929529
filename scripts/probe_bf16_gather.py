#!/usr/bin/env python
"""Probe: Mosaic take_along_axis gather rate -- f32 pair vs bf16-packed single.

The rect kernel's per-candidate cost is dominated by 36 taps x n_chunks x 2
lane gathers of (8, 128) tiles (ops/pallas/ncc_rect.py src_sample): one for
each bilinear neighbour.  Direct bf16 take_along_axis does NOT compile
(Mosaic internal error, probed 2026-08-18).  The alternative: pack pixel x
and x+1 as two bf16s inside one f32 lane, gather ONCE, unpack with integer
ops -- halves the gather count at bf16 sample precision (exact for the
uint8-sourced intensities, ~2^-8 relative for warped interpolated values).

Variants timed (random per-pixel indices so nothing constant-folds):
  pair:   2 gathers (win, win1) per tap  [current kernel]
  packed: 1 gather + bitcast unpack per tap
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_H, TILE_W = 8, 128
N_TAPS = 108  # 36 taps x 3 chunks


def _kernel(idx_ref, win_ref, win1_ref, out_ref, *, mode):
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    i0 = idx_ref[0]
    win = win_ref[0]
    win1 = win1_ref[0]
    for t in range(N_TAPS):
        rows = win[t % 16]
        idx = (i0 + t) % TILE_W
        if mode == "pair":
            g0 = jnp.take_along_axis(rows, idx, axis=1,
                                     mode="promise_in_bounds")
            g1 = jnp.take_along_axis(win1[t % 16], idx, axis=1,
                                     mode="promise_in_bounds")
        else:
            v = jnp.take_along_axis(rows, idx, axis=1,
                                    mode="promise_in_bounds")
            u = jax.lax.bitcast_convert_type(v, jnp.uint32)
            g0 = jax.lax.bitcast_convert_type(
                u & jnp.uint32(0xFFFF0000), jnp.float32)
            g1 = jax.lax.bitcast_convert_type(
                u << jnp.uint32(16), jnp.float32)
        acc = acc + g0 + g1 * 0.5
    out_ref[0] = acc


def run(mode, n_tiles=2048, reps=5):
    kernel = functools.partial(_kernel, mode=mode)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.random((n_tiles, 16, TILE_H, TILE_W), np.float32))
    idx = jnp.asarray(rng.integers(0, TILE_W,
                                   (n_tiles, TILE_H, TILE_W)).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, TILE_H, TILE_W), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 16, TILE_H, TILE_W), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
    )
    g = jax.jit(lambda i, w, w1: f(i, w, w1))
    out = g(idx, win, win)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(g(idx, win, win))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    n_gather = N_TAPS * (2 if mode == "pair" else 1)
    print(f"{mode}: {t*1e3:.2f} ms total, "
          f"{t/(n_tiles*n_gather)*1e9:.2f} ns per (8,128) gather")
    return t


if __name__ == "__main__":
    tp = run("pair")
    tk = run("packed")
    print(f"packed speedup over pair: {tp/tk:.2f}x")
