#!/usr/bin/env python
"""Microbenchmark: Pallas in-kernel 2D warp gather vs the XLA fwd row-gather.

The per-invocation fwd transport of the rect path is an (S * N * 1024)-row
XLA gather of width E = 2C (~320 ms at the bench point for C=9): the cost is
~20-30 ns/row + ~2 ns/element (PERF.md round-3 model), i.e. dominated by the
per-ROW fixed cost that XLA pays for pixel-granular reshuffling.

The candidate replacement is a Pallas kernel that, per (8, 128) compact
output tile, DMAs the window of the original-grid table covering the tile's
claimant bbox (the warp is smooth, so the bbox is small and static) and
extracts each pixel's value with in-register gathers.  Two extraction
patterns are probed:

  onehot   full row one-hot: per window row, lane-gather the row at rel_x
           and select where rel_y == row (round-1 windowed-kernel pattern),
           loops nested (element, row, chunk)
  swapped  loop-swapped one-hot: (row, chunk) masks/indices computed once
           and shared across all E element planes (inner loop = 1 gather +
           1 select per element).  A lax.cond row-gate variant was measured
           4x SLOWER (342 vs 84 ms) -- Mosaic branch overhead -- and removed.

Both are verified BIT-EXACT against the XLA row-gather on a synthetic
rotation+scale+jitter map emulating the real fwd maps (rounding corrections
included).  Run on the TPU host:

    python scripts/probe_warp_gather.py --rot 10 --scale 0.9
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(f, *a, reps=5, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def make_map(S, N, Ht, Wt, rot_deg, scale, seed=0):
    """Synthetic fwd map: per compact tile, claimants follow a rotation/scale
    warp with +-1 px jitter (emulating bwd-round + collision resolution)."""
    rng = np.random.default_rng(seed)
    th = np.radians(rot_deg)
    ca, sa = np.cos(th) / scale, np.sin(th) / scale
    ys = np.arange(8)
    xs = np.arange(128)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    fwd_y = np.zeros((S, N, 8, 128), np.int32)
    fwd_x = np.zeros((S, N, 8, 128), np.int32)
    valid = np.zeros((S, N, 8, 128), np.float32)
    # scatter tiles across a virtual rect frame; map to orig via inverse rot
    for s in range(S):
        t_oy = rng.integers(0, max(1, int(Ht * scale) - 16), N)
        t_ox = rng.integers(0, max(1, int(Wt * scale) - 140), N)
        ry = t_oy[:, None, None] + yy[None]
        rx = t_ox[:, None, None] + xx[None]
        oy = ca * ry + sa * rx
        ox = -sa * ry + ca * rx
        oy = np.rint(oy).astype(np.int64) + rng.integers(-1, 2, oy.shape)
        ox = np.rint(ox).astype(np.int64) + rng.integers(-1, 2, ox.shape)
        ok = (oy >= 0) & (oy < Ht) & (ox >= 0) & (ox < Wt)
        # drop ~10% pixels to emulate holes
        ok &= rng.random(oy.shape) > 0.1
        fwd_y[s] = np.clip(oy, 0, Ht - 1)
        fwd_x[s] = np.clip(ox, 0, Wt - 1)
        valid[s] = ok
    return fwd_y, fwd_x, valid


def window_tables(fwd_y, fwd_x, valid, WR, WC):
    """Per-tile window origins + in-window rel coords (amortised per pass)."""
    big = 1 << 28
    vy = np.where(valid > 0, fwd_y, big).min(axis=(2, 3))
    vx = np.where(valid > 0, fwd_x, big).min(axis=(2, 3))
    oy = np.where(vy == big, 0, vy).astype(np.int32)
    ox = np.where(vx == big, 0, vx).astype(np.int32)
    rel_y = np.where(valid > 0, fwd_y - oy[..., None, None], 0)
    rel_x = np.where(valid > 0, fwd_x - ox[..., None, None], 0)
    over = (rel_y >= WR) | (rel_x >= WC)
    frac_over = float((over * (valid > 0)).mean())
    rel_y = np.clip(rel_y, 0, WR - 1).astype(np.int32)
    rel_x = np.clip(rel_x, 0, WC - 1).astype(np.int32)
    return oy, ox, rel_y, rel_x, frac_over


def warp_kernel(oy_ref, ox_ref, tab_ref, rely_ref, relx_ref, val_ref,
                out_ref, win, sem, *, E, WR, WC, rowgate):
    s = pl.program_id(0)
    k = pl.program_id(1)
    y0 = pl.multiple_of(oy_ref[s, k] & ~7, 8)
    x0 = pl.multiple_of(ox_ref[s, k] & ~127, 128)
    cp = pltpu.make_async_copy(
        tab_ref.at[s, :, pl.ds(y0, WR + 8), pl.ds(x0, WC + 128)], win, sem)
    cp.start()
    ry = rely_ref[0] + (oy_ref[s, k] - y0)   # window rows incl. align slack
    rx = relx_ref[0] + (ox_ref[s, k] - x0)
    vmask = val_ref[0] > 0.5
    cp.wait()
    n_chunks = (WC + 128) // 128
    if rowgate:
        # loop-swapped: the (row, chunk) selection masks and lane indices are
        # computed ONCE and shared by all E element planes; the inner loop is
        # 1 lane-gather + 1 select per element
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(E)]
        for row in range(WR + 8):
            rsel = ry == row
            for cx in range(n_chunks):
                idx = jnp.clip(rx - cx * 128, 0, 127)
                msel = rsel & (rx >= cx * 128) & (rx < (cx + 1) * 128)
                for e in range(E):
                    src = jnp.broadcast_to(
                        win[e, row, cx * 128:(cx + 1) * 128][None], (8, 128))
                    v = jnp.take_along_axis(src, idx, axis=1,
                                            mode="promise_in_bounds")
                    accs[e] = jnp.where(msel, v, accs[e])
        for e in range(E):
            out_ref[e, 0] = jnp.where(vmask, accs[e], 0.0)
    else:
        for e in range(E):
            acc = jnp.zeros((8, 128), jnp.float32)
            for row in range(WR + 8):
                rsel = ry == row
                for cx in range(n_chunks):
                    idx = jnp.clip(rx - cx * 128, 0, 127)
                    src = jnp.broadcast_to(
                        win[e, row, cx * 128:(cx + 1) * 128][None], (8, 128))
                    v = jnp.take_along_axis(src, idx, axis=1,
                                            mode="promise_in_bounds")
                    acc = jnp.where(
                        rsel & (rx >= cx * 128) & (rx < (cx + 1) * 128), v,
                        acc)
            out_ref[e, 0] = jnp.where(vmask, acc, 0.0)


def run_pallas(tab, oy, ox, rel_y, rel_x, valid, *, E, WR, WC, rowgate,
               interpret=False):
    S, N = oy.shape
    kern = functools.partial(warp_kernel, E=E, WR=WR, WC=WC, rowgate=rowgate)
    smem = lambda: pl.BlockSpec((S, N), lambda s, k: (0, 0),
                                memory_space=pltpu.SMEM)
    plane = lambda: pl.BlockSpec((1, N_8(1), 128), lambda s, k: (s, k, 0))
    out = pl.pallas_call(
        kern,
        grid=(S, N),
        in_specs=[
            smem(), smem(),
            pl.BlockSpec(memory_space=pl.ANY),
            plane(), plane(), plane(),
        ],
        out_specs=pl.BlockSpec((E, 1, 8, 128), lambda s, k: (0, s, k, 0)),
        out_shape=jax.ShapeDtypeStruct((E, S, N * 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((E, WR + 8, WC + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(oy, ox, tab, rel_y, rel_x, valid)
    return out


def N_8(n):
    return n * 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--N", type=int, default=960)
    ap.add_argument("--Ht", type=int, default=768)
    ap.add_argument("--Wt", type=int, default=1024)
    ap.add_argument("--E", type=int, default=18)
    ap.add_argument("--WR", type=int, default=24)
    ap.add_argument("--WC", type=int, default=256)
    ap.add_argument("--rot", type=float, default=10.0)
    ap.add_argument("--scale", type=float, default=0.9)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    S, N, Ht, Wt, E = args.S, args.N, args.Ht, args.Wt, args.E
    WR, WC = args.WR, args.WC

    fwd_y, fwd_x, valid = make_map(S, N, Ht, Wt, args.rot, args.scale)
    oy, ox, rel_y, rel_x, frac_over = window_tables(fwd_y, fwd_x, valid,
                                                    WR, WC)
    print(f"S={S} N={N} E={E} window=({WR}+8, {WC}+128) "
          f"overflow frac={frac_over:.4f}")
    if frac_over > 0:
        valid = valid * (np.asarray(rel_y) < WR) * (np.asarray(rel_x) < WC)

    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.standard_normal((S, E, Ht, Wt), np.float32))
    # pad the table so window DMAs at the bottom/right edge stay in bounds
    tab = jnp.pad(tab, ((0, 0), (0, 0), (0, WR + 16), (0, WC + 256)))

    fy = jnp.asarray(fwd_y.reshape(S, N * 8, 128))
    fx = jnp.asarray(fwd_x.reshape(S, N * 8, 128))
    val = jnp.asarray(valid.reshape(S, N * 8, 128))
    oyj = jnp.asarray(oy)
    oxj = jnp.asarray(ox)
    ryj = jnp.asarray(rel_y.reshape(S, N * 8, 128))
    rxj = jnp.asarray(rel_x.reshape(S, N * 8, 128))

    # ---- XLA row-gather baseline (the production fwd transport) -----------
    flat_idx = (fy * (Wt + WC + 256) + fx).reshape(S, -1)
    tabr = tab.reshape(S, E, -1).transpose(0, 2, 1)   # (S, HW, E) rows

    def xla_gather(tabr, idx):
        return jax.vmap(lambda t, i: t[i])(tabr, idx)

    jx = jax.jit(xla_gather)
    tx, ref_rows = fence(jx, tabr, flat_idx)
    print(f"XLA row-gather (S,{N * 1024},{E}): {tx * 1e3:8.1f} ms")
    ref = np.asarray(ref_rows).reshape(S, N * 8, 128, E)
    ref = np.moveaxis(ref, -1, 0) * np.asarray(val)[None]

    for rowgate in (False, True):
        name = "swapped" if rowgate else "onehot "
        jp = jax.jit(functools.partial(
            run_pallas, E=E, WR=WR, WC=WC, rowgate=rowgate,
            interpret=args.interpret))
        try:
            tp, out = fence(jp, tab, oyj, oxj, ryj, rxj, val)
        except Exception as ex:
            print(f"pallas {name}: FAILED {type(ex).__name__}: {ex}")
            continue
        out = np.asarray(out)
        exact = np.array_equal(out, ref)
        print(f"pallas {name}: {tp * 1e3:8.1f} ms  exact={exact} "
              f"({tx / tp:.1f}x vs XLA)")
        if not exact:
            bad = np.abs(out - ref) > 0
            print(f"  mismatch frac {bad.mean():.6f}")


if __name__ == "__main__":
    main()
