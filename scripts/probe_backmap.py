#!/usr/bin/env python
"""Isolate the backmap gather cost at the bench point (round-5 anatomy).

run_rect_kernel's post-step maps the kernel's compact-layout cost planes
back to the evaluation grid with one XLA wide-row gather per pair:
rows = eval pixels, elements = C candidate planes.  Measures, for the
bench-point maps (full + parity), the gather at C in {1, 5, 9} plus the
where-masking, to size the prize of an in-kernel reverse-warp backmap.

Usage: python scripts/probe_backmap.py [--size 1024 768] [--views 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(f, *a, reps=5):
    import jax

    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 768])
    ap.add_argument("--views", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.rectify import (
        build_rect_context, rect_comp_shape, rect_live_tile_count,
        rect_shape, rect_warp_window,
    )
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    S = args.views
    cams = make_ring_of_cameras(1 + S, width=W, height=H, focal=0.9 * W,
                                radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{S}.npz"
    try:
        images = np.load(cache)["images"]
        assert images.shape == (1 + S, H, W)
    except Exception:
        images, d, _ = render_scene(cams, CubeRoom(), W, H)
        np.savez(cache, images=images, depths=d)
    stacked = stack_cameras(cams[1:])
    rhw = rect_shape(H, W)
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    warp_hw = rect_warp_window(cams[0], stacked, rhw)
    dmin, dmax = np.asarray(cams[0].depth_range)
    images_d = jax.device_put(jnp.asarray(images))
    ctx = jax.jit(lambda: build_rect_context(
        images_d[0], images_d[1:], cams[0], stacked,
        (jnp.float32(dmin), jnp.float32(dmax)), comp_hw=comp_hw,
        live_n=live_n, warp_hw=warp_hw))()
    jax.block_until_ready(ctx)

    for label, maps, (Hh, Ww) in (("full", ctx.maps[0], (H, W)),
                                  ("parity", ctx.maps[1], (H, W // 2))):
        K8 = maps.fwd_valid.shape[1]
        for C in (1, 5, 9):
            key = jax.random.key(0)
            planes = jax.random.normal(key, (C, S, K8, 128), jnp.float32)

            @jax.jit
            def backmap(plane):
                back = plane.reshape(C, S, K8 * 128).transpose(1, 2, 0)
                picked = jax.vmap(lambda t, idx: t[idx])(back, maps.bwd_cidx)
                out = picked.transpose(2, 0, 1).reshape(C, S, Hh, Ww)
                return jnp.where(maps.bwd_valid.reshape(1, S, Hh, Ww), out,
                                 2.0)

            t = fence(backmap, planes)
            print(f"backmap {label:6s} C={C}: {t*1e3:7.1f} ms "
                  f"(rows {S*Hh*Ww/1e6:.1f} M)")


if __name__ == "__main__":
    main()
