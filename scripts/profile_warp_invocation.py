#!/usr/bin/env python
"""End-to-end timing of rect_batched_ncc with the XLA row-gather transport
vs the Pallas warp-gather transport (rect_warp_hw) on the bench scene."""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def fence(f, *a, reps=3, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 768])
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--cands", type=int, default=9)
    ap.add_argument("--parity", type=int, default=0)
    args = ap.parse_args()

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.core import geometry as G
    from acmmp_spherical_tpu.ops.pallas.ncc_rect import rect_batched_ncc
    from acmmp_spherical_tpu.ops.rectify import (
        build_rect_context, rect_comp_shape, rect_live_tile_count,
        rect_shape, rect_warp_window,
    )
    from acmmp_spherical_tpu.ops.sampling import checkerboard_pack, grid_coords
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    n_src = args.views
    C = args.cands
    scene = CubeRoom()
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H,
                                focal=0.9 * W, radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        dat = np.load(cache)
        images, depths = dat["images"], dat["depths"]
    except Exception:
        images, depths, _ = render_scene(cams, scene, W, H)
        np.savez(cache, images=images, depths=depths)

    dmin, dmax = np.asarray(cams[0].depth_range)
    rhw = rect_shape(H, W)
    stacked = stack_cameras(cams[1:])
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    warp_hw = rect_warp_window(cams[0], stacked, rhw)
    print(f"comp_hw={comp_hw} live_n={live_n} warp_hw={warp_hw}")

    images_d = jax.device_put(jnp.asarray(images))
    dr = (jnp.float32(dmin), jnp.float32(dmax))

    # ground-truth-ish smooth plane field
    xs, ys = grid_coords(H, W)
    n_cam = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(-1.0)
    wpl = G.dist_to_origin(cams[0], xs, ys, jnp.asarray(depths[0]), n_cam)
    par = args.parity
    n_p = jnp.moveaxis(checkerboard_pack(
        jnp.moveaxis(jnp.repeat(n_cam[None], C, 0), -1, 1), par), 1, -1)
    w_p = checkerboard_pack(jnp.repeat(wpl[None], C, 0), par)

    base = PatchMatchParams().with_depth_range(dmin, dmax)
    for name, whw in (("xla ", None), ("warp", warp_hw)):
        if name == "warp" and whw is None:
            print("warp window unavailable; skipping")
            continue
        params = dataclasses.replace(
            base, rect_ncc=True, rect_comp_hw=comp_hw, rect_live_n=live_n,
            rect_warp_hw=whw)
        rect = jax.jit(functools.partial(
            build_rect_context, comp_hw=comp_hw, live_n=live_n,
            warp_hw=whw))(
            images_d[0], images_d[1:], cams[0], stacked, dr)
        jax.block_until_ready(rect)
        tctx, _ = fence(jax.jit(functools.partial(
            build_rect_context, comp_hw=comp_hw, live_n=live_n,
            warp_hw=whw)),
            images_d[0], images_d[1:], cams[0], stacked, dr)
        run = jax.jit(functools.partial(
            rect_batched_ncc, params=params, parity=par))
        t, out = fence(run, rect, n_p, w_p)
        print(f"{name} transport: C={C} parity={par} invocation "
              f"{t * 1e3:8.1f} ms   (context build {tctx * 1e3:.0f} ms)")
        s = float(jnp.sum(jnp.where(out < 1.99, out, 0.0)))
        n = int(jnp.sum(out < 1.99))
        print(f"   checksum sum={s:.3f} n_finite={n}")


if __name__ == "__main__":
    main()
