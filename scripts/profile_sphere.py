#!/usr/bin/env python
"""Stage anatomy of the spherical fast path at the bench operating point.

The pinhole path got the round-4 warp-gather transport (6.47 -> 4.39 s);
the sphere path still rides the XLA fwd row-gather (PERF.md round 4:
"sphere ... unchanged (no warp path yet)").  Before building a sphere warp
path, measure where the 1024x512x6src sphere pass actually spends time:

  ctx        build_sphere_rect_context (once per pass)
  coeff      the XLA pre-step of one C=9 invocation: einsum + atan2
             disparity targets -> (D, AB) tables (no transport, no kernel)
  fwd        coeff + the fwd row-gather onto the compact tiles
  invoke     one full C=9 sphere_batched_ncc (coeff + fwd + kernel + backmap)
  halfstep   one checkerboard halfstep
  pass       full run_patchmatch photometric pass

Usage: python scripts/profile_sphere.py [--size 1024 512] [--views 6]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(f, *a, reps=3, **kw):
    out = f(*a, **kw)
    import jax

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
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 512])
    ap.add_argument("--views", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core import geometry as G
    from acmmp_spherical_tpu.core.camera import SPHERE, stack_cameras
    from acmmp_spherical_tpu.ops.pallas.ncc_rect import pack_ab
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs, prepare_inputs
    from acmmp_spherical_tpu.ops.sampling import grid_coords
    from acmmp_spherical_tpu.ops.sphere_rect import (
        _pack_hw_axes, build_sphere_rect_context, sphere_batched_ncc,
        sphere_init_window, sphere_live_tile_count, sphere_rectifiable, PI,
    )
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    S = args.views
    scene = CubeRoom()
    cams = make_ring_of_cameras(1 + S, model=SPHERE, width=W, height=H)
    cache = f"/tmp/acmmp_bench_sphere_{W}x{H}x{S}.npz"
    try:
        images = np.load(cache)["images"]
        assert images.shape == (1 + S, H, W)
    except Exception:
        images, depths, _ = render_scene(cams, scene, W, H)
        np.savez(cache, images=images, depths=depths)
    ref_cam, src_cams = cams[0], stack_cameras(cams[1:])
    assert sphere_rectifiable(ref_cam, src_cams)
    siwin = sphere_init_window(ref_cam, src_cams)
    slive = sphere_live_tile_count(ref_cam)
    dmin, dmax = np.asarray(ref_cam.depth_range)
    params = dataclasses.replace(
        PatchMatchParams().with_depth_range(dmin, dmax),
        rect_ncc=True, rect_init=siwin > 0, rect_init_win=siwin or 384,
        sphere_live_n=slive)
    images_d = jax.device_put(jnp.asarray(images))
    dr = jnp.asarray([dmin, dmax], jnp.float32)
    inputs = PatchMatchInputs(
        ref_image=images_d[0], src_images=images_d[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(S, bool), depth_range=dr)

    ctx_f = jax.jit(lambda: build_sphere_rect_context(
        images_d[0], images_d[1:], ref_cam, src_cams, (dr[0], dr[1]),
        live_n=slive))
    t_ctx, ctx = fence(ctx_f)
    print(f"ctx build: {t_ctx*1e3:.0f} ms")

    # C=9 candidate fields: the GT-ish smooth field replicated (shape is
    # what matters for timing)
    xs, ys = grid_coords(H, W)
    key = jax.random.key(0)
    n0 = jnp.stack([jnp.zeros((H, W)), jnp.zeros((H, W)),
                    -jnp.ones((H, W))], -1)
    n_cam = n0 / jnp.linalg.norm(n0, axis=-1, keepdims=True)
    w0 = jnp.full((H, W), -3.0)
    C = 9
    normals = jnp.stack([n_cam] * C)
    ws = jnp.stack([w0 * (1 + 0.01 * c) for c in range(C)])
    maps = ctx.maps[0]

    @jax.jit
    def coeff_only(normals, ws):
        # replicate sphere_batched_ncc's XLA pre-step (full grid)
        rays, slat_a, lat_a = ctx.rays_cam, ctx.slat, ctx.lat
        Bn = ctx.baseline[:, None, None, None]
        wsl = jnp.moveaxis(ws, 0, -1)[None]
        disps, oks = [], []
        for k in range(3):
            ndot = jnp.einsum("chwj,shwj->shwc", normals, rays[..., k, :],
                              precision=jax.lax.Precision.HIGHEST)
            d = -wsl / jnp.where(jnp.abs(ndot) < 1e-20, 1e-20, ndot)
            sl = slat_a[..., k][..., None]
            cl = jnp.sqrt(jnp.maximum(1.0 - sl * sl, 1e-12))
            u = d * sl + Bn
            v = d * cl
            lat_s = jnp.arctan2(u, v)
            disp = (lat_s - lat_a[..., k][..., None]) * (H / PI)
            disps.append(disp)
            oks.append((d > 0) & (v > 0) & jnp.isfinite(disp))
        good = oks[0] & oks[1] & oks[2]
        D = jnp.where(good, disps[0], -1e9)
        A = jnp.where(good, disps[1] - disps[0], 0.0)
        Bc = jnp.where(good, disps[2] - disps[0], 0.0)
        return jnp.stack([D, pack_ab(A, Bc)], -1).reshape(S, H * W, C * 2)

    t_coeff, table = fence(coeff_only, normals, ws)
    print(f"coeff (C=9, full grid): {t_coeff*1e3:.0f} ms")

    @jax.jit
    def fwd_only(normals, ws):
        table = coeff_only(normals, ws)
        K8 = maps.fwd_valid.shape[1]
        dab = jax.vmap(lambda t, idx: t[idx])(table, maps.fwd_idx)
        return dab

    t_fwd, _ = fence(fwd_only, normals, ws)
    print(f"coeff+fwd gather: {t_fwd*1e3:.0f} ms  "
          f"(gather alone ~{(t_fwd-t_coeff)*1e3:.0f} ms)")

    invoke = jax.jit(functools.partial(sphere_batched_ncc, params=params))
    t_inv, _ = fence(lambda: sphere_batched_ncc(ctx, normals, ws, params))
    print(f"full C=9 invocation: {t_inv*1e3:.0f} ms")

    t_pass, _ = fence(lambda k: run_patchmatch(inputs, params, k),
                      jax.random.key(1), reps=2)
    print(f"full photometric pass: {t_pass:.2f} s")


if __name__ == "__main__":
    main()
