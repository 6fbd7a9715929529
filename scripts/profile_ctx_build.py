#!/usr/bin/env python
"""Stage timing of build_rect_context at the bench point: pair rect math,
bicubic packs, ref/src warps, backward map + transport-map scatters."""

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
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops import rectify as RT
    from acmmp_spherical_tpu.ops.sampling import grid_coords, pack_bicubic
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H, n_src = 1024, 768, 8
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H, focal=0.9 * W,
                                radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        images = np.load(cache)["images"]
    except Exception:
        images, d, _ = render_scene(cams, CubeRoom(), W, H)
        np.savez(cache, images=images, depths=d)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    dmin, dmax = np.asarray(ref_cam.depth_range)
    hr, wr = RT.rect_shape(H, W)
    comp_hw = RT.rect_comp_shape(ref_cam, src_cams, (hr, wr))
    live_n = RT.rect_live_tile_count(ref_cam, src_cams, (hr, wr), comp_hw)
    warp_hw = RT.rect_warp_window(ref_cam, src_cams, (hr, wr))
    hb, wb = comp_hw
    images_d = jax.device_put(jnp.asarray(images))
    ref_image, src_images = images_d[0], images_d[1:]

    pr = jax.jit(lambda: RT.build_pair_rect(ref_cam, src_cams, (hr, wr)))()
    jax.block_until_ready(pr)

    t_pack, ref_p16 = fence(jax.jit(lambda img: pack_bicubic(
        img, ref_cam.width, ref_cam.height)), ref_image)
    print(f"pack_bicubic (ref, 1 of 9): {t_pack*1e3:8.1f} ms")

    warp_ref = jax.jit(lambda H0inv, p16: jax.vmap(
        lambda h: RT.warp_to_rect(ref_image, h, ref_cam.width,
                                  ref_cam.height, (hr, wr), sentinel=False,
                                  packed16=p16))(H0inv))
    t_wref, rect_ref = fence(warp_ref, pr.H0inv, ref_p16)
    print(f"warp rect_ref (8 pairs): {t_wref*1e3:8.1f} ms")

    src_p16 = jax.jit(lambda imgs: jax.vmap(
        lambda img, wd, ht: pack_bicubic(img, wd, ht))(
        imgs, src_cams.width, src_cams.height))(src_images)
    jax.block_until_ready(src_p16)
    warp_src = jax.jit(lambda imgs, pks, H1inv: jax.vmap(
        lambda img, pk, h, wd, ht: RT.warp_to_rect(
            img, h, wd, ht, (hr, wr), sentinel=True, packed16=pk))(
        imgs, pks, H1inv, src_cams.width, src_cams.height))
    t_wsrc, _ = fence(warp_src, src_images, src_p16, pr.H1inv)
    print(f"warp rect_src (8 pairs): {t_wsrc*1e3:8.1f} ms")

    xs_o, ys_o = grid_coords(H, W)

    def bwd_stage(H0, oy, ox):
        def bwd(H0_, oy_, ox_):
            xr, yr, z = RT.rect_coords(H0_, xs_o, ys_o)
            xb = jnp.round(xr) - ox_
            yb = jnp.round(yr) - oy_
            ok = (z > 0) & (xb >= 0) & (xb < wb) & (yb >= 0) & (yb < hb)
            return (jnp.clip(xb, 0, wb - 1).astype(jnp.int32).reshape(-1),
                    jnp.clip(yb, 0, hb - 1).astype(jnp.int32).reshape(-1), ok)
        return jax.vmap(bwd)(H0, oy, ox)

    corners = jnp.asarray([[0.0, 0.0], [W - 1.0, 0.0],
                           [0.0, H - 1.0], [W - 1.0, H - 1.0]], jnp.float32)

    def offsets(H0):
        xr, yr, z = RT.rect_coords(H0, corners[:, 0], corners[:, 1])
        ox = jnp.clip(jnp.floor((jnp.min(xr) - 2.0) / 128.0) * 128.0,
                      0.0, float(wr - wb))
        oy = jnp.clip(jnp.floor((jnp.min(yr) - 2.0) / 8.0) * 8.0,
                      0.0, float(hr - hb))
        return oy, ox

    off = jax.jit(lambda H0: jax.vmap(offsets)(H0))(pr.H0)
    t_bwd, bwd_out = fence(jax.jit(bwd_stage), pr.H0, off[0], off[1])
    print(f"backward map: {t_bwd*1e3:8.1f} ms")

    t_maps, _ = fence(jax.jit(functools.partial(
        RT.build_transport_maps, comp_hw=comp_hw, hw=(H, W), live_n=live_n,
        warp_hw=warp_hw)), bwd_out[0], bwd_out[1], bwd_out[2],
        oy=off[0], ox=off[1])
    print(f"build_transport_maps (incl. scatters + warp tables): "
          f"{t_maps*1e3:8.1f} ms")

    t_all, _ = fence(jax.jit(functools.partial(
        RT.build_rect_context, comp_hw=comp_hw, live_n=live_n,
        warp_hw=warp_hw)), ref_image, src_images, ref_cam, src_cams,
        (jnp.float32(dmin), jnp.float32(dmax)))
    print(f"full build_rect_context: {t_all*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
