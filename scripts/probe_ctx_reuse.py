#!/usr/bin/env python
"""Measure the cross-pass context-reuse saving at the bench operating point.

Times the split-mode prepare stage (pipeline/patchmatch._split_prepare) for
a GEOMETRIC pass three ways:
  * fresh        -- full build: warps + transport maps + sdisp (what every
                    pass paid before cfg.ctx_reuse)
  * reuse        -- adopt the cached depth-independent pieces, rebuild only
                    the warped source disparities (what geom passes pay now)
  * photometric  -- full build without sdisp (the one build the cache pays)

The pipeline saving per (image, scale) is ~3x (fresh - reuse): the prior
re-run, geom0 and geom1 all skip the full build.
"""

import argparse
import dataclasses
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
    args = ap.parse_args()

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.ops.rectify import (
        rect_comp_shape, rect_init_window, rect_inv_attrib_ok,
        rect_live_tile_count, rect_shape, rect_warp_window,
    )
    from acmmp_spherical_tpu.pipeline.patchmatch import _split_prepare
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    n_src = args.views
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H,
                                focal=0.9 * W, radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        data = np.load(cache)
        images, depths = data["images"], data["depths"]
    except Exception:
        images, depths, _ = render_scene(cams, CubeRoom(), W, H)
        np.savez(cache, images=images, depths=depths)

    dmin, dmax = np.asarray(cams[0].depth_range)
    rhw = rect_shape(H, W)
    stacked = stack_cameras(cams[1:])
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    iwin = rect_init_window(cams[0], stacked, rhw)
    warp_hw = rect_warp_window(cams[0], stacked, rhw)
    params = dataclasses.replace(
        PatchMatchParams().with_depth_range(dmin, dmax), fast_ncc=True,
        rect_ncc=True, rect_comp_hw=comp_hw, rect_live_n=live_n,
        rect_init=iwin > 0, rect_init_win=iwin or 384, rect_warp_hw=warp_hw,
        rect_inv_attrib=rect_inv_attrib_ok(cams[0], stacked, rhw),
    )
    gparams = params.with_geom(False)

    images_d = jax.device_put(jnp.asarray(images))
    depths_d = jax.device_put(jnp.asarray(depths[1:]))
    dr = jnp.asarray([dmin, dmax], jnp.float32)
    base = PatchMatchInputs(
        ref_image=images_d[0], src_images=images_d[1:], ref_cam=cams[0],
        src_cams=stacked, src_valid=jnp.ones(n_src, bool), depth_range=dr)
    geom = base._replace(src_depths=depths_d)

    t_photo, photo = fence(_split_prepare, base, params)
    print(f"prepare photometric (full build, no sdisp): {t_photo*1e3:8.1f} ms")

    t_fresh, fresh = fence(_split_prepare, geom, gparams)
    print(f"prepare geom FRESH  (full build + sdisp):   {t_fresh*1e3:8.1f} ms")

    slim = PatchMatchInputs(
        ref_image=None, src_images=None, ref_cam=None, src_cams=None,
        src_valid=None, src_packed=photo.src_packed,
        rect=photo.rect._replace(rect_sdisp=None))
    t_reuse, reused = fence(_split_prepare, geom, gparams, slim)
    print(f"prepare geom REUSE  (sdisp only):           {t_reuse*1e3:8.1f} ms")
    print(f"saving per reusing pass: {(t_fresh - t_reuse)*1e3:.1f} ms "
          f"(x3 per image per scale: prior re-run + geom0 + geom1)")

    # parity spot-check on device: the reused context's cost-bearing pieces
    # must match the fresh build exactly
    for name in ("rect_ref", "rect_src", "srow", "rect_sdisp"):
        a, b = getattr(fresh.rect, name), getattr(reused.rect, name)
        same = bool(jnp.array_equal(a, b)) if a is not None else b is None
        print(f"  equal {name}: {same}")
        assert same, name


if __name__ == "__main__":
    main()
