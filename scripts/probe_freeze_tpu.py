#!/usr/bin/env python
"""Measure converged-pixel freezing (config.freeze_converged) on hardware.

Runs the bench operating point (1024x768x8src CubeRoom ring, photometric +
seeded geometric pass) with freezing off and on, reporting steady-state pass
time and quality vs the analytic ground truth.  Decision record for PERF.md.
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core.camera import stack_cameras
from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)

W, H, n_src = 1024, 768, 8
if "--small" in sys.argv:
    W, H, n_src = 512, 384, 8

cams = make_ring_of_cameras(1 + n_src, width=W, height=H, focal=0.9 * W,
                            radius=0.25)
cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
try:
    data = np.load(cache)
    images, gt_depth = data["images"], data["depths"]
except Exception:
    images, gt_depth, _ = render_scene(cams, CubeRoom(), W, H)
    np.savez(cache, images=images, depths=gt_depth)

from acmmp_spherical_tpu.ops.rectify import (
    host_rectifiable, rect_comp_shape, rect_init_window,
    rect_live_tile_count, rect_shape, rect_warp_window,
)

dmin, dmax = np.asarray(cams[0].depth_range)
rhw = rect_shape(H, W)
stacked = stack_cameras(cams[1:])
assert host_rectifiable(cams[0], stacked, rhw)
comp_hw = rect_comp_shape(cams[0], stacked, rhw)
live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
iwin = rect_init_window(cams[0], stacked, rhw)
warp_hw = rect_warp_window(cams[0], stacked, rhw)
print(f"[probe] comp_hw={comp_hw} live_n={live_n} iwin={iwin} "
      f"warp={warp_hw}", file=sys.stderr)

base = dataclasses.replace(
    PatchMatchParams().with_depth_range(dmin, dmax),
    fast_ncc=jax.default_backend() == "tpu",
    rect_ncc=True, rect_comp_hw=comp_hw, rect_live_n=live_n,
    rect_init=iwin > 0, rect_init_win=iwin or 384, rect_warp_hw=warp_hw,
)
images_d = jax.device_put(jnp.asarray(images))
inputs = PatchMatchInputs(
    ref_image=images_d[0], src_images=images_d[1:], ref_cam=cams[0],
    src_cams=stacked, src_valid=jnp.ones(n_src, bool),
    depth_range=jnp.asarray([dmin, dmax], jnp.float32),
)

for fz in (False, True):
    params = dataclasses.replace(base, freeze_converged=fz)
    t0 = time.perf_counter()
    out = run_patchmatch(inputs, params, jax.random.key(0))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        out = run_patchmatch(inputs, params, jax.random.key(r + 1))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    d = np.asarray(out[0])
    rel = (np.abs(d[8:-8, 8:-8] - gt_depth[0][8:-8, 8:-8])
           / gt_depth[0][8:-8, 8:-8])
    print(f"freeze={fz}: compile {compile_s:.1f}s  "
          f"times {['%.3f' % t for t in times]}  "
          f"med rel err {np.median(rel):.5f}  "
          f"frac<1% {(rel < 0.01).mean():.3f}")
