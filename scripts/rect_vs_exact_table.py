#!/usr/bin/env python
"""Exact-vs-windowed-vs-rect quality table (VERDICT r3 weak #5 / next #8).

One seeded photometric pass per (size, path) on the CubeRoom and
OccludedRoom goldens; reports median rel depth err, frac < 1%, and the
occluder edge-band statistics.  Writes one JSON with every row so the
discontinuity ratchet (tests/test_discontinuity.py) can be pinned to
measured values.

Run on the TPU host:  python scripts/rect_vs_exact_table.py --out TABLE.json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def run_pass(cams, images, depth_range, *, fast, rect, size_hint):
    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    if fast:
        params = dataclasses.replace(params, fast_ncc=True)
    if rect:
        from acmmp_spherical_tpu.ops.rectify import (
            rect_comp_shape, rect_init_window, rect_live_tile_count,
            rect_shape, rect_warp_window,
        )

        H, W = images[0].shape
        rhw = rect_shape(H, W)
        chw = rect_comp_shape(ref_cam, src_cams, rhw)
        iwin = rect_init_window(ref_cam, src_cams, rhw)
        whw = rect_warp_window(ref_cam, src_cams, rhw)
        params = dataclasses.replace(
            params, rect_ncc=True, rect_comp_hw=chw,
            rect_live_n=rect_live_tile_count(ref_cam, src_cams, rhw, chw),
            rect_init=iwin > 0, rect_init_win=iwin or 384,
            rect_warp_hw=whw)
    inputs = PatchMatchInputs(
        ref_image=jnp.asarray(images[0]),
        src_images=jnp.asarray(images[1:]),
        ref_cam=ref_cam, src_cams=src_cams,
        src_valid=jnp.ones(len(cams) - 1, bool),
        depth_range=jnp.asarray(depth_range, jnp.float32),
    )
    out = run_patchmatch(inputs, params, jax.random.key(3))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_patchmatch(inputs, params, jax.random.key(3))
    jax.block_until_ready(out)
    return np.asarray(out[0]), time.perf_counter() - t0


def stats(d, gt, band=None):
    interior = np.s_[8:-8, 8:-8]
    rel = np.abs(d - gt) / gt
    row = {
        "med": round(float(np.median(rel[interior])), 5),
        "frac_lt_1pct": round(float(np.mean(rel[interior] < 0.01)), 4),
    }
    if band is not None:
        rb = rel[interior][band[interior]]
        row["med_band"] = round(float(np.median(rb)), 5)
        row["band_frac_lt_1pct"] = round(float(np.mean(rb < 0.01)), 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[512, 384, 1024, 768])
    ap.add_argument("--views", type=int, default=8)
    args = ap.parse_args()

    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, OccludedRoom, make_ring_of_cameras, render_scene,
    )

    sizes = [(args.sizes[i], args.sizes[i + 1])
             for i in range(0, len(args.sizes), 2)]
    rows = []
    for W, H in sizes:
        for scene_name, scene in (("cube", CubeRoom()),
                                  ("occluded", OccludedRoom())):
            cams = make_ring_of_cameras(1 + args.views, width=W, height=H,
                                        focal=0.9 * W, radius=0.25)
            cache = (f"/tmp/acmmp_table_{scene_name}_{W}x{H}x"
                     f"{args.views}.npz")
            try:
                dat = np.load(cache)
                images, depths = dat["images"], dat["depths"]
            except Exception:
                images, depths, _ = render_scene(cams, scene, W, H)
                np.savez(cache, images=images, depths=depths)
            gt = depths[0]
            band = None
            if scene_name == "occluded":
                # edge band: pixels within 6 px of a depth discontinuity
                import scipy.ndimage as ndi

                edges = (np.abs(np.diff(gt, axis=0, prepend=gt[:1]))
                         > 0.05 * gt).astype(np.float32)
                edges += (np.abs(np.diff(gt, axis=1, prepend=gt[:, :1]))
                          > 0.05 * gt)
                band = ndi.binary_dilation(edges > 0, iterations=6)
            dr = np.asarray(cams[0].depth_range)
            configs = [("windowed", True, False), ("rect", False, True)]
            if (W, H) == (512, 384):
                configs.insert(0, ("exact", False, False))
            for name, fast, rect in configs:
                d, dt = run_pass(cams, images, dr, fast=fast, rect=rect,
                                 size_hint=(W, H))
                row = {"size": f"{W}x{H}", "scene": scene_name,
                       "path": name, "pass_s": round(dt, 2),
                       **stats(d, gt, band)}
                rows.append(row)
                print(json.dumps(row), file=sys.stderr)
    out = {"rows": rows}
    print(json.dumps(out))
    if args.out:
        import pathlib

        pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
