#!/usr/bin/env python
"""Per-change REAL-TPU smoke gate for every Pallas kernel variant.

Round 4 shipped two kernel changes that passed interpret-mode CI and failed
Mosaic verification on hardware (float iota at e853b56; the scalar bf16
pack_ab bitcast that crashed BENCH_r04).  Interpret mode does not run the
Mosaic verifier, so ONLY a real-device compile+run protects kernel commits.

This script runs, at tiny shapes on the attached TPU, one pass through each
production kernel configuration:

  window       fused windowed-NCC photometric pass (ops/pallas/ncc_window)
  rect         epipolar-rectified photometric pass: rect context build
               (warp_image kernels), rect_init, rect kernel, warp transport
  rect_geom    fused rect+geom pass (warp_src_disparities + geom kernel)
  sphere       pole-rotated spherical rect photometric pass
  sphere_geom  fused meridian-disparity spherical geom pass

Usage:  python scripts/tpu_smoke.py            # all variants
        python scripts/tpu_smoke.py --json OUT # also write a JSON record

Exit code 0 iff every variant compiled AND ran on the device.  Run this
after every commit touching ops/pallas/ or ops/rectify.py or
ops/sphere_rect.py (VERDICT r4 next-step 2).
"""

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--size", type=int, nargs=2, default=[96, 72],
                    metavar=("W", "H"))
    ap.add_argument("--views", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import SPHERE, stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.ops.rectify import (
        host_rectifiable, rect_comp_shape, rect_init_window,
        rect_live_tile_count, rect_shape, rect_warp_window,
    )
    from acmmp_spherical_tpu.ops.sphere_rect import (
        sphere_init_window, sphere_live_tile_count, sphere_rectifiable,
    )
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"[smoke] REFUSING to run on {dev.platform}: this gate only "
              "means anything on real hardware (interpret mode skips the "
              "Mosaic verifier)", file=sys.stderr)
        sys.exit(2)
    print(f"[smoke] device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    W, H = args.size
    n_src = args.views
    scene = CubeRoom()
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H,
                                focal=0.9 * W, radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        data = np.load(cache)
        images, depths = data["images"], data["depths"]
    except Exception:
        images, depths, _ = render_scene(cams, scene, W, H)
        try:
            np.savez(cache, images=images, depths=depths)
        except Exception:
            pass

    dmin, dmax = np.asarray(cams[0].depth_range)
    stacked = stack_cameras(cams[1:])
    images_d = jax.device_put(jnp.asarray(images))
    inputs = PatchMatchInputs(
        ref_image=images_d[0], src_images=images_d[1:],
        ref_cam=cams[0], src_cams=stacked,
        src_valid=jnp.ones(n_src, bool),
        depth_range=jnp.asarray([dmin, dmax], jnp.float32),
    )
    base = PatchMatchParams().with_depth_range(dmin, dmax)

    rhw = rect_shape(H, W)
    assert host_rectifiable(cams[0], stacked, rhw), \
        "smoke ring scene must rectify; did the ring geometry change?"
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    iwin = rect_init_window(cams[0], stacked, rhw)
    warp_hw = rect_warp_window(cams[0], stacked, rhw)
    rect_params = dataclasses.replace(
        base, fast_ncc=True, rect_ncc=True, rect_comp_hw=comp_hw,
        rect_live_n=live_n, rect_init=iwin > 0, rect_init_win=iwin or 384,
        rect_warp_hw=warp_hw,
    )

    results = {}
    failures = []
    photometric_out = {}

    def run(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.block_until_ready(out)
            dt = round(time.perf_counter() - t0, 1)
            results[name] = {"ok": True, "s": dt}
            print(f"[smoke] {name:12s} OK   {dt:6.1f}s", file=sys.stderr)
            return out
        except Exception as e:
            dt = round(time.perf_counter() - t0, 1)
            msg = f"{type(e).__name__}: {e}"
            results[name] = {"ok": False, "s": dt, "error": msg[:2000]}
            failures.append(name)
            print(f"[smoke] {name:12s} FAIL {dt:6.1f}s\n{traceback.format_exc()}",
                  file=sys.stderr)
            return None

    # 1. fused window kernel (the non-rectifiable-scene production path)
    win_params = dataclasses.replace(base, fast_ncc=True, rect_ncc=False)
    run("window",
        lambda: run_patchmatch(inputs, win_params, jax.random.key(0)))

    # 2. full rect path: warp_image context kernels + rect_init + rect
    #    kernel + warp transport
    out = run("rect",
              lambda: run_patchmatch(inputs, rect_params, jax.random.key(0)))
    if out is not None:
        photometric_out["rect"] = out

    # 3. fused rect+geom (warp_src_disparities + geom-consistency kernel)
    if "rect" in photometric_out:
        out = photometric_out["rect"]
        geom_params = rect_params.with_geom(multi_geometry=False)
        geom_inputs = inputs._replace(
            src_depths=jnp.broadcast_to(out[0], (n_src, H, W)))
        run("rect_geom",
            lambda: run_patchmatch(geom_inputs, geom_params,
                                   jax.random.key(1),
                                   seed_normal_world=out[1],
                                   seed_depth=out[0]))
    else:
        results["rect_geom"] = {"ok": False, "error": "skipped: rect failed"}
        failures.append("rect_geom")

    # 4+5. spherical rect photometric + geom
    Ws, Hs = 128, 64
    scams = make_ring_of_cameras(1 + n_src, model=SPHERE, width=Ws, height=Hs)
    scache = f"/tmp/acmmp_bench_sphere_{Ws}x{Hs}x{n_src}.npz"
    try:
        simages = np.load(scache)["images"]
    except Exception:
        simages, _, _ = render_scene(scams, scene, Ws, Hs)
        try:
            np.savez(scache, images=simages)
        except Exception:
            pass
    sstacked = stack_cameras(scams[1:])
    assert sphere_rectifiable(scams[0], sstacked)
    siwin = sphere_init_window(scams[0], sstacked)
    slive = sphere_live_tile_count(scams[0])
    sparams = dataclasses.replace(
        PatchMatchParams().with_depth_range(*np.asarray(scams[0].depth_range)),
        rect_ncc=True, rect_init=siwin > 0, rect_init_win=siwin or 384,
        sphere_live_n=slive,
    )
    simages_d = jax.device_put(jnp.asarray(simages))
    sdmin, sdmax = np.asarray(scams[0].depth_range)
    sinputs = PatchMatchInputs(
        ref_image=simages_d[0], src_images=simages_d[1:],
        ref_cam=scams[0], src_cams=sstacked,
        src_valid=jnp.ones(n_src, bool),
        depth_range=jnp.asarray([sdmin, sdmax], jnp.float32),
    )
    sout = run("sphere",
               lambda: run_patchmatch(sinputs, sparams, jax.random.key(0)))
    if sout is not None:
        sgeom = sparams.with_geom(multi_geometry=False)
        sginputs = sinputs._replace(
            src_depths=jnp.broadcast_to(sout[0], (n_src, Hs, Ws)))
        run("sphere_geom",
            lambda: run_patchmatch(sginputs, sgeom, jax.random.key(1),
                                   seed_normal_world=sout[1],
                                   seed_depth=sout[0]))
    else:
        results["sphere_geom"] = {"ok": False, "error": "skipped: sphere failed"}
        failures.append("sphere_geom")

    record = {
        "ok": not failures,
        "failures": failures,
        "variants": results,
        "point": f"{W}x{H}x{n_src}src (sphere {Ws}x{Hs})",
        "device": str(dev),
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps({"smoke_ok": record["ok"], "failures": failures}))
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()
