#!/usr/bin/env python
"""Bisect the 800x600x4src TPU kernel fault (round-5 envelope crash).

The full-envelope run faults the TPU worker on the FIRST pass at the
pyramid's coarse scale (800x600, 4 sources) -- the same shape class as the
round-3 lax.scan x Pallas fault (fixed then by unrolling).  This harness
runs ONE photometric pass at the pipeline's exact scale-2 settings under a
sequence of configs, each in a fresh subprocess (a worker crash kills the
process's TPU client), probing the tunnel between trials.

Usage: python scripts/repro_800x600.py [--configs full,nobmpack,...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    # name: (tap_pack, backmap_pack, warp, rect_init, fast_rect)
    "full":      dict(tap=True, bm=True, warp=True, init=True, rect=True),
    "nobmpack":  dict(tap=True, bm=False, warp=True, init=True, rect=True),
    "notappack": dict(tap=False, bm=True, warp=True, init=True, rect=True),
    "nowarp":    dict(tap=True, bm=True, warp=False, init=True, rect=True),
    "noinit":    dict(tap=True, bm=True, warp=True, init=False, rect=True),
    "r3like":    dict(tap=False, bm=False, warp=False, init=True, rect=True),
    "norect":    dict(tap=True, bm=True, warp=False, init=False, rect=False),
}

INNER = r"""
import os, sys, json
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/acmmp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import dataclasses
from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core.camera import stack_cameras
from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
from acmmp_spherical_tpu.ops.rectify import (
    host_rectifiable, rect_comp_shape, rect_init_window,
    rect_live_tile_count, rect_shape, rect_warp_window)
from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene)

cfg = %(cfg)s
W, H, S = 800, 600, 4
cams = make_ring_of_cameras(1 + S, width=W, height=H, focal=0.9 * W,
                            radius=0.25)
cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{S}.npz"
try:
    d = np.load(cache); images = d["images"]
    assert images.shape == (1 + S, H, W)
except Exception:
    images, dep, _ = render_scene(cams, CubeRoom(), W, H)
    np.savez(cache, images=images, depths=dep)
dmin, dmax = np.asarray(cams[0].depth_range)
stacked = stack_cameras(cams[1:])
params = PatchMatchParams().with_depth_range(dmin, dmax)
if cfg["rect"]:
    rhw = rect_shape(H, W)
    assert host_rectifiable(cams[0], stacked, rhw)
    chw = rect_comp_shape(cams[0], stacked, rhw)
    live = rect_live_tile_count(cams[0], stacked, rhw, chw)
    iwin = rect_init_window(cams[0], stacked, rhw)
    whw = rect_warp_window(cams[0], stacked, rhw) if cfg["warp"] else None
    params = dataclasses.replace(
        params, fast_ncc=True, rect_ncc=True, rect_comp_hw=chw,
        rect_live_n=live, rect_init=cfg["init"] and iwin > 0,
        rect_init_win=iwin or 384, rect_warp_hw=whw,
        rect_tap_pack=cfg["tap"], rect_backmap_pack=cfg["bm"])
    print(f"[inner] chw={chw} live={live} iwin={iwin} warp={whw}",
          file=sys.stderr, flush=True)
else:
    params = dataclasses.replace(params, fast_ncc=True)
images_d = jax.device_put(jnp.asarray(images))
inputs = PatchMatchInputs(
    ref_image=images_d[0], src_images=images_d[1:], ref_cam=cams[0],
    src_cams=stacked, src_valid=jnp.ones(S, bool),
    depth_range=jnp.asarray([dmin, dmax], jnp.float32))
out = run_patchmatch(inputs, params, jax.random.key(0))
jax.block_until_ready(out)
print(json.dumps({"ok": True, "med": float(jnp.median(out[0]))}))
"""


def probe(timeout=300):
    t0 = time.time()
    while time.time() - t0 < 3600:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jnp.ones(3).block_until_ready()"],
            timeout=timeout + 60, capture_output=True)
        if r.returncode == 0:
            return True
        print(f"[probe] tunnel not ready (rc={r.returncode}); waiting 120 s",
              flush=True)
        time.sleep(120)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="full,nobmpack,notappack,nowarp,"
                                         "noinit,r3like")
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    results = {}
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        if not probe():
            print("[repro] tunnel never recovered; aborting", flush=True)
            break
        code = INNER % {"repo": repo, "cfg": repr(cfg)}
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=args.timeout, capture_output=True,
                               text=True)
            ok = r.returncode == 0 and '"ok": true' in r.stdout
            results[name] = {"ok": ok, "rc": r.returncode,
                             "s": round(time.time() - t0, 1),
                             "tail": (r.stdout + r.stderr)[-600:]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "rc": "timeout",
                             "s": round(time.time() - t0, 1)}
        print(f"[repro] {name}: "
              f"{'OK' if results[name]['ok'] else 'FAULT/'+str(results[name]['rc'])} "
              f"({results[name]['s']} s)", flush=True)
        if not results[name]["ok"]:
            print(results[name].get("tail", "")[-600:], flush=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "tail"}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
