#!/usr/bin/env python
"""Bisect the e2e-envelope TPU worker crash (round 5).

The photometric pass of the envelope scene at scale 2 (800x600, 4 src,
unified settings chw=(1016,1152) live_n=640 iwin=512 warp=(136,256))
crashes the TPU worker, while a same-size synthetic ring with its own
derived settings runs fine (scripts/repro_800x600.py: 6/6 OK).  This
harness runs process_problem(photometric) on the on-disk envelope scene
under config overrides, one subprocess per trial, probing the tunnel
between trials (a worker crash wedges it for up to ~30-60 min).

Usage: python scripts/repro_e2e_fault.py [--trials t1,t2,...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

TRIALS = {
    # override pieces: unify indices (chw, live, iwin, _, set, warp, _)
    "t1_asis":    dict(),
    "t2_nowarp":  dict(warp=None),
    "t3_noinit":  dict(iwin=0),
    "t4_nopacks": dict(tap=False, bm=False),
    "t5_mylive":  dict(live=None),        # live_n = None (identity tiles)
    "t6_win384":  dict(iwin=384),
    "t8_bmoff":   dict(bm=False),
    "t9_tapoff":  dict(tap=False),
    "p1_prior":        dict(prior=True),
    "p2_prior_nowarp": dict(prior=True, warp=None),
    "p3_prior_noinit": dict(prior=True, iwin=0),
    "p4_prior_win384": dict(prior=True, iwin=384),
    "p5_prior_tapoff": dict(prior=True, tap=False),
    "p6_prior_bmoff":  dict(prior=True, bm=False),
    "i1_prior_1it":    dict(prior=True, iters=1),
    "i2_prior_2it":    dict(prior=True, iters=2),
    "g1_geom":         dict(geom=True),
}

INNER = r"""
import sys, dataclasses as dc
sys.path.insert(0, %(repo)r)
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/acmmp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from acmmp_spherical_tpu.config import PipelineConfig
from acmmp_spherical_tpu.io.scene import ScenePaths, read_pair_file
from acmmp_spherical_tpu.pipeline.multiscale import compute_multiscale_settings
from acmmp_spherical_tpu.pipeline.pass_runner import (
    compute_scene_rect_settings, process_problem)

ov = %(ov)s
sp = ScenePaths("/tmp/acmmp_e2e/scene")
problems = read_pair_file(sp.pair_file)
cfg = PipelineConfig()
compute_multiscale_settings(sp, problems, cfg)
for p in problems:
    if p.num_downscale >= 0:
        p.cur_image_size = p.max_image_size // (2 ** p.num_downscale)
        p.num_downscale -= 1
unify = list(compute_scene_rect_settings(sp, problems, cfg))
if "warp" in ov: unify[5] = ov["warp"]
if "iwin" in ov: unify[2] = ov["iwin"]
if "live" in ov: unify[1] = ov["live"]
pm = cfg.patchmatch
if "tap" in ov: pm = dc.replace(pm, rect_tap_pack=ov["tap"])
if "bm" in ov: pm = dc.replace(pm, rect_backmap_pack=ov["bm"])
if "iters" in ov: pm = dc.replace(pm, max_iterations=ov["iters"])
cfg = dc.replace(cfg, rect_unify=tuple(unify), patchmatch=pm)
print("unify:", cfg.rect_unify, file=sys.stderr, flush=True)
process_problem(sp, problems, 0, cfg, geom=ov.get("geom", False),
                planar_prior=ov.get("prior", False),
                hierarchy=False, multi_geometry=False)
print("OK", flush=True)
"""


def probe():
    t0 = time.time()
    while time.time() - t0 < 4200:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jnp.ones(3).block_until_ready()"],
            timeout=360, capture_output=True)
        if r.returncode == 0:
            return True
        print(f"[probe] tunnel down (rc={r.returncode}); waiting 120 s",
              flush=True)
        time.sleep(120)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", default=",".join(TRIALS))
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    results = {}
    for name in args.trials.split(","):
        ov = TRIALS[name]
        if not probe():
            print("[repro] tunnel never recovered; aborting", flush=True)
            break
        code = INNER % {"repo": repo, "ov": repr(ov)}
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=args.timeout, capture_output=True,
                               text=True)
            ok = r.returncode == 0 and "OK" in r.stdout
            results[name] = {"ok": ok, "rc": r.returncode,
                             "s": round(time.time() - t0, 1),
                             "tail": (r.stdout + r.stderr)[-500:]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "rc": "timeout",
                             "s": round(time.time() - t0, 1), "tail": ""}
        print(f"[repro] {name}: "
              f"{'OK' if results[name]['ok'] else 'FAULT/'+str(results[name]['rc'])} "
              f"({results[name]['s']} s)", flush=True)
        if not results[name]["ok"]:
            print(results[name]["tail"], flush=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "tail"}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
