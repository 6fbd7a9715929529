#!/usr/bin/env python
"""Full-envelope end-to-end run on real hardware (VERDICT r2 items 2+7).

Runs `reconstruct` (the production multi-scale pipeline: photometric+prior,
2x geom per scale, JBU between scales, fusion) on a synthetic scene whose
FINE scale is at the reference's real operating resolution (default
3200x2400, the ACMMP.h:36 cap; pyramid 800 -> 1600 -> 3200 like
main.cpp:35-71), and records machine-readable evidence:

  * per-pass-kind wall-clock totals + counts (pipeline Timings)
  * end-to-end depth-maps/s/chip (finest-scale maps / total wall)
  * peak device memory (the rect working set scales with diag^2)
  * compile accounting: total JAX compile seconds (jax.monitoring) and a
    second run against the persistent compilation cache showing them
    amortised (the reference pays zero recompiles, main.cpp:392-482)
  * fused-cloud sanity + finest-scale depth quality vs the analytic GT

Usage:
  python scripts/e2e_envelope.py --size 3200 2400 --views 5 \
      --out E2E_r3.json [--workdir /tmp/acmmp_e2e]

The script re-execs itself (--inner) so the warm-cache run starts from a
fresh process (the in-process jit cache would otherwise hide compile costs).
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE_DIR = "/tmp/acmmp_jax_cache"


def inner(args) -> None:
    os.makedirs(CACHE_DIR, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    compile_secs = [0.0]
    compile_events = [0]

    def _on_duration(event, duration, **kw):
        if event == "/jax/core/compile/backend_compile_duration":
            compile_secs[0] += duration
            compile_events[0] += 1

    try:
        from jax import monitoring

        monitoring.register_event_duration_secs_listener(_on_duration)
    except Exception:
        pass

    from acmmp_spherical_tpu.config import PipelineConfig
    from acmmp_spherical_tpu.io import dmb
    from acmmp_spherical_tpu.io.ply import read_ply
    from acmmp_spherical_tpu.io.scene import ScenePaths
    from acmmp_spherical_tpu.pipeline import multiscale
    from acmmp_spherical_tpu.utils.log import Timings
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
        write_synthetic_scene_to_disk,
    )

    W, H = args.size
    n = args.views
    work = Path(args.workdir)
    scene_dir = work / "scene"
    cache = Path(f"/tmp/acmmp_e2e_scene_{W}x{H}x{n}.npz")

    if not (scene_dir / "pair.txt").exists() or not cache.exists():
        scene = CubeRoom()
        cams = make_ring_of_cameras(n, width=W, height=H, focal=0.9 * W,
                                    radius=0.2)
        t0 = time.perf_counter()
        images, depths, _ = render_scene(cams, scene, W, H)
        print(f"[e2e] rendered {n} views {W}x{H} in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        np.savez(cache, depth0=depths[0])
        write_synthetic_scene_to_disk(scene_dir, cams, images)
    gt_depth0 = np.load(cache)["depth0"]

    # fresh output dir per run (the scene inputs persist); --resume keeps
    # completed passes (crash-tolerant envelope runs: the v5e worker crash
    # at this shape class is flaky, so attempts retry through the manifest)
    sp = ScenePaths(scene_dir)
    if sp.output_dir.exists() and not args.resume:
        import shutil

        shutil.rmtree(sp.output_dir)

    timings = Timings()
    multiscale.Timings = lambda: timings  # capture the pipeline's scopes

    dev = jax.devices()[0]
    print(f"[e2e] device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    t0 = time.perf_counter()
    cfg = PipelineConfig(skip_if_complete=bool(args.resume))
    n_points = multiscale.run_pipeline(scene_dir, cfg)
    wall = time.perf_counter() - t0

    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use", "largest_alloc_size")}
    except Exception:
        pass

    # finest-scale quality vs analytic GT (image 0)
    d = dmb.read_depth_dmb(sp.depth_file(0, geom=True))
    quality = {}
    if d.shape == gt_depth0.shape:
        rel = np.abs(d - gt_depth0) / np.maximum(gt_depth0, 1e-6)
        interior = rel[16:-16, 16:-16]
        quality = {
            "median_rel_err": float(np.median(interior)),
            "frac_rel_err_lt_1pct": float(np.mean(interior < 0.01)),
            "depth_shape": list(d.shape),
        }
    pts, _, _ = read_ply(sp.output_dir / "ACMMP_model.ply")
    m = np.max(np.abs(pts), axis=1)
    out = {
        "size": [W, H],
        "views": n,
        "wall_s": round(wall, 1),
        "depth_maps_per_s_per_chip_e2e": round(n / wall, 4),
        "passes": {k: {"s": round(v, 1), "n": timings.counts[k]}
                   for k, v in sorted(timings.totals.items())},
        "compile_s": round(compile_secs[0], 1),
        "compile_events": compile_events[0],
        "memory": mem,
        "fused_points": int(len(pts)),
        "fused_on_surface_frac": float(np.mean(np.abs(m - 4.0) < 0.08)),
        "quality_finest": quality,
    }
    Path(args.inner_out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[3200, 2400])
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--workdir", default="/tmp/acmmp_e2e")
    ap.add_argument("--out", default="E2E_r3.json")
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--inner-out", default="/tmp/acmmp_e2e_inner.json")
    ap.add_argument("--single-run", action="store_true",
                    help="skip the warm-cache second run")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing outputs and skip completed passes "
                         "(crash-tolerant retries); implies per-attempt "
                         "wall times that exclude already-done passes")
    args = ap.parse_args()

    if args.inner:
        inner(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    runs = []
    n_runs = 1 if args.single_run else 2
    for i in range(n_runs):
        inner_out = f"{args.workdir}/inner_{i}.json"
        cmd = [sys.executable, __file__, "--inner",
               "--size", str(args.size[0]), str(args.size[1]),
               "--views", str(args.views), "--workdir", args.workdir,
               "--inner-out", inner_out]
        if args.resume:
            cmd.append("--resume")
        print(f"[e2e] run {i} ({'cold' if i == 0 else 'warm'} cache): "
              f"{' '.join(cmd)}", file=sys.stderr)
        r = subprocess.run(cmd)
        if r.returncode != 0:
            sys.exit(r.returncode)
        runs.append(json.loads(Path(inner_out).read_text()))

    out = {
        "scene": {"size": runs[0]["size"], "views": runs[0]["views"],
                  "pyramid_fine_px": max(runs[0]["size"])},
        "cold": runs[0],
    }
    if len(runs) > 1:
        out["warm"] = runs[1]
        out["compile_amortised_s"] = round(
            runs[0]["wall_s"] - runs[1]["wall_s"], 1)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({"e2e": out.get("warm", runs[0])}))


if __name__ == "__main__":
    main()
