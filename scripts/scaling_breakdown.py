#!/usr/bin/env python
"""Break down the virtual-mesh scaling-efficiency residual (VERDICT r4 #8).

SCALING_r4 measured 5.24x speedup / 0.655 efficiency for 8 problems batched
over an 8-device virtual CPU mesh.  All 8 "devices" share one host's cores,
so the residual could be (a) real program serialization -- collectives,
resharding, per-device imbalance -- or (b) a pure core-sharing artifact.
This harness separates the two:

  1. collective census: compile the batched program, walk the optimized
     HLO, and count every collective op (all-reduce, all-gather,
     reduce-scatter, collective-permute, all-to-all).  The view-parallel
     pass program is collective-free BY CONSTRUCTION (problems exchange
     only through the .dmb file layer between passes, like the reference's
     ACMMP.cpp:653-678); a zero census proves per-pass scaling on real
     chips is communication-free, i.e. the virtual-mesh loss cannot be
     program serialization.
  2. single-problem roofline: time the SAME jitted per-problem program
     standalone (t_one).  On shared cores, batched-8 wall time should land
     between t_one (perfect core-sharing overlap: 8 programs saturating
     the same cores) and 8*t_one (no overlap).  Report
     core_sharing_ratio = t_batched / t_one; values well under 8 mean the
     batch DOES overlap on shared cores and the efficiency deficit is the
     host running out of cores, not the program.
  3. serial-side inflation: serial per-problem wall time (t_serial_one,
     what SCALING's "serial" leg repeats) vs t_one -- they are the same
     program; any gap is measurement noise.

Writes one JSON line; store as SCALING_r5.json.

Usage: python scripts/scaling_breakdown.py --cpu 8 --size 128 96 --views 3
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time

sys.path.insert(0, ".")


COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)


def hlo_collective_census(compiled) -> dict:
    txt = compiled.as_text()
    census = collections.Counter()
    for line in txt.splitlines():
        ls = line.lstrip()
        # HLO op lines look like "%x = f32[...] all-reduce(...)"; count op
        # uses, not computation names
        for op in COLLECTIVE_OPS:
            if f" {op}(" in ls or ls.startswith(f"{op}("):
                census[op] += 1
    return dict(census)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", nargs=2, type=int, default=[128, 96])
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from acmmp_spherical_tpu.config import PipelineConfig
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.parallel.mesh import make_view_mesh
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    n_dev = jax.local_device_count()
    W, H = args.size
    S = args.views
    cams = make_ring_of_cameras(1 + S, width=W, height=H, focal=0.9 * W)
    images, _, _ = render_scene(cams, CubeRoom(), W, H)
    images = jnp.asarray(images)
    ref_cam, src_cams = cams[0], stack_cameras(cams[1:])
    dmin, dmax = np.asarray(ref_cam.depth_range)
    params = PipelineConfig().patchmatch
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(S, bool),
        depth_range=jnp.asarray([0.6 * dmin, 1.2 * dmax], jnp.float32),
    )
    key = jax.random.key(0)

    def best_of(f, *a):
        f(*a).block_until_ready()
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            f(*a).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    one = jax.jit(lambda i, k: run_patchmatch(i, params, k)[0])
    t_one = best_of(one, inputs, key)

    mesh = make_view_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    binputs = jax.tree.map(
        lambda a: jax.device_put(
            jnp.stack([a] * n_dev),
            NamedSharding(mesh, P("view", *([None] * a.ndim)))),
        inputs)
    keys = jax.device_put(
        jax.vmap(lambda b: jax.random.fold_in(key, b))(jnp.arange(n_dev)),
        NamedSharding(mesh, P("view")))
    batched = jax.jit(jax.vmap(lambda i, k: run_patchmatch(i, params, k)[0]))
    compiled = batched.lower(binputs, keys).compile()
    census = hlo_collective_census(compiled)
    t_batched = best_of(batched, binputs, keys)

    # serial leg as SCALING measures it: n_dev sequential per-problem runs
    def serial():
        for b in range(n_dev):
            one(inputs, jax.random.fold_in(key, b)).block_until_ready()
        return jnp.zeros(())

    serial()
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        serial().block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_serial = min(ts)

    speedup = t_serial / t_batched
    record = {
        "n_devices": n_dev,
        "size": [W, H],
        "views": S,
        "backend": jax.default_backend(),
        "t_one_s": round(t_one, 3),
        "t_serial_s": round(t_serial, 3),
        "t_batched_s": round(t_batched, 3),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / n_dev, 4),
        # program-structure evidence
        "collectives_in_batched_hlo": census,
        "collective_free": not census,
        # shared-core attribution: how much slower is running 8 problems
        # concurrently than 1 alone on the same cores?  8.0 = no overlap,
        # 1.0 = free.  With a zero collective census, everything above the
        # batched program's own arithmetic is core contention.
        "core_sharing_ratio": round(t_batched / t_one, 3),
        "serial_per_problem_vs_one": round(t_serial / n_dev / t_one, 3),
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
