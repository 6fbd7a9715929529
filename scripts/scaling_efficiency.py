#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.json config 5).

Measures view-parallel scaling of the production pass program: one full
photometric PatchMatch pass per problem (pipeline/patchmatch.run_patchmatch),
B problems executed (a) serially on one device and (b) as one batched program
with the problem axis sharded over an N-device view mesh
(pipeline/batch_runner semantics).  Prints one JSON line:

    {"n_devices": N, "t_serial_s": ..., "t_batched_s": ...,
     "speedup": ..., "efficiency": ...}

efficiency = speedup / N.  On real multi-chip hardware this is the
scaling-efficiency number; on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) all "devices" share the
same cores, so the harness there validates program structure (collective-free
view parallelism should show speedup ~1 with shared cores, not N) rather than
hardware scaling.

Usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/scaling_efficiency.py [--size W H] [--views S]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", nargs=2, type=int, default=[256, 192])
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (the hosting "
                         "environment pins JAX_PLATFORMS via sitecustomize, "
                         "so the env var alone does not work)")
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

    def mk_inputs():
        return PatchMatchInputs(
            ref_image=images[0],
            src_images=images[1:],
            ref_cam=ref_cam,
            src_cams=src_cams,
            src_valid=jnp.ones(S, bool),
            depth_range=jnp.asarray([0.6 * dmin, 1.2 * dmax], jnp.float32),
        )

    one = jax.jit(lambda i, k: run_patchmatch(i, params, k)[0])
    inputs = mk_inputs()
    key = jax.random.key(0)
    one(inputs, key).block_until_ready()  # compile
    t0 = time.perf_counter()
    for r in range(args.reps):
        for b in range(n_dev):
            one(inputs, jax.random.fold_in(key, b)).block_until_ready()
    t_serial = (time.perf_counter() - t0) / args.reps

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
    batched(binputs, keys).block_until_ready()  # compile
    t0 = time.perf_counter()
    for r in range(args.reps):
        batched(binputs, keys).block_until_ready()
    t_batched = (time.perf_counter() - t0) / args.reps

    speedup = t_serial / t_batched
    print(json.dumps({
        "n_devices": n_dev,
        "problems": n_dev,
        "size": [W, H],
        "views": S,
        "t_serial_s": round(t_serial, 3),
        "t_batched_s": round(t_batched, 3),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / n_dev, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
