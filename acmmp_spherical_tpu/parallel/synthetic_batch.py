"""Synthetic problem batches for multi-chip dry-runs, tests and benchmarks.

Builds a B-problem batch from one synthetic scene with B cameras: problem b
reconstructs view b using its ring neighbours as sources -- the same structure
a real scene's pair.txt produces, so the view-parallel step and its
cross-device depth exchange are exercised exactly as in production.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
from acmmp_spherical_tpu.parallel.view_parallel import ProblemBatch
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


def make_synthetic_batch(
    n_problems: int,
    *,
    model: str = PINHOLE,
    width: int = 32,
    height: int = 24,
    n_src: int = 3,
    focal: float = 28.0,
):
    """Returns (ProblemBatch, params, gt_depths (B, H, W))."""
    scene = CubeRoom()
    cams = make_ring_of_cameras(
        n_problems, model=model, width=width, height=height, focal=focal
    )
    images, depths, _ = render_scene(cams, scene, width, height)

    B = n_problems
    src_ids = np.zeros((B, n_src), np.int32)
    for b in range(B):
        # nearest ring neighbours: +-1, +-2, ...
        order = []
        for d in range(1, B):
            order += [(b + d) % B, (b - d) % B]
        src_ids[b] = np.array(sorted(set(order), key=order.index)[:n_src])

    imgs = np.zeros((B, 1 + n_src, height, width), np.float32)
    cam_stacks = []
    for b in range(B):
        imgs[b, 0] = images[b]
        views = [cams[b]] + [cams[int(s)] for s in src_ids[b]]
        for v, s in enumerate(src_ids[b]):
            imgs[b, 1 + v] = images[int(s)]
        cam_stacks.append(stack_cameras(views))
    batch_cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cam_stacks)

    dmin, dmax = np.asarray(cams[0].depth_range)
    params = PatchMatchParams().with_depth_range(dmin, dmax)
    batch = ProblemBatch(
        images=jnp.asarray(imgs),
        cams=batch_cams,
        src_valid=jnp.ones((B, n_src), bool),
        src_view_global=jnp.asarray(src_ids),
    )
    return batch, params, depths
