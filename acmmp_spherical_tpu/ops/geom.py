"""Geometric-consistency cost: forward-backward reprojection error.

Reference ComputeGeomConsistencyCost (ACMMP.cu:646-671): project the ref
hypothesis into a source view, look up the source depth map (nearest,
C-truncation), unproject that source depth (at the *float* projected
coordinates, as the reference does), back-project into the reference view and
clamp the pixel reprojection error at 3.0.  Missing/zero source depth costs
the maximum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core.camera import Camera, Cameras
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.ops.sampling import sample_nearest_trunc


def geom_consistency_cost(
    src_depths: jax.Array,   # (S, Hp, Wp) source depth maps (padded stack)
    src_cams: Cameras,       # batched (S)
    ref_cam: Camera,
    normal: jax.Array,       # (H, W, 3)
    w: jax.Array,            # (H, W)
    xs: jax.Array,
    ys: jax.Array,
    params: PatchMatchParams,
) -> jax.Array:
    """(S, H, W) geometric-consistency costs in [0, geom_max_cost]."""
    max_cost = params.geom_max_cost
    depth = G.depth_from_plane(ref_cam, xs, ys, normal, w)
    Xw = G.unproject_world(ref_cam, xs, ys, depth)

    def per_view(depth_img, cam):
        px, py, _ = G.project(cam, Xw)
        src_d, ok = sample_nearest_trunc(depth_img, px, py, cam.width, cam.height)
        Xs = G.unproject_world(cam, px, py, src_d)
        bx, by, _ = G.project(ref_cam, Xs)
        err = jnp.sqrt((xs - bx) ** 2 + (ys - by) ** 2)
        cost = jnp.minimum(max_cost, err)
        return jnp.where(ok & (src_d > 0.0), cost, max_cost)

    return jax.vmap(per_view)(src_depths, src_cams)
