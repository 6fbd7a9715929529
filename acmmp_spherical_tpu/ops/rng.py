"""Counter-based per-pixel randomness.

The reference seeds one curandState per pixel from ``clock64()``
(ACMMP.cu:684), making every run nondeterministic.  Here all randomness comes
from ``jax.random`` with keys folded from (seed, pass, iteration, use-site), so
runs are bit-reproducible while matching the reference's *distributions*
(acceptance is cost-driven, so distributions -- not streams -- are what must
match; SURVEY.md section 7).

Distribution notes:

* ``random_normal_toward_viewer`` replaces the Marsaglia rejection loop
  (ACMMP.cu:194-220) with gaussian-normalise -- both are exactly uniform on
  the sphere -- then flips hemispheres toward the viewer identically.
* ``sample_depth_inv`` is the same inverse-depth-uniform transform
  (ACMMP.cu:14-22).
* The reference's bounded rejection loops (32/64 tries, ACMMP.cu:267-305,
  853-860) are vestigial: ``SampleDepthInv`` already clamps its window inside
  the global range, so the first try always succeeds; a single sample is the
  exact equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.core.camera import Camera
from acmmp_spherical_tpu.core import geometry as G


def uniform(key, shape, lo=0.0, hi=1.0):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def sample_depth_inv(u: jax.Array, dmin, dmax) -> jax.Array:
    """Uniform-in-inverse-depth sample from uniform ``u`` in [0,1)
    (reference SampleDepthInv, ACMMP.cu:14-22)."""
    dmin = jnp.maximum(dmin, 1e-6)
    dmax = jnp.maximum(dmax, dmin + 1e-6)
    inv_min = 1.0 / dmax
    inv_max = 1.0 / dmin
    return 1.0 / (inv_min + u * (inv_max - inv_min))


def random_normal_toward_viewer(
    key, cam: Camera, xs: jax.Array, ys: jax.Array
) -> jax.Array:
    """Uniform-on-sphere unit normals flipped to face the viewer
    (reference GenerateRandomNormal, ACMMP.cu:194-220). Returns (H, W, 3)."""
    g = jax.random.normal(key, xs.shape + (3,), jnp.float32)
    n = G.normalize(g)
    vd = G.view_direction(cam, xs, ys)
    flip = jnp.sum(n * vd, axis=-1, keepdims=True) > 0.0
    return jnp.where(flip, -n, n)


def perturbed_normal(
    key,
    cam: Camera,
    xs: jax.Array,
    ys: jax.Array,
    normal: jax.Array,
    perturbation,
) -> jax.Array:
    """Euler-angle perturbation of per-pixel normals
    (reference GeneratePerturbedNormal, ACMMP.cu:222-257).

    Angles are uniform in ``+-perturbation/2`` per axis; if the perturbed
    normal faces away from the viewer the original is kept.  ``perturbation``
    may be a scalar or broadcastable array.
    """
    a = jax.random.uniform(key, xs.shape + (3,), jnp.float32, -0.5, 0.5)
    a = a * jnp.asarray(perturbation, jnp.float32)[..., None] if jnp.ndim(perturbation) else a * perturbation
    a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2]
    s1, s2, s3 = jnp.sin(a1), jnp.sin(a2), jnp.sin(a3)
    c1, c2, c3 = jnp.cos(a1), jnp.cos(a2), jnp.cos(a3)
    # row-major rotation, same composition as the reference (ACMMP.cu:237-246)
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    px = (c2 * c3) * nx + (c3 * s1 * s2 - c1 * s3) * ny + (s1 * s3 + c1 * c3 * s2) * nz
    py = (c2 * s3) * nx + (c1 * c3 + s1 * s2 * s3) * ny + (c1 * s2 * s3 - c3 * s1) * nz
    pz = (-s2) * nx + (c2 * s1) * ny + (c1 * c2) * nz
    p = jnp.stack([px, py, pz], axis=-1)
    vd = G.view_direction(cam, xs, ys)
    keep = jnp.sum(p * vd, axis=-1, keepdims=True) >= 0.0
    return G.normalize(jnp.where(keep, normal, p))


def random_plane_hypothesis(
    key, cam: Camera, xs: jax.Array, ys: jax.Array, depth_min, depth_max
):
    """Fresh random plane field: linear-uniform depth + viewer-facing normal
    (reference GenerateRandomPlaneHypothesis, ACMMP.cu:259-265).
    Returns (normal (H, W, 3), w (H, W))."""
    kd, kn = jax.random.split(key)
    depth = uniform(kd, xs.shape, depth_min, depth_max)
    normal = random_normal_toward_viewer(kn, cam, xs, ys)
    w = G.dist_to_origin(cam, xs, ys, depth, normal)
    return normal, w
