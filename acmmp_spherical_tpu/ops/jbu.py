"""Joint bilateral upsampling (JBU).

Generic guided upsampler used twice, like the reference:

* between pyramid scales on depth maps (``JBU_cu``, ACMMP.cu:1558-1616, driven
  by main.cpp:212-238), and
* inside hierarchy initialisation on plane-normal fields
  (``RandomInitialization`` upsample branch, ACMMP.cu:713-779).

Semantics follow the reference closely: for fine pixel p, the coarse source is
sampled at truncated integer coordinates around ``o = p * scale`` in a
``(2k+1)^2`` window with ``k = (Imagescale^2 + 1) // 2`` and
``Imagescale = max(W//w, H//h)``; weights are a spatial gaussian between ``o``
and the *truncated* coarse coords (sigma 0.5) times a range gaussian on the
fine guide image (sigma 25.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.ops.sampling import grid_coords


def jbu_window_radius(fine_w: int, fine_h: int, coarse_w: int, coarse_h: int) -> int:
    image_scale = max(fine_w // coarse_w, fine_h // coarse_h)
    return (image_scale * image_scale + 1) // 2


def joint_bilateral_upsample(
    coarse: jax.Array,      # (h, w) or (h, w, C) source field
    guide: jax.Array,       # (H, W) fine guide image (grayscale 0..255)
    *,
    sigma_spatial: float = 0.5,
    sigma_range: float = 25.5,
    radius: int | None = None,
) -> jax.Array:
    """Upsample ``coarse`` to the guide's resolution. Returns (H, W[, C])."""
    H, W = guide.shape
    if coarse.ndim == 2:
        coarse3 = coarse[..., None]
    else:
        coarse3 = coarse
    h, w = coarse3.shape[:2]
    if radius is None:
        radius = jbu_window_radius(W, H, w, h)

    scale = w / W  # reference uses the x ratio for both axes (ACMMP.cu:1572)
    xs, ys = grid_coords(H, W)
    ox = xs * scale
    oy = ys * scale

    num = jnp.zeros((H, W) + coarse3.shape[2:], jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    two_ss = 2.0 * sigma_spatial * sigma_spatial
    two_sr = 2.0 * sigma_range * sigma_range

    for j in range(-radius, radius + 1):
        # truncated + clamped coarse row (reference ACMMP.cu:1591-1592)
        ry = jnp.clip(jnp.trunc(oy + j).astype(jnp.int32), 0, h - 1)
        gy = jnp.clip(ys.astype(jnp.int32) + j, 0, H - 1)
        for i in range(-radius, radius + 1):
            rx = jnp.clip(jnp.trunc(ox + i).astype(jnp.int32), 0, w - 1)
            gx = jnp.clip(xs.astype(jnp.int32) + i, 0, W - 1)
            src = coarse3[ry, rx]                     # (H, W, C) gather
            neighbor = guide[gy, gx]
            sdist2 = (ox - rx.astype(jnp.float32)) ** 2 + (oy - ry.astype(jnp.float32)) ** 2
            sgauss = jnp.exp(-sdist2 / two_ss)
            rgauss = jnp.exp(-((guide - neighbor) ** 2) / two_sr)
            wgt = sgauss * rgauss
            num = num + src * wgt[..., None]
            den = den + wgt
    out = num / jnp.maximum(den, 1e-20)[..., None]
    return out[..., 0] if coarse.ndim == 2 else out
