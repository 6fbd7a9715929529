"""Windowed-sampling Pallas kernel: interpret-mode equivalence on CPU.

(The TPU-compiled path is validated on hardware; see PERF.md for measured
numbers. Interpret mode exercises identical kernel logic.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.ops.pallas.window_sample import (
    windowed_sample, compute_window_offsets, WIN_H, WIN_W, TILE_H, TILE_W,
)
from acmmp_spherical_tpu.ops.sampling import sample_bilinear


def test_windowed_sample_matches_bilinear(rng):
    Hs, Ws = 64, 256
    H, W = 32, 256
    src = jnp.asarray(rng.random((Hs, Ws)).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x = jnp.asarray(xs * 0.9 + 3.7 + 2 * np.sin(ys / 17))
    y = jnp.asarray(ys * 0.8 + 1.2 + 1.5 * np.cos(xs / 23))

    v, ok = windowed_sample(src, x, y, src_h=Hs, src_w=Ws, interpret=True)
    ref, ok_ref = sample_bilinear(src, x, y, jnp.float32(Ws), jnp.float32(Hs),
                                  wrap_x=False)
    v, ok, ref, ok_ref = map(np.asarray, (v, ok, ref, ok_ref))
    assert ok.mean() > 0.95
    # wherever the kernel says valid, it matches the exact sampler
    np.testing.assert_allclose(v[ok], ref[ok], atol=1e-5)
    # and it never claims validity where the exact sampler is out of bounds
    assert not (ok & ~ok_ref).any()


def test_windowed_sample_wild_coords_invalid(rng):
    """Random (non-smooth) coords: samples outside the per-tile window are
    flagged invalid, never wrong."""
    Hs, Ws = 64, 256
    H, W = 16, 128
    src = jnp.asarray(rng.random((Hs, Ws)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, Ws - 2, (H, W)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, Hs - 2, (H, W)).astype(np.float32))
    v, ok = windowed_sample(src, x, y, src_h=Hs, src_w=Ws, interpret=True)
    ref, _ = sample_bilinear(src, x, y, jnp.float32(Ws), jnp.float32(Hs),
                             wrap_x=False)
    v, ok, ref = map(np.asarray, (v, ok, ref))
    np.testing.assert_allclose(v[ok], ref[ok], atol=1e-5)


def test_window_offsets_aligned():
    ys, xs = np.mgrid[0:16, 0:256].astype(np.float32)
    oy, ox = compute_window_offsets(
        jnp.asarray(xs + 37.0), jnp.asarray(ys + 21.0), 512, 1024
    )
    assert (np.asarray(oy) % TILE_H == 0).all()
    assert (np.asarray(ox) % TILE_W == 0).all()
