"""Multi-device view-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.parallel import (
    make_view_mesh, shard_batch_over_views, multichip_train_step,
)
from acmmp_spherical_tpu.parallel.synthetic_batch import make_synthetic_batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_view_parallel_step_8_devices():
    mesh = make_view_mesh(8)
    batch, params, gt = make_synthetic_batch(8, width=32, height=24, n_src=3)
    batch = shard_batch_over_views(mesh, batch)

    step = multichip_train_step(mesh, params, n_iterations=1)
    depth, normal, cost = step(batch, jax.random.key(0))
    depth = np.asarray(jax.device_get(depth))
    assert depth.shape == (8, 24, 32)
    assert np.isfinite(depth).all()
    # the sharded step should actually produce usable depth: at this tiny
    # resolution just require gross agreement for a majority of pixels
    rel = np.abs(depth - gt) / gt
    assert np.median(rel) < 0.2, np.median(rel)

    # outputs keep the view sharding across all 8 devices
    d2, _, _ = step(batch, jax.random.key(0))
    assert len(d2.sharding.device_set) == 8


def test_view_parallel_deterministic():
    mesh = make_view_mesh(4)
    batch, params, _ = make_synthetic_batch(4, width=32, height=24, n_src=2)
    batch = shard_batch_over_views(mesh, batch)
    step = multichip_train_step(mesh, params, n_iterations=1)
    d1, *_ = step(batch, jax.random.key(3))
    d2, *_ = step(batch, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_tile_parallel_matches_single_device():
    """Width-sharded pass must produce exactly the same result as unsharded
    (GSPMD halo exchange is semantics-preserving)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from acmmp_spherical_tpu.parallel.tile import tile_parallel_pass
    from acmmp_spherical_tpu.parallel.synthetic_batch import make_synthetic_batch
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs

    batch, params, gt = make_synthetic_batch(4, width=64, height=32, n_src=3)
    inputs = PatchMatchInputs(
        ref_image=batch.images[0, 0],
        src_images=batch.images[0, 1:],
        ref_cam=jax.tree.map(lambda a: a[0, 0], batch.cams),
        src_cams=jax.tree.map(lambda a: a[0, 1:], batch.cams),
        src_valid=batch.src_valid[0],
    )
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("tile",))
    run4 = tile_parallel_pass(mesh4, params, n_iterations=1)
    d4, n4, c4 = run4(inputs, jax.random.key(0))
    assert len(d4.sharding.device_set) == 4

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("tile",))
    run1 = tile_parallel_pass(mesh1, params, n_iterations=1)
    d1, n1, c1 = run1(inputs, jax.random.key(0))

    np.testing.assert_allclose(np.asarray(d4), np.asarray(d1), rtol=1e-5,
                               atol=1e-4)
    rel = np.abs(np.asarray(d4) - gt[0]) / gt[0]
    assert np.median(rel) < 0.25
