"""Property tests for structural invariants (SURVEY.md 5.2: the red-black
parity argument becomes a checked property)."""

import numpy as np
import jax.numpy as jnp

from acmmp_spherical_tpu.ops.candidates import REGIONS, NEAR_BASE_OFFSETS
from acmmp_spherical_tpu.ops.filter import _STENCIL


def test_candidate_offset_parity():
    """Base offsets and far strips reach the opposite checkerboard colour
    (|dy|+|dx| odd).  The fork's V-region extras (ACMMP.cu:1047-1061) land on
    the SAME colour -- in CUDA those are racy same-launch reads; our
    functional half-step always reads the pre-halfstep state, which is a
    deterministic serialization of that behavior (see candidates.py)."""
    for region in REGIONS:
        dy, dx = region[0]
        assert (abs(dy) + abs(dx)) % 2 == 1, ("base", dy, dx)
    # far strips: every offset odd
    for region in REGIONS[1::2]:
        for dy, dx in region:
            assert (abs(dy) + abs(dx)) % 2 == 1, ("far", dy, dx)
    # near V extras: the fork's table (same-colour, even parity)
    for region in REGIONS[0::2]:
        for dy, dx in region[1:]:
            assert (abs(dy) + abs(dx)) % 2 == 0, ("near-extra", dy, dx)


def test_near_base_offsets():
    assert set(NEAR_BASE_OFFSETS) == {(-1, 0), (1, 0), (0, -1), (0, 1)}


def test_filter_stencil_parity():
    """Median-filter taps other than the centre also stay on the opposite
    colour (reference ACMMP.cu:1379-1471)."""
    for i, (dy, dx) in enumerate(_STENCIL):
        if i == 0:
            assert (dy, dx) == (0, 0)
        else:
            assert (abs(dy) + abs(dx)) % 2 == 1, (dy, dx)


def test_region_candidate_counts():
    """Near V-regions have 7 candidates, far strips 11
    (reference ACMMP.cu:965-1143)."""
    sizes = [len(r) for r in REGIONS]
    assert sizes == [7, 11, 7, 11, 7, 11, 7, 11]


def test_dynamic_fusion_mode():
    from acmmp_spherical_tpu.config import FusionParams
    from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
    from acmmp_spherical_tpu.ops.fusion import fuse_reference_view_dynamic
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )
    import jax.numpy as jnp

    scene = CubeRoom()
    W, H, n = 48, 36, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=44.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    colors = np.repeat(images[..., None], 3, -1)
    pts, nrm, col, valid = fuse_reference_view_dynamic(
        jnp.asarray(depths), jnp.asarray(normals), jnp.asarray(colors),
        stack_cameras(cams), jnp.asarray(0),
        jnp.asarray([1, 2, 3], jnp.int32), FusionParams(),
    )
    valid = np.asarray(valid)
    assert valid.sum() > 0.5 * W * H
    p = np.asarray(pts)[valid]
    assert np.percentile(np.abs(np.max(np.abs(p), 1) - scene.half), 90) < 0.05
