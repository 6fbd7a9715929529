"""Cross-pass context reuse (cfg.ctx_reuse / prepare_inputs(reuse=...)).

The rect working set's depth-independent pieces (warped frames, transport
maps, window tables, packed bilinear tables) are pure functions of
(images, cameras, depth range) and so are identical across the photometric
and geometric passes of one (image, scale); the pipeline caches them
device-resident and rebuilds only the warped source disparities per geom
pass (reference analog: per-pass texture re-upload, ACMMP.cpp:681-845).
The gate here is EXACT equality: a reuse-built context must match a
fresh-built one leaf for leaf, and a cached pipeline run must reproduce
the uncached run bit for bit.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import PatchMatchParams, PipelineConfig
from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs, prepare_inputs
from acmmp_spherical_tpu.ops.rectify import build_rect_context
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


@pytest.fixture(scope="module")
def scene():
    sc = CubeRoom()
    W, H, n = 128, 48, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H,
                                focal=90.0)
    images, depths, _ = render_scene(cams, sc, W, H)
    return jnp.asarray(images), depths, cams


def _assert_tree_equal(a, b, what):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), what
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=what)


def test_reuse_rect_context_matches_fresh(scene):
    """build_rect_context(reuse=photometric_ctx) for a geom pass must equal
    the fresh-built geom context exactly (only rect_sdisp is rebuilt)."""
    images, depths, cams = scene
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    src_depths = jnp.asarray(depths[1:])

    photo = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                               (dmin, dmax))
    fresh = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                               (dmin, dmax), src_depths=src_depths)
    reused = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (dmin, dmax), src_depths=src_depths,
                                reuse=photo)
    _assert_tree_equal(reused, fresh, "reuse-built geom context != fresh")
    # and the photometric-shaped adoption strips the disparity planes
    adopted = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                 (dmin, dmax), reuse=fresh)
    assert adopted.rect_sdisp is None
    _assert_tree_equal(adopted._replace(rect_sdisp=None),
                       fresh._replace(rect_sdisp=None),
                       "wholesale adoption changed the context")


def test_prepare_inputs_reuse_matches_fresh(scene):
    """prepare_inputs(reuse=slim_cache_entry) for a geom pass must produce
    exactly the inputs a fresh prepare builds (the pipeline cache path)."""
    images, depths, cams = scene
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    dr = jnp.asarray([dmin, dmax], jnp.float32)

    base = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(3, bool), depth_range=dr)
    params = dataclasses.replace(PatchMatchParams(), rect_ncc=True)
    photo = prepare_inputs(base, params)

    # the pipeline caches only the reusable pieces (pass_runner slim entry)
    slim = PatchMatchInputs(
        ref_image=None, src_images=None, ref_cam=None, src_cams=None,
        src_valid=None, src_packed=photo.src_packed,
        rect=photo.rect._replace(rect_sdisp=None))

    geom_base = base._replace(src_depths=jnp.asarray(depths[1:]))
    gparams = params.with_geom(False)
    fresh = prepare_inputs(geom_base, gparams)
    reused = prepare_inputs(geom_base, gparams, reuse=slim)
    _assert_tree_equal(reused, fresh, "reused prepare != fresh prepare")


def test_reuse_sphere_context_matches_fresh():
    """build_sphere_rect_context(reuse=photometric_ctx) for a geom pass must
    equal the fresh-built geom context exactly (only rect_sdisp rebuilds,
    from the recomputed pole basis)."""
    from acmmp_spherical_tpu.core.camera import SPHERE
    from acmmp_spherical_tpu.ops.sphere_rect import build_sphere_rect_context

    sc = CubeRoom()
    W, H, n = 128, 64, 3
    cams = make_ring_of_cameras(n, model=SPHERE, width=W, height=H)
    images, depths, _ = render_scene(cams, sc, W, H)
    images = jnp.asarray(images)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    src_depths = jnp.asarray(depths[1:])

    photo = build_sphere_rect_context(images[0], images[1:], ref_cam,
                                      src_cams, (dmin, dmax))
    fresh = build_sphere_rect_context(images[0], images[1:], ref_cam,
                                      src_cams, (dmin, dmax),
                                      src_depths=src_depths)
    reused = build_sphere_rect_context(images[0], images[1:], ref_cam,
                                       src_cams, (dmin, dmax),
                                       src_depths=src_depths, reuse=photo)
    _assert_tree_equal(reused, fresh,
                       "reuse-built sphere geom context != fresh")


@pytest.mark.slow
def test_pipeline_ctx_reuse_bit_identical(tmp_path):
    """A full pipeline run with the context cache on reproduces the cached
    stages of the run with it off bit for bit (split-program mode, exact
    path: the cache then carries the packed bilinear tables)."""
    from acmmp_spherical_tpu.io.dmb import read_depth_dmb
    from acmmp_spherical_tpu.io.scene import ScenePaths
    from acmmp_spherical_tpu.pipeline.multiscale import run_pipeline
    from acmmp_spherical_tpu.utils.synthetic import (
        write_synthetic_scene_to_disk,
    )

    sc = CubeRoom()
    W, H, n = 64, 48, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H,
                                focal=56.0)
    images, _, _ = render_scene(cams, sc, W, H)
    outs = {}
    for mode in ("off", "on"):
        root = tmp_path / f"dense_{mode}"
        write_synthetic_scene_to_disk(root, cams, images)
        cfg = PipelineConfig(rect_ncc="off", fast_ncc="off",
                             split_iterations="on", ctx_reuse=mode,
                             batch_problems="off")
        run_pipeline(root, cfg)
        sp = ScenePaths(root)
        outs[mode] = [read_depth_dmb(sp.depth_file(i, geom=True))
                      for i in range(n)]
    for a, b in zip(outs["off"], outs["on"]):
        np.testing.assert_array_equal(a, b)
