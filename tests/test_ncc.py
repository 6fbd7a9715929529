"""Kernel tests: bilateral sampling + NCC cost on synthetic scenes.

Per SURVEY.md section 4: a known-correct plane hypothesis must achieve near-zero
cost; wrong depths must cost much more.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import PINHOLE, SPHERE, stack_cameras
from acmmp_spherical_tpu.ops.sampling import (
    sample_bilinear, sample_nearest_trunc, shift2d,
)
from acmmp_spherical_tpu.ops.ncc import (
    ref_tap_context, multiview_ncc, topk_cost_and_selection, tap_offsets,
)
from acmmp_spherical_tpu.utils.synthetic import CubeRoom, make_ring_of_cameras, render_scene


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_bilinear_exact_at_integers(rng):
    img = jnp.asarray(rng.uniform(0, 255, (9, 11)).astype(np.float32))
    xs = jnp.asarray([[0.0, 3.0], [10.0, 5.0]])
    ys = jnp.asarray([[0.0, 2.0], [8.0, 4.0]])
    v, ok = sample_bilinear(img, xs, ys, jnp.float32(11), jnp.float32(9), wrap_x=False)
    expect = np.asarray(img)[np.asarray(ys, int), np.asarray(xs, int)]
    np.testing.assert_allclose(v, expect)
    assert np.all(np.asarray(ok))


def test_bilinear_interpolates(rng):
    img = jnp.asarray([[0.0, 10.0], [20.0, 30.0]])
    v, _ = sample_bilinear(img, jnp.asarray(0.5), jnp.asarray(0.5),
                           jnp.float32(2), jnp.float32(2), wrap_x=False)
    np.testing.assert_allclose(v, 15.0)


def test_bilinear_oob_invalid():
    img = jnp.zeros((4, 4))
    _, ok = sample_bilinear(img, jnp.asarray([-0.1, 2.0, 4.0]),
                            jnp.asarray([1.0, -1.0, 1.0]),
                            jnp.float32(4), jnp.float32(4), wrap_x=False)
    assert np.asarray(ok).tolist() == [False, False, False]


def test_bilinear_wrap_seam_continuous(rng):
    img = jnp.asarray(rng.uniform(0, 255, (4, 8)).astype(np.float32))
    # x=7.5 interpolates columns 7 and 0 under wrap
    v, ok = sample_bilinear(img, jnp.asarray(7.5), jnp.asarray(1.0),
                            jnp.float32(8), jnp.float32(4), wrap_x=True)
    expect = 0.5 * (np.asarray(img)[1, 7] + np.asarray(img)[1, 0])
    np.testing.assert_allclose(v, expect, rtol=1e-6)
    # negative x wraps too
    v2, _ = sample_bilinear(img, jnp.asarray(-1.0), jnp.asarray(1.0),
                            jnp.float32(8), jnp.float32(4), wrap_x=True)
    np.testing.assert_allclose(v2, np.asarray(img)[1, 7], rtol=1e-6)


def test_nearest_trunc_semantics():
    img = jnp.arange(12.0).reshape(3, 4)
    v, ok = sample_nearest_trunc(img, jnp.asarray([1.9, -0.7, 3.2]),
                                 jnp.asarray([2.9, 0.0, 0.0]),
                                 jnp.float32(4), jnp.float32(3))
    # (int)1.9=1, (int)-0.7=0 (toward zero; in bounds!), (int)3.2=3
    np.testing.assert_allclose(v, [img[2, 1], img[0, 0], img[0, 3]])
    assert np.asarray(ok).tolist() == [True, True, True]


def test_shift2d():
    a = jnp.arange(12.0).reshape(3, 4)
    s = shift2d(a, 1, 0, fill=-1.0)
    np.testing.assert_allclose(np.asarray(s)[:2], np.asarray(a)[1:])
    np.testing.assert_allclose(np.asarray(s)[2], -1.0)
    s2 = shift2d(a, 0, -1)  # clamp left edge
    np.testing.assert_allclose(np.asarray(s2)[:, 0], np.asarray(a)[:, 0])
    np.testing.assert_allclose(np.asarray(s2)[:, 1:], np.asarray(a)[:, :-1])
    s3 = shift2d(a, 0, 1, wrap_x=True)
    np.testing.assert_allclose(np.asarray(s3)[:, -1], np.asarray(a)[:, 0])


# ---------------------------------------------------------------------------
# NCC
# ---------------------------------------------------------------------------

def _scene(model, n=4):
    scene = CubeRoom()
    W, H = (96, 72) if model == PINHOLE else (128, 64)
    cams = make_ring_of_cameras(n, model=model, width=W, height=H)
    images, depths, normals = render_scene(cams, scene, W, H)
    return cams, jnp.asarray(images), depths, normals


def test_tap_count():
    assert tap_offsets(PatchMatchParams()).shape == (36, 2)


@pytest.mark.parametrize("model", [PINHOLE, SPHERE])
def test_gt_plane_low_cost_wrong_plane_high_cost(model):
    cams, images, depths, normals = _scene(model)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    src_imgs = images[1:]
    params = PatchMatchParams()

    H, W = images.shape[1:]
    from acmmp_spherical_tpu.ops.sampling import grid_coords
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)

    ctx = ref_tap_context(images[0], ref_cam, params)
    cost_gt = np.asarray(multiview_ncc(src_imgs, src_cams, ref_cam, n_cam, w, ctx, params))

    # wrong hypothesis: fronto-parallel plane at 2x the true depth
    vd = G.view_direction(ref_cam, xs, ys)
    n_wrong = -vd
    w_wrong = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]) * 2.0, n_wrong)
    cost_bad = np.asarray(
        multiview_ncc(src_imgs, src_cams, ref_cam, n_wrong, w_wrong, ctx, params)
    )

    interior = np.s_[:, 12:-12, 12:-12]
    med_gt = np.median(cost_gt[interior])
    med_bad = np.median(cost_bad[interior])
    assert med_gt < 0.15, med_gt
    assert med_bad > 0.1, med_bad
    # sphere: low-res equirect aliases the texture, raising the GT floor
    ratio = 20 if model == PINHOLE else 5
    assert med_bad > ratio * med_gt, (med_gt, med_bad)


def test_topk_cost_and_selection():
    params = PatchMatchParams(top_k=2)
    # 4 views, 1x2 image
    cv = jnp.asarray(
        [
            [[0.1, 2.0]],
            [[0.3, 2.0]],
            [[0.2, 2.0]],
            [[1.9, 2.0]],
        ]
    )
    valid = jnp.asarray([True, True, True, False])
    cost, sel = topk_cost_and_selection(cv, valid, params)
    # pixel 0: best two = 0.1, 0.2 -> 0.15; selected = views 0, 2
    np.testing.assert_allclose(np.asarray(cost)[0, 0], 0.15, atol=1e-6)
    assert np.asarray(sel)[:, 0, 0].tolist() == [True, False, True, False]
    # pixel 1: no valid view below cost_max -> cost_max, nothing selected
    np.testing.assert_allclose(np.asarray(cost)[0, 1], 2.0)
    assert not np.asarray(sel)[:, 0, 1].any()


def test_ncc_jits_and_is_deterministic():
    cams, images, depths, normals = _scene(PINHOLE, n=3)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    H, W = images.shape[1:]
    from acmmp_spherical_tpu.ops.sampling import grid_coords
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)

    @jax.jit
    def f(imgs, nrm, ww):
        ctx = ref_tap_context(imgs[0], ref_cam, params)
        return multiview_ncc(imgs[1:], src_cams, ref_cam, nrm, ww, ctx, params)

    c1 = f(images, n_cam, w)
    c2 = f(images, n_cam, w)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_packed_sampler_matches_unpacked(rng):
    from acmmp_spherical_tpu.ops.sampling import pack_bilinear, sample_bilinear_packed
    for wrap in (False, True):
        img = jnp.asarray(rng.uniform(0, 255, (13, 17)).astype(np.float32))
        # logical size smaller than padded
        Wl, Hl = jnp.float32(15.0), jnp.float32(11.0)
        packed = pack_bilinear(img, Wl, Hl, wrap_x=wrap)
        x = jnp.asarray(rng.uniform(-2, 18, (200,)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-2, 14, (200,)).astype(np.float32))
        v1, ok1 = sample_bilinear(img, x, y, Wl, Hl, wrap_x=wrap)
        v2, ok2 = sample_bilinear_packed(packed, 17, x, y, Wl, Hl, wrap_x=wrap)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        m = np.asarray(ok1)
        np.testing.assert_allclose(np.asarray(v1)[m], np.asarray(v2)[m],
                                   rtol=1e-5, atol=1e-4)


def test_packed_multiview_ncc_matches_unpacked():
    cams, images, depths, normals = _scene(PINHOLE, n=3)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    H, W = images.shape[1:]
    from acmmp_spherical_tpu.ops.sampling import grid_coords, pack_bilinear
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)
    ctx = ref_tap_context(images[0], ref_cam, params)
    c1 = multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w, ctx, params)
    packed = jax.vmap(
        lambda im, wd, ht: pack_bilinear(im, wd, ht, wrap_x=False)
    )(images[1:], src_cams.width, src_cams.height)
    c2 = multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w, ctx, params,
                       src_packed=packed)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)
