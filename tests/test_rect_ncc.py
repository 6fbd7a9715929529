"""Rectified NCC kernel: interpret-mode sanity + agreement with the exact path.

The rectified evaluation is an algorithmic reformulation (warped patch,
rectified-grid evaluation points), so the gate is *behavioral*: ground-truth
planes must score near-zero like the exact path, wrong planes must score
high, and the two cost fields must rank hypotheses the same way nearly
everywhere.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
from acmmp_spherical_tpu.ops.ncc import ref_tap_context, multiview_ncc
from acmmp_spherical_tpu.ops.rectify import build_rect_context, rect_shape
from acmmp_spherical_tpu.ops.pallas.ncc_rect import rect_batched_ncc
from acmmp_spherical_tpu.ops.sampling import grid_coords
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene,
)


@pytest.fixture(scope="module")
def setup():
    scene = CubeRoom()
    W, H, n = 128, 48, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=90.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    images = jnp.asarray(images)
    ref_cam = cams[0]
    src_cams = stack_cameras(cams[1:])
    params = PatchMatchParams()
    xs, ys = grid_coords(H, W)
    n_cam = G.normal_world_to_cam(ref_cam, jnp.asarray(normals[0]))
    w = G.dist_to_origin(ref_cam, xs, ys, jnp.asarray(depths[0]), n_cam)
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    rect = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                              (dmin, dmax))
    return images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W)


def test_rect_ncc_scores_gt_low_and_wrong_high(setup):
    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    # batch: [gt plane, wrong-depth plane]
    w_wrong = w * 1.35
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w_wrong])
    cost = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                       interpret=True))
    assert cost.shape == (2, 3, H, W)
    interior = np.s_[:, 8:-8, 8:-8]
    good = cost[0][interior]
    badf = cost[1][interior]
    # valid evaluations of the GT plane are near-zero cost
    valid = good < params.cost_max - 1e-3
    assert valid.mean() > 0.8, valid.mean()
    assert np.median(good[valid]) < 0.15, np.median(good[valid])
    # the wrong plane scores clearly worse on average (the smooth sinusoid
    # texture caps how bad a 35% depth error can look; 5x + floor is the gate)
    assert np.mean(badf) > 5.0 * np.mean(good) and np.mean(badf) > 0.15


@pytest.mark.parametrize("rect_init,prescreen", [(False, False),
                                                 (True, False), (True, True)])
@pytest.mark.slow
def test_rect_full_pass_quality(setup, rect_init, prescreen):
    """Full PatchMatch pass with the rectified kernel (interpret mode) matches
    the exact path's quality on the golden scene -- with the init-field cost
    on the exact path and on the rectified kernel (rect_init)."""
    import dataclasses

    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    dr = jnp.asarray(np.asarray(ref_cam.depth_range), jnp.float32)
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(3, bool), depth_range=dr,
    )
    if rect_init:
        from acmmp_spherical_tpu.ops.rectify import rect_span_fits

        assert rect_span_fits(ref_cam, src_cams, rect_shape(H, W))
    rparams = dataclasses.replace(params, rect_ncc=True, rect_init=rect_init,
                                  rect_prescreen=prescreen)
    d, _, cost, _ = run_patchmatch(inputs, rparams, jax.random.key(0))
    d = np.asarray(d)
    gt = depths[0]
    rel = np.abs(d - gt) / gt
    assert np.median(rel[8:-8, 8:-8]) < 0.01, np.median(rel[8:-8, 8:-8])


def test_warp_transport_matches_xla_gather(setup):
    """The Pallas warp-gather transport (rect_warp_hw) returns bit-identical
    costs to the XLA row-gather transport for every map (full + both
    parities): the claimant attribution is the map's own, so only the
    transport mechanism changes (PERF.md round 4)."""
    import dataclasses

    from acmmp_spherical_tpu.ops.rectify import rect_warp_window
    from acmmp_spherical_tpu.ops.sampling import checkerboard_pack

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    rhw = rect_shape(H, W)
    whw = rect_warp_window(ref_cam, src_cams, rhw)
    assert whw is not None, "probe scene should have a bounded warp window"
    rect_w = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (ref_cam.depth_range[0],
                                 ref_cam.depth_range[1]),
                                warp_hw=whw)
    # the warp window clears no claimants on this scene (mirror margin)
    for m_x, m_w in zip(rect.maps, rect_w.maps):
        assert m_w.warp_rel is not None
        np.testing.assert_array_equal(np.asarray(m_x.fwd_valid),
                                      np.asarray(m_w.fwd_valid))
    wparams = dataclasses.replace(params, rect_warp_hw=whw)
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_x = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                      interpret=True))
    c_w = np.asarray(rect_batched_ncc(rect_w, normals, ws, wparams,
                                      interpret=True))
    # the warp transport claimant ATTRIBUTION is exact (integer tables);
    # the kernelised source warp's frame values differ by f32 ulps (FMA
    # contraction), hence the tight-but-not-bitwise cost tolerance
    np.testing.assert_allclose(c_w, c_x, rtol=0, atol=5e-3)
    for parity in (0, 1):
        n_p = jnp.moveaxis(
            checkerboard_pack(jnp.moveaxis(normals, -1, 1), parity), 1, -1)
        w_p = checkerboard_pack(ws, parity)
        c_xp = np.asarray(rect_batched_ncc(rect, n_p, w_p, params,
                                           interpret=True, parity=parity))
        c_wp = np.asarray(rect_batched_ncc(rect_w, n_p, w_p, wparams,
                                           interpret=True, parity=parity))
        np.testing.assert_allclose(c_wp, c_xp, rtol=0, atol=5e-3)


def test_warp_image_kernel_matches_xla_frames(setup):
    """The kernelised sentinel-variant source warp (ops/pallas/warp_image)
    matches the XLA packed-row warp bit-for-bit at every VALID sample and
    agrees on the sentinel mask inside the footprint; the geom disparity
    warp likewise."""
    from acmmp_spherical_tpu.ops.rectify import (
        SENTINEL_THRESH, build_rect_context, rect_warp_window,
    )

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    rhw = rect_shape(H, W)
    whw = rect_warp_window(ref_cam, src_cams, rhw)
    assert whw is not None
    dr = (ref_cam.depth_range[0], ref_cam.depth_range[1])
    sdep = jnp.asarray(np.asarray(depths[1:], np.float32))
    rect_x = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                dr, src_depths=sdep)
    rect_k = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                dr, src_depths=sdep, warp_hw=whw)
    for name, fx, fk in (("src", rect_x.rect_src, rect_k.rect_src),
                         ("sdisp", rect_x.rect_sdisp, rect_k.rect_sdisp)):
        fx = np.asarray(fx)
        fk = np.asarray(fk)
        vx = fx > SENTINEL_THRESH
        vk = fk > SENTINEL_THRESH
        np.testing.assert_array_equal(vx, vk, err_msg=name)
        # values agree to f32 ulps (identical formulas; the two program
        # structures contract FMAs differently, so bitwise equality is not
        # achievable -- measured max abs diff 4.6e-5 on 0..255 intensities)
        np.testing.assert_allclose(fx[vx], fk[vx], rtol=0, atol=2e-3,
                                   err_msg=name)
        assert vx.mean() > 0.02, (name, vx.mean())


def test_rect_ncc_agrees_with_exact_ranking(setup):
    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    ctx = ref_tap_context(images[0], ref_cam, params)
    w2 = w * 1.2
    exact0 = np.asarray(multiview_ncc(images[1:], src_cams, ref_cam, n_cam, w,
                                      ctx, params))
    exact1 = np.asarray(multiview_ncc(images[1:], src_cams, ref_cam, n_cam,
                                      w2, ctx, params))
    cost = np.asarray(rect_batched_ncc(
        rect, jnp.stack([n_cam, n_cam]), jnp.stack([w, w2]), params,
        interpret=True))
    interior = np.s_[:, 10:-10, 10:-10]
    r0, r1 = cost[0][interior], cost[1][interior]
    e0, e1 = exact0[interior], exact1[interior]
    ok = (r0 < params.cost_max - 1e-3) & (r1 < params.cost_max - 1e-3) \
        & (e0 < params.cost_max - 1e-3) & (e1 < params.cost_max - 1e-3)
    # where both paths evaluate, they agree on which hypothesis is better
    # at pixels with a clear margin
    margin = np.abs(e0 - e1) > 0.05
    sel = ok & margin
    assert sel.mean() > 0.3
    agree = ((r0 < r1) == (e0 < e1))[sel]
    assert agree.mean() > 0.9, agree.mean()
    # absolute agreement on the GT plane is loose but bounded
    assert np.median(np.abs(r0 - e0)[ok]) < 0.1


def test_rect_comp_grid_matches_full_frame(setup):
    """The bbox compute grid (rect_comp_shape + per-pair offsets) returns the
    same mapped-back costs as the full storage frame."""
    from acmmp_spherical_tpu.ops.rectify import rect_comp_shape

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    rhw = rect_shape(H, W)
    comp_hw = rect_comp_shape(ref_cam, src_cams, rhw)
    assert comp_hw[0] <= rhw[0] and comp_hw[1] <= rhw[1]
    assert comp_hw[0] % 8 == 0 and comp_hw[1] % 128 == 0
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    rect_b = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (dmin, dmax), comp_hw=comp_hw)
    # every original pixel the full frame covers is covered by the bbox grid
    assert bool(jnp.all(rect_b.maps[0].bwd_valid == rect.maps[0].bwd_valid))
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_full = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                         interpret=True))
    c_bbox = np.asarray(rect_batched_ncc(rect_b, normals, ws, params,
                                         interpret=True))
    np.testing.assert_allclose(c_bbox, c_full, rtol=1e-5, atol=1e-5)


def test_rect_live_tile_compaction_matches_full(setup):
    """The compacted live-tile transport (rect_live_tile_count budget) returns
    identical mapped-back costs to the identity (all-tiles) maps, and the
    host budget covers every live tile the device map produces."""
    from acmmp_spherical_tpu.ops.rectify import (
        rect_comp_shape, rect_live_tile_count,
    )

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    rhw = rect_shape(H, W)
    comp_hw = rect_comp_shape(ref_cam, src_cams, rhw)
    live_n = rect_live_tile_count(ref_cam, src_cams, rhw, comp_hw)
    T = (comp_hw[0] // 8) * (comp_hw[1] // 128)
    assert 0 < live_n <= T
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    rect_c = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (dmin, dmax), comp_hw=comp_hw, live_n=live_n)
    rect_f = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (dmin, dmax), comp_hw=comp_hw, live_n=None)
    # the budget never drops a live pixel: both map sets validate the same
    # original pixels
    for m_c, m_f in zip(rect_c.maps, rect_f.maps):
        assert bool(jnp.all(m_c.bwd_valid == m_f.bwd_valid))
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_full = np.asarray(rect_batched_ncc(rect_f, normals, ws, params,
                                         interpret=True))
    c_comp = np.asarray(rect_batched_ncc(rect_c, normals, ws, params,
                                         interpret=True))
    np.testing.assert_allclose(c_comp, c_full, rtol=1e-5, atol=1e-5)


def test_rect_parity_maps_match_full(setup):
    """Per-parity transport: evaluating checkerboard-packed half-grid fields
    through the parity maps equals packing the full-grid evaluation at every
    collision-free pixel.  Where two original pixels of OPPOSITE colour claim
    one rect pixel the full map keeps one winner while each parity map --
    rescattered from its own colour only -- resolves the pixel to its own
    plane (round-3 advisor fix): per-parity own-plane resolution must
    therefore cover at least every full-map-collision-free pixel, and every
    own-resolved valid pixel must read back a finite (non-cost_max-forced)
    attribution, never the silent freeze the derived maps produced."""
    from acmmp_spherical_tpu.ops.sampling import checkerboard_pack

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    assert len(rect.maps) == 3
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_full = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                         interpret=True))
    m0 = rect.maps[0]
    S = m0.bwd_cidx.shape[0]
    own = jax.vmap(lambda f, b: f[b])(m0.fwd_idx, m0.bwd_cidx)
    oflat = jnp.arange(H * W, dtype=jnp.int32)[None]
    no_collision = np.asarray(
        (own == oflat).reshape(S, H, W) & m0.bwd_valid)        # (S, H, W)
    assert no_collision.mean() > 0.8
    Wh = W // 2
    for parity in (0, 1):
        mp = rect.maps[1 + parity]
        # own-plane resolution of THIS colour's map: the claimed rect pixel
        # points back at the pixel itself
        own_p = np.asarray(
            jax.vmap(lambda f, b: f[b])(mp.fwd_idx, mp.bwd_cidx)
            == jnp.arange(H * Wh, dtype=jnp.int32)[None]
        ).reshape(S, H, Wh) & np.asarray(mp.bwd_valid)
        nc_p = np.asarray(checkerboard_pack(jnp.asarray(no_collision),
                                            parity))
        # the rescattered parity map resolves every full-map-collision-free
        # pixel of its colour, plus the cross-colour collision victims: only
        # SAME-colour collisions (>= 2 px apart, needs strong contraction)
        # remain unresolved, so own-resolution is high for BOTH colours even
        # though the full map's arbitrary winner choice skews nc_p per colour
        assert (own_p | ~nc_p).all()
        assert (own_p | ~np.asarray(mp.bwd_valid)).mean() > 0.95
        n_p = jnp.moveaxis(
            checkerboard_pack(jnp.moveaxis(normals, -1, 1), parity), 1, -1)
        w_p = checkerboard_pack(ws, parity)
        c_p = np.asarray(rect_batched_ncc(rect, n_p, w_p, params,
                                          interpret=True, parity=parity))
        want = np.asarray(checkerboard_pack(jnp.asarray(c_full), parity))
        sel = np.broadcast_to(nc_p[None], c_p.shape)
        np.testing.assert_allclose(c_p[sel], want[sel], rtol=1e-5, atol=1e-5)
        # full-map-agreement pixels cover at least the balanced collision-free
        # floor (the full map hands ALL cross-colour collisions to one colour,
        # so the losing colour's share can sit well below the overall mean)
        assert sel.mean() > 0.5
        # cross-colour collision victims (own-resolved but full-map-lost) are
        # no longer FROZEN: before the rescatter fix they read cost_max for
        # every candidate by construction (fraction 1.0); now they evaluate
        # their own plane and only the usual legitimate rejections remain
        # (sentinel taps at footprint borders, variance floor)
        victims = own_p & ~nc_p
        if victims.any():
            frozen_frac = (c_p[0][victims] >= params.cost_max - 1e-4).mean()
            assert frozen_frac < 0.5, frozen_frac


def test_rect_wide_window_matches_default(setup):
    """rect_win_w=512 (the init window for wide-span scenes) returns the same
    costs as the default 384 window wherever both windows cover the taps."""
    import dataclasses

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    normals = jnp.stack([n_cam])
    ws = jnp.stack([w])
    c384 = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                       interpret=True))
    p512 = dataclasses.replace(params, rect_win_w=512)
    c512 = np.asarray(rect_batched_ncc(rect, normals, ws, p512,
                                       interpret=True))
    both = (c384 < params.cost_max - 1e-3) & (c512 < params.cost_max - 1e-3)
    assert both.mean() > 0.5
    np.testing.assert_allclose(c512[both], c384[both], rtol=1e-5, atol=1e-5)
    # the wider window can only ADD coverage
    assert ((c512 < params.cost_max - 1e-3) | ~both).all()


def test_rect_geom_cost_matches_exact(setup):
    """The fused 1D disparity-mismatch geom term matches the exact
    forward-backward reprojection cost (ops/geom.py) on the golden: near
    zero for consistent GT planes + GT source depths, clamped high for a
    wrong plane.  Reference: ACMMP.cu:646-671."""
    from acmmp_spherical_tpu.ops.geom import geom_consistency_cost

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]
    src_depths = jnp.asarray(depths[1:])
    rect_g = build_rect_context(images[0], images[1:], ref_cam, src_cams,
                                (dmin, dmax), src_depths=src_depths)
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.5])
    cv, gv = rect_batched_ncc(rect_g, normals, ws, params, interpret=True,
                              with_geom=True)
    gv = np.asarray(gv)
    from acmmp_spherical_tpu.ops.ncc import ref_tap_context as _rtc

    ctx = _rtc(images[0], ref_cam, params)
    g_exact = np.asarray(geom_consistency_cost(
        src_depths, src_cams, ref_cam, n_cam, w, ctx.xs, ctx.ys, params))
    interior = np.s_[:, 10:-10, 10:-10]
    ok = gv[0][interior] < params.geom_max_cost - 1e-3
    assert ok.mean() > 0.5, ok.mean()
    # GT plane + GT source depths: both paths report sub-pixel errors
    assert np.median(gv[0][interior][ok]) < 0.5, np.median(gv[0][interior][ok])
    assert np.median(g_exact[interior]) < 0.5
    # a 50% depth error saturates the clamp in both formulations
    far = gv[1][interior]
    assert np.median(far) > 0.8 * params.geom_max_cost, np.median(far)


@pytest.mark.slow
def test_rect_geom_pass_quality(setup):
    """Seeded geometric-consistency pass entirely on the rectified kernel
    (fused geom term + kernel-evaluated seeded init, interpret mode):
    quality matches the exact geom pass on the golden."""
    import dataclasses

    from acmmp_spherical_tpu.core import geometry as G2
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    dr = jnp.asarray(np.asarray(ref_cam.depth_range), jnp.float32)
    seed_depth = jnp.asarray(depths[0] * (1.0 + 0.01 * np.sin(
        np.arange(H * W).reshape(H, W))))       # near-GT noisy seed
    seed_normal_world = G2.normal_cam_to_world(ref_cam, n_cam)
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=ref_cam,
        src_cams=src_cams, src_valid=jnp.ones(3, bool), depth_range=dr,
        src_depths=jnp.asarray(depths[1:]),
    )
    for rect_on in (False, True):
        p = dataclasses.replace(params, rect_ncc=rect_on).with_geom(False)
        d, _, _, _ = run_patchmatch(inputs, p, jax.random.key(5),
                                    seed_normal_world=seed_normal_world,
                                    seed_depth=seed_depth)
        rel = np.abs(np.asarray(d) - depths[0]) / depths[0]
        med = np.median(rel[8:-8, 8:-8])
        assert med < 0.01, (rect_on, med)


def test_tap_pack_off_matches_packed_costs(setup):
    """The rect_tap_pack=False A/B variant (f32 window, two gathers/selects
    per chunk) must agree with the default bf16 pair-packed tap sampling to
    within the bf16 quantisation bound: packed taps carry <= 2^-9 relative
    image-value error, and the NCC normalisation keeps the cost delta well
    under 1e-2 everywhere (the variants share every other code path)."""
    import dataclasses

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_pack = np.asarray(rect_batched_ncc(rect, normals, ws, params,
                                         interpret=True))
    p_nopack = dataclasses.replace(params, rect_tap_pack=False)
    c_raw = np.asarray(rect_batched_ncc(rect, normals, ws, p_nopack,
                                        interpret=True))
    both_valid = (c_pack < params.cost_max - 1e-6) \
        & (c_raw < params.cost_max - 1e-6)
    # validity flips only where a bf16-rounded tap crosses the sentinel /
    # window-edge threshold -- must be rare
    assert (both_valid.mean() > 0.75
            and np.mean(c_pack < params.cost_max - 1e-6)
            - np.mean(both_valid) < 0.005)
    d = np.abs(c_pack - c_raw)[both_valid]
    assert np.median(d) < 1e-3, np.median(d)
    assert np.quantile(d, 0.99) < 2e-2, np.quantile(d, 0.99)


def test_backmap_pack_off_matches_packed_costs(setup):
    """rect_backmap_pack=True returns costs equal to the f32 backmap within
    the bf16 quantisation width (<= 2^-8 relative, absolute <= 0.008 at
    cost_max): same gather, same attribution, only the transported lanes are
    pair-packed."""
    import dataclasses

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    normals = jnp.stack([n_cam, n_cam, n_cam])
    ws = jnp.stack([w, w * 1.15, w * 1.35])
    p_pack = dataclasses.replace(params, rect_backmap_pack=True)
    p_raw = dataclasses.replace(params, rect_backmap_pack=False)
    c_pack = np.asarray(rect_batched_ncc(rect, normals, ws, p_pack,
                                         interpret=True))
    c_raw = np.asarray(rect_batched_ncc(rect, normals, ws, p_raw,
                                        interpret=True))
    # invalid pixels carry the exact f32 fill in both variants
    fillmask = c_raw >= params.cost_max - 1e-6
    assert np.array_equal(fillmask, c_pack >= np.float32(
        np.asarray(jnp.float32(params.cost_max)).astype(np.float32)) - 8e-3)
    d = np.abs(c_pack - c_raw)
    assert d.max() <= 8e-3 + 1e-6, d.max()
    # relative error of valid costs is the bf16 width
    v = ~fillmask & (c_raw > 1e-3)
    assert np.median((d[v] / c_raw[v])) < 2 ** -8, np.median(d[v] / c_raw[v])


def test_inv_attrib_matches_scatter_maps(setup):
    """The scatter-free inverse-check attribution (rect_inv_attrib) produces
    semantically identical transport to the scatter build: the same claimant
    existence everywhere, and identical mapped-back costs except where a
    genuine same-parity collision lets the two deterministic winner rules
    (largest-flat-index vs scatter write order) pick different claimants."""
    import dataclasses

    from acmmp_spherical_tpu.ops.rectify import (
        rect_comp_shape, rect_inv_attrib_ok, rect_live_tile_count,
        rect_warp_window,
    )

    images, depths, ref_cam, src_cams, params, n_cam, w, rect, (H, W) = setup
    rhw = rect_shape(H, W)
    assert rect_inv_attrib_ok(ref_cam, src_cams, rhw)
    comp_hw = rect_comp_shape(ref_cam, src_cams, rhw)
    live_n = rect_live_tile_count(ref_cam, src_cams, rhw, comp_hw)
    warp_hw = rect_warp_window(ref_cam, src_cams, rhw)
    dmin, dmax = ref_cam.depth_range[0], ref_cam.depth_range[1]

    ctxs = {}
    for inv in (False, True):
        ctxs[inv] = build_rect_context(
            images[0], images[1:], ref_cam, src_cams, (dmin, dmax),
            comp_hw=comp_hw, live_n=live_n, warp_hw=warp_hw, inv_attrib=inv)

    # claimant existence is winner-independent: scatter each map's
    # fwd_valid back onto the content grid and require exact equality
    hb, wb = comp_hw
    for mi in range(3):
        ms, mv = ctxs[False].maps[mi], ctxs[True].maps[mi]
        for ctx_i, m in ((False, ms), (True, mv)):
            grid = np.zeros((ms.fwd_valid.shape[0], hb, wb), np.float32)
            toy = np.asarray(ctxs[ctx_i].tile_oy)
            tox = np.asarray(ctxs[ctx_i].tile_ox)
            fv = np.asarray(m.fwd_valid).reshape(grid.shape[0], -1, 8, 128)
            # content origins: tile_oy/ox are storage-frame; subtract the
            # per-pair bbox offset carried in srow[2:4]
            off_y = np.asarray(ctxs[ctx_i].srow[:, 2])
            off_x = np.asarray(ctxs[ctx_i].srow[:, 3])
            for s in range(grid.shape[0]):
                for k in range(fv.shape[1]):
                    y0 = int(toy[s, k] - off_y[s])
                    x0 = int(tox[s, k] - off_x[s])
                    if 0 <= y0 <= hb - 8 and 0 <= x0 <= wb - 128:
                        grid[s, y0:y0 + 8, x0:x0 + 128] = np.maximum(
                            grid[s, y0:y0 + 8, x0:x0 + 128], fv[s, k])
            if ctx_i is False:
                ref_grid = grid
            else:
                np.testing.assert_array_equal(grid, ref_grid,
                                              err_msg=f"map {mi}")

    # mapped-back costs agree except at collision-winner flips (rare)
    normals = jnp.stack([n_cam, n_cam])
    ws = jnp.stack([w, w * 1.35])
    c_sc = np.asarray(rect_batched_ncc(ctxs[False], normals, ws, params,
                                       interpret=True))
    c_iv = np.asarray(rect_batched_ncc(ctxs[True], normals, ws, params,
                                       interpret=True))
    differ = np.abs(c_sc - c_iv) > 1e-5
    assert differ.mean() < 0.005, differ.mean()
