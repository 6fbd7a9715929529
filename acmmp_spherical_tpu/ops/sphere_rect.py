"""Pole-rotated spherical fast path: equirect pairs for the rectified kernel.

The reference evaluates SPHERE problems with per-tap ray trigonometry inside
the NCC kernel (ComputeBilateralNCC sphere branches, ACMMP.cu:425-486); a
direct port would be gather-bound on TPU exactly like the pinhole case.
Instead, rotate each (ref, src) pair so the baseline becomes the POLE axis
of a shared equirectangular frame:

* the pair's relative motion is then a pure translation along the pole, so
  a scene point keeps its LONGITUDE and moves only in LATITUDE between the
  two rotated views -- meridians are the epipolar curves;
* storing the rotated frames TRANSPOSED (rows = meridians/longitude,
  lanes = latitude) makes every match a same-row lane displacement, which
  is precisely the contract of the rectified Pallas kernel
  (ops/pallas/ncc_rect._rect_kernel): per-pixel displacement fields
  ``disp(x+dx, y+dy) ~= D + A dx + B dy`` with taps sampled at
  ``(x + dx - disp, y + dy)``;
* a plane hypothesis induces ``lat_src = atan2(d sin(lat) + B, d cos(lat))``
  with ``d`` the plane depth along the pixel ray -- smooth in the tile, so
  the affine (D, A, B) model holds away from the rotated poles.  The poles
  ARE the pair's epipoles: pixels within ``lat_cap`` of them are masked per
  pair (their cost is cost_max for THAT view only; other views have other
  pole axes, mirroring the reference's epipole degradation).

The rotation basis signs are chosen so displacement is non-negative
(lane_src >= lane_ref), matching the kernel's positive-disparity validation.
All transport uses the same once-per-pass forward map + wide-row gathers as
the pinhole path (an XLA scatter row costs ~14x a gather row; PERF.md).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.core.camera import Camera, Cameras, camera_center
from acmmp_spherical_tpu.ops.rectify import PAD_X, PAD_Y

_HI = jax.lax.Precision.HIGHEST
PI = math.pi
LAT_CAP_DEG = 78.0   # per-pair polar cap: |rotated latitude| above this is
                     # masked (epipole region; affine disp model degrades)


class SphereRectContext(NamedTuple):
    """Per-pass pole-rotated working set (sphere analog of RectContext)."""

    rect_ref: jax.Array   # (S, Wt+2*PAD_Y, Ht+2*PAD_X) transposed rotated
                          # equirect reference (rows=lon, lanes=lat)
    rect_src: jax.Array   # (S, ..., ...) transposed rotated sources
    maps: tuple           # compacted transport maps (full[, p0, p1]); see
                          # rectify.TransportMaps
    tile_oy: jax.Array    # (S, N) int32 live-tile row origins (SMEM tables)
    tile_ox: jax.Array    # (S, N) int32
    srow: jax.Array       # (S, 128): [0]=disp_lo, [1]=disp_hi, [2]=[3]=0,
                          # [4]=1 (geom-error scale: lane pixels and original
                          # equirect pixels share the H/pi-per-radian scale)
    rays_cam: jax.Array   # (S, H, W, 3, 3) ref-cam rays of each orig pixel's
                          # claimed target at (+0, +1 lane, +1 row)
    rect_sdisp: "jax.Array | None"
                          # (S, Rp, Lp) per-pair warped source depth maps as
                          # the IMPLIED LANE DISPLACEMENT (SENTINEL where
                          # invalid) for the fused geom term
    slat: jax.Array       # (S, H, W, 3) sin(rotated lat) at those targets
    lat: jax.Array        # (S, H, W, 3) rotated lat (radians)
    baseline: jax.Array   # (S,)


def _equirect_ray(lon, lat):
    cl = jnp.cos(lat)
    return jnp.stack([cl * jnp.sin(lon), -jnp.sin(lat), cl * jnp.cos(lon)],
                     axis=-1)


def sphere_rectifiable(ref_cam: Camera, src_cams: Cameras) -> bool:
    """Host gate: every pair has a usable baseline (pole basis exists)."""
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    C0 = -R0.T @ t0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = R0 @ (C1 - C0)
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return False
        # e3 (forward) degenerates when the baseline is the optical axis;
        # any other axis works, so only reject the exactly-parallel case
        if abs(b[2] / bn) > 1.0 - 1e-9:
            return False
    return True


def build_sphere_rect_context(
    ref_image: jax.Array,    # (H, W) equirect
    src_images: jax.Array,   # (S, Hp, Wp)
    ref_cam: Camera,
    src_cams: Cameras,
    depth_range,             # (dmin, dmax) traced scalars
    lat_cap_deg: float = LAT_CAP_DEG,
    src_depths: jax.Array | None = None,  # (S, Hp, Wp): also build rect_sdisp
    live_n: "int | None" = None,          # static live-tile budget (the
                                          # rotated frame is mostly live, so
                                          # None = identity is the default)
    parity_maps: bool = True,
    reuse: "SphereRectContext | None" = None,  # a context built for ANOTHER
                                          # PASS of the same (image, scale):
                                          # only rect_sdisp depends on
                                          # src_depths (see rectify's reuse)
) -> SphereRectContext:
    """Build the per-pass pole-rotated working set (all XLA; one per pass)."""
    from acmmp_spherical_tpu.core import geometry as G
    from acmmp_spherical_tpu.ops.sampling import (
        grid_coords, pack_bicubic, sample_bicubic_packed16,
    )

    H, W = ref_image.shape
    if reuse is not None:
        rect_sdisp = None
        if src_depths is not None:
            rect_sdisp = build_sphere_sdisp(ref_cam, src_cams, src_depths,
                                            (H, W))
        return reuse._replace(rect_sdisp=rect_sdisp)
    Ht = -(-H // 128) * 128      # lanes (latitude), 128-aligned
    Wt = -(-W // 8) * 8          # rows (longitude), 8-aligned
    cx = ref_cam.params[1]
    cy = ref_cam.params[2]
    lat_cap = math.radians(lat_cap_deg)

    R_rot, R_rel, Bn = _pole_basis(ref_cam, src_cams)

    # ---- warps into the transposed rotated frames --------------------------
    rows = (jax.lax.broadcasted_iota(
        jnp.float32, (Wt + 2 * PAD_Y, Ht + 2 * PAD_X), 0) - PAD_Y)
    lanes = (jax.lax.broadcasted_iota(
        jnp.float32, (Wt + 2 * PAD_Y, Ht + 2 * PAD_X), 1) - PAD_X)
    lon_g = (rows - cx) / W * (2.0 * PI)
    lat_g = -(lanes - cy) / H * PI
    ray_rot_g = _equirect_ray(lon_g, lat_g)        # (Rp, Lp, 3)

    def px_of_ray(ray):
        """Equirect pixel of a unit ray in its own camera frame."""
        lat = -jnp.arcsin(jnp.clip(ray[..., 1], -1.0, 1.0))
        lon = jnp.arctan2(ray[..., 0], ray[..., 2])
        return (lon / (2.0 * PI) * W + cx, -lat / PI * H + cy)

    ref_p16 = pack_bicubic(ref_image, ref_cam.width, ref_cam.height,
                           wrap_x=True)

    def warp_ref(Rr):
        ray_cam = jnp.einsum("ji,...j->...i", Rr, ray_rot_g,
                             precision=_HI)
        px, py = px_of_ray(ray_cam)
        val, _ = sample_bicubic_packed16(ref_p16, ref_image.shape[1], px, py,
                                         ref_cam.width, ref_cam.height,
                                         wrap_x=True)
        return val

    rect_ref = jax.vmap(warp_ref)(R_rot)

    def warp_src(img, Rr, Rl, wd, ht, pcx, pcy):
        p16 = pack_bicubic(img, wd, ht, wrap_x=True)
        ray_cam = jnp.einsum("ji,...j->...i", Rr, ray_rot_g, precision=_HI)
        ray_s = jnp.einsum("ij,...j->...i", Rl, ray_cam, precision=_HI)
        lat = -jnp.arcsin(jnp.clip(ray_s[..., 1], -1.0, 1.0))
        lon = jnp.arctan2(ray_s[..., 0], ray_s[..., 2])
        px = lon / (2.0 * PI) * wd + pcx
        py = -lat / PI * ht + pcy
        val, _ = sample_bicubic_packed16(p16, img.shape[1], px, py, wd, ht,
                                         wrap_x=True)
        return val

    rect_src = jax.vmap(warp_src)(src_images, R_rot, R_rel,
                                  src_cams.width, src_cams.height,
                                  src_cams.params[:, 1], src_cams.params[:, 2])

    rect_sdisp = None
    if src_depths is not None:
        rect_sdisp = build_sphere_sdisp(ref_cam, src_cams, src_depths,
                                        (H, W))

    # ---- backward map: orig pixel -> transposed rotated pixel --------------
    xs, ys = grid_coords(H, W)
    ray_o = G.pixel_ray(ref_cam, xs, ys)           # (H, W, 3) unit

    def bwd(Rr):
        ray_r = jnp.einsum("ij,hwj->hwi", Rr, ray_o, precision=_HI)
        lat_r = -jnp.arcsin(jnp.clip(ray_r[..., 1], -1.0, 1.0))
        lon_r = jnp.arctan2(ray_r[..., 0], ray_r[..., 2])
        rowf = lon_r / (2.0 * PI) * W + cx
        lanef = -lat_r / PI * H + cy
        row = jnp.remainder(jnp.round(rowf).astype(jnp.int32), W)
        lane = jnp.round(lanef).astype(jnp.int32)
        ok = (jnp.abs(lat_r) <= lat_cap) & (lane >= 0) & (lane < H)
        return row, lane, ok, row, lane

    bwd_row, bwd_lane, bwd_valid, row_q, lane_q = jax.vmap(bwd)(R_rot)

    # ---- compacted transport maps (the once-per-pass scatters) -------------
    # the transposed frame's "x" axis is the lane (latitude), "y" the row
    # (longitude); live tiles are those inside the per-pair latitude caps
    from acmmp_spherical_tpu.ops.rectify import build_transport_maps

    S = R_rot.shape[0]
    zero = jnp.zeros((S,), jnp.int32)
    maps, tile_oy, tile_ox = build_transport_maps(
        jnp.clip(bwd_lane, 0, Ht - 1).reshape(S, -1),
        bwd_row.reshape(S, -1), bwd_valid, (Wt, Ht), (H, W), zero, zero,
        live_n=live_n, parity_maps=parity_maps)

    # ---- hoisted target rays (center, +1 lane, +1 row) ---------------------
    def targets(Rr, row, lane):
        rays, slats, lats = [], [], []
        for dr, dc in ((0, 0), (0, 1), (1, 0)):
            lon_q = (row.astype(jnp.float32) + dr - cx) / W * (2.0 * PI)
            lat_qv = -(lane.astype(jnp.float32) + dc - cy) / H * PI
            rr = _equirect_ray(lon_q, lat_qv)
            rc = jnp.einsum("ji,hwj->hwi", Rr, rr, precision=_HI)
            rays.append(rc)
            slats.append(jnp.sin(lat_qv))
            lats.append(lat_qv)
        return (jnp.stack(rays, axis=-2), jnp.stack(slats, axis=-1),
                jnp.stack(lats, axis=-1))

    rays_cam, slat, lat = jax.vmap(targets)(R_rot, row_q, lane_q)

    # ---- global displacement bounds (srow) ---------------------------------
    dmin, dmax = depth_range[0], depth_range[1]
    sl0 = slat[..., 0]
    cl0 = jnp.sqrt(jnp.maximum(1.0 - sl0 * sl0, 1e-12))
    live = bwd_valid

    def disp_at(d):
        lat_s = jnp.arctan2(d * sl0 + Bn[:, None, None], d * cl0)
        # lane_ref - lane_src: positive with the +baseline pole axis
        return (lat_s - lat[..., 0]) * (H / PI)

    d_lo = disp_at(jnp.maximum(dmin, 1e-6))
    d_hi = disp_at(jnp.maximum(dmax, 1e-6))
    big = jnp.where(live, jnp.maximum(d_lo, d_hi), -jnp.inf)
    sml = jnp.where(live, jnp.minimum(d_lo, d_hi), jnp.inf)
    srow = jnp.zeros((Bn.shape[0], 128), jnp.float32)
    srow = srow.at[:, 0].set(jnp.min(sml.reshape(Bn.shape[0], -1), axis=1) - 2.0)
    srow = srow.at[:, 1].set(jnp.max(big.reshape(Bn.shape[0], -1), axis=1) + 2.0)

    # lane pixels and original equirect pixels share the H/pi-per-radian
    # scale, so the fused geom error needs no conversion
    srow = srow.at[:, 4].set(1.0)

    return SphereRectContext(
        rect_ref=rect_ref, rect_src=rect_src, maps=maps,
        tile_oy=tile_oy, tile_ox=tile_ox, srow=srow,
        rays_cam=rays_cam, rect_sdisp=rect_sdisp, slat=slat, lat=lat,
        baseline=Bn,
    )


def _pole_basis(ref_cam: Camera, src_cams: Cameras):
    """Per-pair pole basis in the ref-cam frame: ``(R_rot, R_rel, Bn)``
    with ``R_rot`` (S, 3, 3) cam -> rotated (pole axis = +baseline),
    ``R_rel`` (S, 3, 3) src-cam <- ref-cam, ``Bn`` (S,) baseline norms."""
    C0 = camera_center(ref_cam)
    Csrc = jax.vmap(lambda R, t: -R.T @ t)(src_cams.R, src_cams.t)
    b_cam = jnp.einsum("ij,sj->si", ref_cam.R, Csrc - C0, precision=_HI)
    Bn = jnp.linalg.norm(b_cam, axis=-1)
    e2 = b_cam / jnp.maximum(Bn, 1e-20)[:, None]
    z = jnp.asarray([0.0, 0.0, 1.0])
    e3 = z[None] - e2 * e2[:, 2:3]
    e3 = e3 / jnp.maximum(jnp.linalg.norm(e3, axis=-1, keepdims=True), 1e-20)
    e1 = jnp.cross(e2, e3)
    R_rot = jnp.stack([e1, e2, e3], axis=-2)
    R_rel = jnp.einsum("sij,kj->sik", src_cams.R, ref_cam.R, precision=_HI)
    return R_rot, R_rel, Bn


def build_sphere_sdisp(ref_cam: Camera, src_cams: Cameras,
                       src_depths: jax.Array, hw: tuple[int, int]):
    """Warp each source's depth map (RADIAL depth -- rotation-invariant)
    into its pair's rotated transposed frame as the IMPLIED LANE
    DISPLACEMENT: the exact inverse of the candidate mapping, so a
    consistent depth gives a zero disparity mismatch by construction.
    The only piece of the sphere working set that changes between the
    passes of one (image, scale) -- see build_sphere_rect_context's
    ``reuse``."""
    H, W = hw
    Ht = -(-H // 128) * 128
    Wt = -(-W // 8) * 8
    cx = ref_cam.params[1]
    cy = ref_cam.params[2]
    R_rot, R_rel, Bn = _pole_basis(ref_cam, src_cams)
    rows = (jax.lax.broadcasted_iota(
        jnp.float32, (Wt + 2 * PAD_Y, Ht + 2 * PAD_X), 0) - PAD_Y)
    lanes = (jax.lax.broadcasted_iota(
        jnp.float32, (Wt + 2 * PAD_Y, Ht + 2 * PAD_X), 1) - PAD_X)
    lon_g = (rows - cx) / W * (2.0 * PI)
    lat_g = -(lanes - cy) / H * PI
    ray_rot_g = _equirect_ray(lon_g, lat_g)

    def warp_disp(zmap, Rr, Rl, wd, ht, pcx, pcy, B):
        ray_cam = jnp.einsum("ji,...j->...i", Rr, ray_rot_g,
                             precision=_HI)
        ray_s = jnp.einsum("ij,...j->...i", Rl, ray_cam, precision=_HI)
        lat_i = -jnp.arcsin(jnp.clip(ray_s[..., 1], -1.0, 1.0))
        lon_i = jnp.arctan2(ray_s[..., 0], ray_s[..., 2])
        px = lon_i / (2.0 * PI) * wd + pcx
        py = -lat_i / PI * ht + pcy
        wi = zmap.shape[1]
        xi = jnp.remainder(px.astype(jnp.int32),
                           jnp.maximum(wd.astype(jnp.int32), 1))
        yi = py.astype(jnp.int32)            # C truncation
        ok = (py >= 0) & (yi < ht.astype(jnp.int32))
        d_s = zmap.reshape(-1)[jnp.clip(yi, 0, zmap.shape[0] - 1) * wi
                               + jnp.clip(xi, 0, wi - 1)]
        lat_r = jnp.arctan2(d_s * jnp.sin(lat_g) - B,
                            d_s * jnp.cos(lat_g))
        g = (lat_g - lat_r) * (H / PI)
        return jnp.where(ok & (d_s > 0), g, -1.0e4)

    return jax.vmap(warp_disp)(
        src_depths, R_rot, R_rel, src_cams.width, src_cams.height,
        src_cams.params[:, 1], src_cams.params[:, 2], Bn)


import functools


def _pack_hw_axes(arr: jax.Array, parity: int):
    """checkerboard_pack over axes (1, 2) of (S, H, W, ...) hoisted arrays."""
    even = arr[:, 0::2, parity::2]
    odd = arr[:, 1::2, (1 - parity)::2]
    stacked = jnp.stack([even, odd], axis=2)   # (S, H/2, 2, W/2, ...)
    return stacked.reshape(arr.shape[0], arr.shape[1], arr.shape[2] // 2,
                           *arr.shape[3:])


@functools.partial(jax.jit,
                   static_argnames=("params", "interpret", "with_geom",
                                    "parity"))
def sphere_batched_ncc(
    ctx: SphereRectContext,
    normals: jax.Array,    # (C, H, Wg, 3) plane normals (ref-cam frame)
    ws: jax.Array,         # (C, H, Wg)
    params,
    *,
    interpret: bool = False,
    with_geom: bool = False,  # also emit the fused geom cost -> (cv, gv)
    parity: "int | None" = None,  # 0/1: checkerboard-packed half-grid fields
):
    """Evaluate C candidate plane fields against S sources -> (C, S, H, Wg).

    XLA pre-step: for each original pixel's claimed target (and its +1 lane /
    +1 row neighbours, hoisted in the context), the plane depth along the
    target ray gives the latitude displacement; finite differences yield the
    kernel's affine (D, A, B).  Transport/back-map identical to the pinhole
    wrapper (wide-row gathers through the per-pass compacted maps; parity
    maps halve them for half-step evaluations).
    """
    from acmmp_spherical_tpu.ops.pallas.ncc_rect import (
        pack_ab, run_rect_kernel,
    )

    C, H_eval, Wg = ws.shape
    maps = ctx.maps[0 if parity is None else 1 + parity]
    S = ctx.baseline.shape[0]
    H = ctx.rays_cam.shape[1]                       # original height
    Bn = ctx.baseline[:, None, None, None]          # (S, 1, 1, 1)
    wsl = jnp.moveaxis(ws, 0, -1)[None]             # (1, H, Wg, C)
    if parity is None:
        rays, slat_a, lat_a = ctx.rays_cam, ctx.slat, ctx.lat
    else:
        rays = _pack_hw_axes(ctx.rays_cam, parity)
        slat_a = _pack_hw_axes(ctx.slat, parity)
        lat_a = _pack_hw_axes(ctx.lat, parity)

    disps, oks = [], []
    for k in range(3):
        ndot = jnp.einsum("chwj,shwj->shwc", normals, rays[..., k, :],
                          precision=_HI)
        d = -wsl / jnp.where(jnp.abs(ndot) < 1e-20, 1e-20, ndot)
        sl = slat_a[..., k][..., None]
        cl = jnp.sqrt(jnp.maximum(1.0 - sl * sl, 1e-12))
        u = d * sl + Bn
        v = d * cl
        lat_s = jnp.arctan2(u, v)
        disp = (lat_s - lat_a[..., k][..., None]) * (H / PI)
        disps.append(disp)
        oks.append((d > 0) & (v > 0) & jnp.isfinite(disp))
    good = oks[0] & oks[1] & oks[2]
    D = jnp.where(good, disps[0], -1e9)
    A = jnp.where(good, disps[1] - disps[0], 0.0)
    Bc = jnp.where(good, disps[2] - disps[0], 0.0)
    # (A, B) ride bf16-packed in one f32 lane (pack_ab): the forward gather
    # cost scales with width, so 2 floats per candidate instead of 3
    table = jnp.stack([D, pack_ab(A, Bc)], -1).reshape(S, H_eval * Wg, C * 2)

    K8 = maps.fwd_valid.shape[1]
    dab = jax.vmap(lambda t, idx: t[idx])(table, maps.fwd_idx)
    dab = dab.reshape(S, K8, 128, C, 2)
    D = dab[..., 0].transpose(3, 0, 1, 2)           # (C, S, K8, 128)
    AB = dab[..., 1].transpose(3, 0, 1, 2)
    D = jnp.where(maps.fwd_valid[None] > 0.5, D, -1e9)
    sdisp = ctx.rect_sdisp if with_geom else None
    return run_rect_kernel(ctx.srow, ctx.rect_ref, ctx.rect_src, D, AB,
                           maps, ctx.tile_oy, ctx.tile_ox, params,
                           out_hw=(H_eval, Wg), interpret=interpret,
                           rect_sdisp=sdisp)


def sphere_live_tile_count(ref_cam: Camera, *,
                           lat_cap_deg: float = LAT_CAP_DEG,
                           margin_tiles: int = 1) -> int:
    """Host-side static live-tile budget for the pole-rotated frame.

    Claimed pixels satisfy ``|rotated lat| <= lat_cap`` (bwd validity above),
    i.e. their LANE (latitude) coordinate lies in the band
    ``cy +- lat_cap/pi * H`` -- identical for every pair because the band is
    centred on the rotated equator.  Budgeting the compacted maps to the
    band's tiles (instead of ``live_n=None`` identity compaction) drops the
    dead polar-cap tiles from every transport gather and kernel grid step
    (~13% of the frame at the default 78 deg cap).  Same degrade-not-corrupt
    contract as rectify.rect_live_tile_count: an overflow drops only the
    emptiest boundary tiles.
    """
    H = int(np.asarray(ref_cam.height))
    W = int(np.asarray(ref_cam.width))
    cy = float(np.asarray(ref_cam.params[2]))
    Ht = -(-H // 128) * 128
    Wt = -(-W // 8) * 8
    cap_h = math.radians(lat_cap_deg) / PI * H
    lo = max(0, int(math.floor(cy - cap_h)) - 1)
    hi = min(H - 1, int(math.ceil(cy + cap_h)) + 1)
    n_lane_tiles = hi // 128 - lo // 128 + 1 + margin_tiles
    n_lane_tiles = min(n_lane_tiles, Ht // 128)
    return (Wt // 8) * n_lane_tiles


def sphere_init_window(ref_cam: Camera, src_cams: Cameras, *,
                       lat_cap_deg: float = LAT_CAP_DEG,
                       min_scale: float = 1.0) -> int:
    """Host-side: smallest static source window (384/512/640) covering the
    full plausible lane-displacement span for every pair, or 0.

    When nonzero, even a fresh random plane field evaluates with full tap
    coverage and the init eval rides the kernel (PatchMatchParams.rect_init,
    same contract as rectify.rect_init_window).  The displacement magnitude
    is maximal at d = dmin; it is evaluated on a latitude grid per pair.
    """
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    C0 = -R0.T @ t0
    dmin = float(np.asarray(ref_cam.depth_range)[0]) * min_scale
    H = float(np.asarray(ref_cam.height))
    if not dmin > 0:
        return 0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    cap = math.radians(lat_cap_deg)
    lats = np.linspace(-cap, cap, 181)
    span = 0.0
    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        B = np.linalg.norm(C1 - C0)
        if B < 1e-9:
            return 0
        disp = (np.arctan2(dmin * np.sin(lats) + B, dmin * np.cos(lats))
                - lats) * (H / PI)
        span = max(span, float(np.max(np.abs(disp))))
    for win in (384, 512, 640):
        if span + 4.0 <= win - 144:
            return win
    return 0
