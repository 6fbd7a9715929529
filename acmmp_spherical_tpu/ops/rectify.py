"""Epipolar rectification for the fast NCC path (pinhole pairs).

The round-1 windowed kernel pays ~window-height/8 one-hot row passes per
bilinear sample because a plane hypothesis moves the source sample in both x
and y (PERF.md).  Rectifying each (ref, src) pair -- rotating both cameras
onto the baseline so corresponding points share a row -- removes the y degree
of freedom entirely:

* a plane hypothesis induces an **affine disparity** over the rectified grid
  (``disp(x, y) = a*(x-cx) + b*(y-cy) + c`` with (a, b, c) linear in the
  plane parameters), and
* the source sample for rectified-ref pixel ``(x, y)`` sits at
  ``(x - disp, y)`` -- same integer row, so in-kernel sampling collapses to
  static row slices plus lane gathers in x.

The rectified evaluation is an *algorithmic reformulation*, not a bit-exact
port of reference ComputeBilateralNCC (ACMMP.cu:398-516): the NCC patch is
taken on the rectified grid (a projectively warped patch in the original
frame) and the cost field is evaluated at rectified pixel centres then
nearest-mapped back to original pixels.  Quality is gated on the synthetic
goldens (tests/test_rectify.py, tests/test_rect_ncc.py).

Conventions match core/geometry.py: ``X_cam = R @ (X_world - C)``; plane
``n . X_cam + w = 0``; pinhole depth == z.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.core.camera import Camera, Cameras, camera_center
from acmmp_spherical_tpu.core import geometry as G

_HI = jax.lax.Precision.HIGHEST

# rectified frames are padded by (PAD_Y, PAD_X) on each side so the kernel's
# static row slices and 128-aligned dynamic x-origins never clamp
PAD_Y = 8
PAD_X = 128
# sentinel stored outside the warped source's valid region; sampled taps
# compare against SENTINEL_THRESH to reject (same semantics as the
# reference's out-of-image patch taps)
SENTINEL = -1.0e4
SENTINEL_THRESH = -0.5


def rect_shape(height: int, width: int) -> tuple[int, int]:
    """Static rectified frame size for an (H, W) problem.

    Sized so the *full-resolution* (f_rect == f_ref) warped reference fits
    under any in-plane rotation -- the bounding box of a rotated rectangle is
    at most diag x diag -- plus x-slack for the source footprint's disparity
    offset, aligned to the (8, 128) kernel tile.  Keeping f_rect == f_ref
    matters for quality: a shrunken rect grid evaluates the NCC patch on a
    coarser image and costs ~2x depth accuracy at the bench operating point.
    """
    diag = int(math.ceil((height * height + width * width) ** 0.5))
    hr = -(-(diag + 16) // 8) * 8
    wr = -(-(diag + 160) // 128) * 128
    return hr, wr


def rect_comp_shape(ref_cam: Camera, src_cams: Cameras,
                    rect_hw: tuple[int, int]) -> tuple[int, int]:
    """Static COMPUTE-grid size: the warped-reference bounding box.

    The storage frame (``rect_shape``) must hold the union of both warped
    footprints, but costs are only ever read back at rect pixels the
    *reference* footprint claims -- ~40% of the union frame at the bench
    operating point.  This host-side mirror of ``build_pair_rect`` returns
    the max-over-pairs warped-ref bbox, padded for the per-pair (8, 128)-
    aligned traced offset and quantised (rows to 32, cols to 128) so near-
    identical problems share one compiled program.  Falls back to the full
    frame for any degenerate pair (host_rectifiable rejects those problems
    anyway).
    """
    hr, wr = rect_hw
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    C0 = -R0.T @ t0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]
    W0 = float(np.asarray(ref_cam.width))
    H0_ = float(np.asarray(ref_cam.height))

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    bw = bh = 0.0
    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return hr, wr
        e1 = b / bn
        e2 = np.cross(R0[2], e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:
            return hr, wr
        e2 = e2 / n2
        R_rect = np.stack([e1, e2, np.cross(e1, e2)])
        uv0 = corner_uv(R_rect @ R0.T, K0, W0, H0_)
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return hr, wr
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f):
            return hr, wr
        # ref-footprint extent in rect pixels at this pair's fitted focal
        bw = max(bw, f * (uv0[0].max() - uv0[0].min()))
        bh = max(bh, f * (uv0[1].max() - uv0[1].min()))
    # slack: 128/8-aligned offset waste + bwd-map rounding + fit margin
    wb = min(wr, -(-int(bw + 128 + 10) // 128) * 128)
    hb = min(hr, -(-int(bh + 16 + 10) // 32) * 32)
    return hb, wb


def rect_live_tile_count(ref_cam: Camera, src_cams: Cameras,
                         rect_hw: tuple[int, int],
                         comp_hw: tuple[int, int]) -> int:
    """Host-side static budget of LIVE (8, 128) compute-grid tiles per pair.

    Only rect pixels claimed by some original pixel are ever read back, and
    those all lie inside the warped-reference footprint -- a convex
    quadrilateral covering ~40-50% of the bbox compute grid at the bench
    operating point (the bbox of a *rotated* rectangle).  The compacted
    transport (build_transport_maps) gathers and computes only a static
    budget of N live tiles; this mirror rasterises the footprint quad at
    tile granularity with the same float64 math as rect_comp_shape, takes
    the max over pairs, adds a 1-tile safety ring (the device map rounds in
    f32), and quantises up so near-identical problems share one compiled
    program.  Returns a value in (0, ty*tx]; the device side orders tiles
    by live-pixel count so an overflow (which the margin makes improbable)
    only drops the emptiest boundary tiles.
    """
    hr, wr = rect_hw
    hb, wb = comp_hw
    ty, tx = hb // 8, wb // 128
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]
    W0 = float(np.asarray(ref_cam.width))
    H0_ = float(np.asarray(ref_cam.height))
    C0 = -R0.T @ t0

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    best = 0
    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return ty * tx
        e1 = b / bn
        e2 = np.cross(R0[2], e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:
            return ty * tx
        e2 = e2 / n2
        R_rect = np.stack([e1, e2, np.cross(e1, e2)])
        uv0 = corner_uv(R_rect @ R0.T, K0, W0, H0_)
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return ty * tx
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f):
            return ty * tx
        # warped-ref footprint corners in rect px, then in bbox coords
        # (the device anchors the bbox at floor((min - 2) / 8 or 128))
        cx = margin - f * u.min()
        cy = margin - f * v.min()
        qx = f * uv0[0] + cx
        qy = f * uv0[1] + cy
        ox = np.clip(np.floor((qx.min() - 2.0) / 128.0) * 128.0, 0, wr - wb)
        oy = np.clip(np.floor((qy.min() - 2.0) / 8.0) * 8.0, 0, hr - hb)
        qx = qx - ox
        qy = qy - oy
        # rasterise the convex quad at tile granularity with a 1-px dilation
        # (f32 vs f64 rounding slack); count tiles any corner band intersects
        quad = np.stack([qx, qy], axis=1)
        hull = quad[[0, 1, 3, 2]]                     # corner order -> hull
        count = 0
        for ti in range(ty):
            y_lo, y_hi = ti * 8 - 1.0, ti * 8 + 9.0
            # x-extent of the quad within this row band: clip hull edges
            xs_band = []
            for k in range(4):
                (x1, y1), (x2, y2) = hull[k], hull[(k + 1) % 4]
                if max(y1, y2) < y_lo or min(y1, y2) > y_hi:
                    continue
                for yc in (max(y_lo, min(y1, y2)), min(y_hi, max(y1, y2))):
                    if abs(y2 - y1) > 1e-12:
                        t = np.clip((yc - y1) / (y2 - y1), 0.0, 1.0)
                        xs_band.append(x1 + t * (x2 - x1))
                    else:
                        xs_band.extend([x1, x2])
            if not xs_band:
                continue
            j0 = int(np.floor((min(xs_band) - 1.0) / 128.0))
            j1 = int(np.floor((max(xs_band) + 1.0) / 128.0))
            count += max(0, min(j1, tx - 1) - max(j0, 0) + 1)
        best = max(best, count)
    if best <= 0:
        return ty * tx
    # the band rasterisation above already dilates by 1 px on each side
    # (covering device f32-vs-host f64 rounding); a small cushion + quantise
    # to 32 so shapes dedupe across problems
    best = best + 16
    return min(ty * tx, -(-best // 32) * 32)


def rect_warp_window(ref_cam: Camera, src_cams: Cameras,
                     rect_hw: tuple[int, int],
                     *, max_wr: int = 152, max_wc: int = 1024
                     ) -> "tuple[int, int] | None":
    """Static (WR, WC) window of the Pallas warp-gather transport, or None.

    The warp-gather transport kernel (ops/pallas/ncc_rect.warp_transport)
    replaces the per-invocation XLA fwd row-gather: per (8, 128) compact
    rect tile it DMAs the original-grid table window covering the tile's
    claimant bbox and extracts each pixel in-register (measured 91 ms vs
    349 ms XLA at the bench point, scripts/probe_warp_gather.py).  The
    window must statically bound the per-tile claimant extent: claimants
    follow the backward map H0^-1, so the extent is the rect->orig Jacobian
    applied to the (8, 128) tile plus rounding/collision slack.  This mirror
    evaluates the Jacobian by finite differences at the warped-ref footprint
    corners of every pair (same float64 math as rect_comp_shape) and returns
    the max, quantised (rows to 8, cols to 128).  Returns None when the
    extent exceeds ``max_wr``/``max_wc`` (adverse geometry -- the caller
    falls back to the XLA gather transport).
    """
    hr, wr = rect_hw
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    C0 = -R0.T @ t0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]
    W0 = float(np.asarray(ref_cam.width))
    H0_ = float(np.asarray(ref_cam.height))

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    best_y = best_x = 0.0
    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return None
        e1 = b / bn
        e2 = np.cross(R0[2], e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:
            return None
        e2 = e2 / n2
        R_rect = np.stack([e1, e2, np.cross(e1, e2)])
        R_rr = R_rect @ R0.T
        uv0 = corner_uv(R_rr, K0, W0, H0_)
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return None
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f):
            return None
        cx = margin - f * u.min()
        cy = margin - f * v.min()
        Km = np.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]])
        H0inv = K0 @ R_rr.T @ np.linalg.inv(Km)

        def orig(px, py):
            q = H0inv @ np.array([px, py, 1.0])
            return q[:2] / q[2]

        # footprint corners in rect px; finite-difference Jacobian there
        for qx, qy in zip(f * uv0[0] + cx, f * uv0[1] + cy):
            o0 = orig(qx, qy)
            jx = orig(qx + 1.0, qy) - o0          # d(orig)/d(rect x)
            jy = orig(qx, qy + 1.0) - o0          # d(orig)/d(rect y)
            best_x = max(best_x, 8.0 * abs(jy[0]) + 128.0 * abs(jx[0]))
            best_y = max(best_y, 8.0 * abs(jy[1]) + 128.0 * abs(jx[1]))
    # slack: bwd-map rounding (1), collision displacement (2), map min
    # quantisation (1), margin for f32-vs-f64 drift (2)
    WR = -(-int(np.ceil(best_y + 6.0)) // 8) * 8
    WC = -(-int(np.ceil(best_x + 8.0)) // 128) * 128
    if WR > max_wr or WC > max_wc:
        return None
    return max(8, WR), max(128, WC)


def warp_windows(warp_hw: tuple[int, int]):
    """(full, parity) static warp-gather windows: parity tables are packed
    half-grids (x -> x // 2), so the column extent halves."""
    WR, WC = warp_hw
    WCp = max(128, -(-(WC // 2 + 4) // 128) * 128)
    return (WR, WC), (WR, WCp)


def rect_inv_attrib_ok(ref_cam: Camera, src_cams: Cameras,
                       rect_hw: tuple[int, int], *,
                       max_lip: float = 2.0) -> bool:
    """Host gate for the scatter-free inverse transport attribution.

    The fwd transport maps can be built WITHOUT the per-pass H*W scatters
    (an XLA scatter row costs ~14x a gather row, and the three scatter
    sweeps are most of the ~400 ms context build at the bench point): for
    each compute-grid pixel c, invert the homography to ~o = H0^-1(c) and
    verify, with the EXACT f32 forward computation the backward map uses,
    which of the 3x3 integer neighbourhood of round(~o) rounds onto c.
    That neighbourhood provably contains every claimant iff the local
    Lipschitz constant of H0^-1 satisfies L * 0.5*sqrt(2) < 1.5, i.e.
    L < ~2.1; this mirror bounds L by the inf-norm row sums of the
    finite-difference Jacobian at the warped-footprint corners (same f64
    math as rect_warp_window) with margin.  Returns False -> the caller
    keeps the scatter path.
    """
    hr, wr = rect_hw
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    C0 = -R0.T @ t0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]
    W0 = float(np.asarray(ref_cam.width))
    H0_ = float(np.asarray(ref_cam.height))

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return False
        e1 = b / bn
        e2 = np.cross(R0[2], e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:
            return False
        e2 = e2 / n2
        R_rect = np.stack([e1, e2, np.cross(e1, e2)])
        R_rr = R_rect @ R0.T
        uv0 = corner_uv(R_rr, K0, W0, H0_)
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return False
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f):
            return False
        cx = margin - f * u.min()
        cy = margin - f * v.min()
        Km = np.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]])
        H0inv = K0 @ R_rr.T @ np.linalg.inv(Km)

        def orig(px, py):
            q = H0inv @ np.array([px, py, 1.0])
            return q[:2] / q[2]

        for qx, qy in zip(f * uv0[0] + cx, f * uv0[1] + cy):
            o0 = orig(qx, qy)
            jx = orig(qx + 1.0, qy) - o0
            jy = orig(qx, qy + 1.0) - o0
            lip = max(abs(jx[0]) + abs(jy[0]), abs(jx[1]) + abs(jy[1]))
            if lip > max_lip:
                return False
    return True


def rect_span_fits(ref_cam: Camera, src_cams: Cameras,
                   rect_hw: tuple[int, int], *, usable: int = 240,
                   min_scale: float = 1.0, max_scale: float = 1.0) -> bool:
    """Host-side: does the problem's FULL plausible disparity span fit the
    kernel's source window for every pair?

    When true, the tile window (anchored at the tile's min clipped disparity)
    covers *every* hypothesis in [dmin, dmax], so even wildly scattered plane
    fields -- fresh random initialisation -- evaluate correctly in the
    rectified kernel and the exact-path init eval (~2 s at the bench
    operating point) can be skipped.  ``usable`` = the window width minus
    the 128-aligned placement waste and tap/bilinear slack (window 384 ->
    ~240, 512 -> ~368; see rect_init_window).
    """
    hr, wr = rect_hw
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    C0 = -R0.T @ t0
    dmin, dmax = np.asarray(ref_cam.depth_range, np.float64)
    if not (dmin > 0 and dmax > dmin):
        return False
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]
    W0 = float(np.asarray(ref_cam.width))
    H0_ = float(np.asarray(ref_cam.height))

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return False
        e1 = b / bn
        e2 = np.cross(R0[2], e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:
            return False
        e2 = e2 / n2
        R_rect = np.stack([e1, e2, np.cross(e1, e2)])
        uv0 = corner_uv(R_rect @ R0.T, K0, W0, H0_)
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return False
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f):
            return False
        # callers pass their working-range widening (the pipeline's
        # depth_min/max_scale; the bench samples the raw range)
        span = f * bn * (1.0 / (min_scale * dmin)
                         - 1.0 / (max_scale * dmax)) + 4.0
        if span > usable:
            return False
    return True


def rect_init_window(ref_cam: Camera, src_cams: Cameras,
                     rect_hw: tuple[int, int], *, min_scale: float = 1.0,
                     max_scale: float = 1.0) -> int:
    """Smallest static source-window width (384/512/640) whose usable span
    covers the problem's full plausible disparity range, or 0 if none does.
    Used for the kernel-evaluated init (PatchMatchParams.rect_init_win)."""
    for win in (384, 512, 640):
        if rect_span_fits(ref_cam, src_cams, rect_hw, usable=win - 144,
                          min_scale=min_scale, max_scale=max_scale):
            return win
    return 0


class PairRect(NamedTuple):
    """Per-(ref, src) rectification, batched over the source axis S."""

    R_rr: jax.Array      # (S, 3, 3) ref-cam frame -> rectified frame rotation
    K: jax.Array         # (S, 3) rectified f, cx, cy (shared by both frames)
    baseline: jax.Array  # (S,) ||C_src - C_ref|| (rect x-axis points at src)
    H0: jax.Array        # (S, 3, 3) original ref pixel -> rectified pixel
    H0inv: jax.Array     # (S, 3, 3)
    H1inv: jax.Array     # (S, 3, 3) rectified pixel -> original src pixel
    R_sr: jax.Array      # (S, 3, 3) src-cam frame -> rectified frame rotation
    scale: jax.Array     # (S,) resolution scale f_rect / f_ref (diagnostic)


def _k_mat(f, cx, cy):
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    return jnp.stack([
        jnp.stack([f, z, cx], -1),
        jnp.stack([z, f, cy], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _k_inv(K):
    """Analytic inverse of a calibration matrix [[fx,0,cx],[0,fy,cy],[0,0,1]].

    ``jnp.linalg.inv`` (f32 LU) and plain ``@`` (DEFAULT = bf16 passes on
    TPU) are both too coarse here: a 3x3 pixel homography built from bf16
    matmul products carries ~1 px of warp-coordinate error at 1500-px frames
    (measured), which decorrelates the rectified pair and flattens the NCC
    cost valley ~7x.  Everything in this module therefore uses analytic
    inverses and HIGHEST-precision matmuls.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([1.0 / fx, z, -cx / fx], -1),
        jnp.stack([z, 1.0 / fy, -cy / fy], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _mm(*ms):
    """Chained 3x3 matmul at HIGHEST precision (see _k_inv)."""
    out = ms[0]
    for m in ms[1:]:
        out = jnp.matmul(out, m, precision=_HI)
    return out


def build_pair_rect(ref_cam: Camera, src_cams: Cameras,
                    rect_hw: tuple[int, int]) -> PairRect:
    """Rectification rotations + intrinsics for every (ref, src) pair.

    Fusiello-style: new x-axis along the baseline, y chosen orthogonal to the
    reference optical axis, shared K fitted so the warped reference image fits
    the static ``rect_hw`` frame at the finest scale <= the original.
    """
    hr, wr = rect_hw
    margin = 2.0

    def per_pair(src: Camera) -> PairRect:
        C0 = camera_center(ref_cam)
        C1 = camera_center(src)
        b = C1 - C0
        bnorm = jnp.linalg.norm(b)
        e1 = b / jnp.maximum(bnorm, 1e-20)
        z0 = ref_cam.R[2]                      # ref optical axis (world)
        e2 = jnp.cross(z0, e1)
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-20)
        e3 = jnp.cross(e1, e2)
        R_rect = jnp.stack([e1, e2, e3])       # world -> rect frame
        R_rr = _mm(R_rect, ref_cam.R.T)        # ref-cam -> rect frame

        # fit K over the UNION of the ref and src footprints (both rotated
        # into the rect frame), so the warped source content -- offset along
        # -x by the pair's disparity geometry -- stays inside the frame too.
        # f = f_ref whenever the frame fits (rect_shape sizes it so), falling
        # back to a shrink only for adverse geometry (host_rectifiable gates).
        def corner_rays(cam_, R_cr):
            P = _mm(R_cr, _k_inv(cam_.K))       # pixel -> rect ray
            Wc, Hc = cam_.width, cam_.height
            cs = jnp.stack([
                jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.ones(())]),
                jnp.stack([Wc - 1.0, jnp.zeros(()), jnp.ones(())]),
                jnp.stack([jnp.zeros(()), Hc - 1.0, jnp.ones(())]),
                jnp.stack([Wc - 1.0, Hc - 1.0, jnp.ones(())]),
            ])                                   # (4, 3)
            q = jnp.matmul(cs, P.T, precision=_HI)
            qz = jnp.maximum(q[:, 2], 1e-6)
            return q[:, 0] / qz, q[:, 1] / qz

        R_sr = _mm(R_rect, src.R.T)             # src-cam -> rect frame
        P0 = _mm(R_rr, _k_inv(ref_cam.K))       # ref pixel -> rect ray
        u0, v0 = corner_rays(ref_cam, R_rr)
        u1, v1 = corner_rays(src, R_sr)
        u = jnp.concatenate([u0, u1])
        v = jnp.concatenate([v0, v1])
        f0 = ref_cam.K[0, 0]
        f = jnp.minimum(
            f0,
            jnp.minimum((wr - 1.0 - 2 * margin) / (jnp.max(u) - jnp.min(u)),
                        (hr - 1.0 - 2 * margin) / (jnp.max(v) - jnp.min(v))),
        )
        cx = margin - f * jnp.min(u)
        cy = margin - f * jnp.min(v)
        Km = _k_mat(f, cx, cy)
        Kminv = _k_inv(Km)

        # analytic inverses: (Km R K^-1)^-1 = K R^T Km^-1 (see _k_inv)
        H0 = _mm(Km, P0)
        H0inv = _mm(ref_cam.K, R_rr.T, Kminv)
        H1inv = _mm(src.K, R_sr.T, Kminv)
        return PairRect(R_rr=R_rr, K=jnp.stack([f, cx, cy]), baseline=bnorm,
                        H0=H0, H0inv=H0inv, H1inv=H1inv, R_sr=R_sr,
                        scale=f / f0)

    S = src_cams.t.shape[0]
    return jax.vmap(
        lambda i: per_pair(jax.tree.map(lambda a: a[i], src_cams))
    )(jnp.arange(S))


def disp_coeffs(pr_i: PairRect, normal: jax.Array, w: jax.Array):
    """Affine disparity coefficients of a plane field for one pair.

    ``disp(x, y) = a*(x - cx) + b*(y - cy) + c`` at rectified pixel (x, y),
    where ``x_src = x - disp`` on the same row.  Derivation: plane
    ``n.X + w = 0`` in the ref-cam frame becomes ``n_r.X_r + w = 0`` in the
    rectified frame (n_r = R_rr n); the z-depth along the rectified ray
    ``((x-cx)/f, (y-cy)/f, 1)`` is ``z = -w / (n_r . ray)`` and
    ``disp = f * B / z``.

    normal: (..., 3) ref-cam frame, w: (...,). Returns (a, b, c) each (...,).
    """
    n_r = jnp.einsum("ij,...j->...i", pr_i.R_rr, normal, precision=_HI)
    f = pr_i.K[0]
    s = -pr_i.baseline / w
    return s * n_r[..., 0], s * n_r[..., 1], s * n_r[..., 2] * f


def rect_coords(H, x, y):
    """Apply a pixel homography; returns (xr, yr, z) with z the projective
    denominator (z <= 0 means the point is behind the rotated frame)."""
    z = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xr = (H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]) / zs
    yr = (H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]) / zs
    return xr, yr, z


def warp_to_rect(
    img: jax.Array,          # (Hp, Wp) padded original image
    Hinv: jax.Array,         # (3, 3) rect pixel -> original pixel
    width, height,           # logical original size (traced)
    rect_hw: tuple[int, int],
    *,
    sentinel: bool,
    packed16: jax.Array | None = None,  # (Hp*Wp, 16) pack_bicubic table
) -> jax.Array:
    """Warp an original image into the padded rectified frame
    ``(PAD_Y + Hr + PAD_Y, PAD_X + Wr + PAD_X)``.

    ``sentinel=True`` writes SENTINEL outside the original image's footprint
    (source images: taps reject); ``sentinel=False`` edge-clamps (reference
    image: border taps clamp, like the reference's tex2D).

    Interpolation is Catmull-Rom bicubic from the 16-wide neighbourhood pack
    (ONE gather per sample; bilinear fallback when no table is given): a
    bilinear warp low-passes the frames enough to flatten the NCC cost
    valley, costing ~2x sub-pixel depth accuracy (measured; see
    ops/sampling.sample_bicubic_packed16)."""
    from acmmp_spherical_tpu.ops.sampling import (
        sample_bicubic_packed16, sample_bilinear,
    )

    hr, wr = rect_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (hr + 2 * PAD_Y, wr + 2 * PAD_X), 0) - PAD_Y
    xs = jax.lax.broadcasted_iota(jnp.float32, (hr + 2 * PAD_Y, wr + 2 * PAD_X), 1) - PAD_X
    ox, oy, z = rect_coords(Hinv, xs, ys)
    if packed16 is not None:
        val, ok = sample_bicubic_packed16(packed16, img.shape[1], ox, oy,
                                          width, height)
    else:
        val, ok = sample_bilinear(img, ox, oy, width, height, wrap_x=False)
    if sentinel:
        return jnp.where(ok & (z > 0), val, SENTINEL)
    return val


class TransportMaps(NamedTuple):
    """One set of compacted plane/cost transport maps (full grid or one
    checkerboard parity).

    The kernel's compute space is the COMPACTED live-tile list: slot ``k``
    of pair ``s`` holds the (8, 128) compute-grid tile ``tile`` whose content
    origin is ``(tile_oy[s, k], tile_ox[s, k])`` (RectContext fields).  Only
    live tiles (those claimed by some original pixel of this map's parity)
    occupy slots, so per-invocation transport gathers and kernel grid steps
    scale with the warped-ref footprint (~43% of the bbox at the bench
    operating point), not the bbox.  Per-parity maps additionally halve the
    transport: a propagation half-step only ever reads back costs at the
    active colour's pixels (the reference's half-lattice launches,
    ACMMP.cu:1327-1349).
    """

    fwd_idx: jax.Array    # (S, N*1024) int32: compact pixel -> source-table
                          # row (original flat idx, or packed half-grid idx
                          # y*(W//2) + x//2 for a parity map)
    fwd_valid: jax.Array  # (S, N*8, 128) float32 0/1
    bwd_cidx: jax.Array   # (S, M) int32: table row -> compact flat idx
                          # (slot*1024 + within-tile); M = H*W or H*W//2
    bwd_x: jax.Array      # (S, M) int32 claimed rect pixel, bbox coords
    bwd_y: jax.Array      # (S, M) int32
    bwd_valid: jax.Array  # (S, H, W) or (S, H, W//2) bool
    # warp-gather transport tables (present when build_rect_context was
    # given a static warp window -- ops/pallas/ncc_rect.warp_transport):
    # per-tile claimant-bbox origins in TABLE-GRID coords + packed in-window
    # rel coords (rel_y * 4096 + rel_x).  Claimants outside the static
    # window were cleared from fwd_valid at build time (degrade-not-corrupt,
    # same semantics as a live_n overflow) -- improbable under the
    # rect_warp_window host-mirror margin.
    warp_rel: "jax.Array | None" = None  # (S, N*8, 128) int32
    warp_oy: "jax.Array | None" = None   # (S, N) int32
    warp_ox: "jax.Array | None" = None   # (S, N) int32
    warp_nry: "jax.Array | None" = None  # (S, N) int32 max rel_y per tile:
                                         # the kernel's row loop runs only
                                         # ceil((nry + align + 1)/8) groups,
                                         # so pairs/tiles with small row
                                         # extent (no in-plane rotation) pay
                                         # only their own extent, not the
                                         # scene-max static window


def build_transport_maps(
    bwd_x: jax.Array,       # (S, H*W) int32 claimed rect pixel x (bbox coords)
    bwd_y: jax.Array,       # (S, H*W) int32
    bwd_ok: jax.Array,      # (S, H, W) bool
    comp_hw: tuple[int, int],
    hw: tuple[int, int],
    oy: jax.Array,          # (S,) content-row offset of the bbox
    ox: jax.Array,          # (S,)
    live_n: "int | None" = None,
    parity_maps: bool = True,
    warp_hw: "tuple[int, int] | None" = None,
    attrib: "tuple[jax.Array, jax.Array] | None" = None,
):
    """Compacted transport maps (full + per-parity) from the backward map.

    Returns ``(maps, tile_oy, tile_ox)`` with ``maps`` a tuple of 1 or 3
    :class:`TransportMaps` (full[, parity0, parity1]) sharing one live-tile
    ordering, and ``tile_oy``/``tile_ox`` (S, N) int32 content-coordinate
    tile origins for the kernel's window placement (SMEM tables).

    ``live_n`` is the static slot budget N (rect_live_tile_count host
    mirror); None keeps every tile (identity compaction).  Tiles are ordered
    by live-pixel count, so an overflow beyond N (improbable under the
    mirror's margin) drops only the emptiest boundary tiles -- their pixels
    read back as invalid (cost_max) rather than corrupting neighbours.

    ``attrib``: optional per-parity content-grid claimant attribution
    (two (S, hb, wb) int32 arrays of original-flat-index + 1, 0 = no
    claimant; built scatter-free in build_rect_context when the host gate
    rect_inv_attrib_ok holds).  When given, the fwd maps come from cheap
    tile-granular gathers of these grids instead of the three per-pass
    H*W-row scatter sweeps; tile ordering uses unique-live-PIXEL counts
    (the documented metric) rather than claim counts -- both order the
    budget drop-off by emptiness.
    """
    from acmmp_spherical_tpu.ops.sampling import checkerboard_pack

    hb, wb = comp_hw
    H, W = hw
    ty, tx = hb // 8, wb // 128
    T = ty * tx
    N = T if live_n is None else min(live_n, T)
    S = bwd_x.shape[0]
    okf = bwd_ok.reshape(S, -1)
    tile_of = (bwd_y // 8) * tx + bwd_x // 128

    if N == T:
        tile_idx = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (S, 1))
        slot = jnp.where(okf, tile_of, 0)
        okc = okf
    else:
        if attrib is not None:
            live_px = (attrib[0] > 0) | (attrib[1] > 0)
            counts = live_px.reshape(S, ty, 8, tx, 128).sum(
                axis=(2, 4), dtype=jnp.int32).reshape(S, T)
        else:
            tgt = jnp.where(okf, tile_of, T)
            counts = jax.vmap(
                lambda t: jnp.zeros(T + 1, jnp.int32).at[t].add(1))(tgt)[:, :T]
        tile_idx = jnp.argsort(-counts, axis=1).astype(jnp.int32)[:, :N]
        tile_slot = jax.vmap(
            lambda o: jnp.full((T,), -1, jnp.int32).at[o].set(
                jnp.arange(N, dtype=jnp.int32)))(tile_idx)
        slot = jax.vmap(lambda ts, t: ts[t])(tile_slot, tile_of)
        okc = okf & (slot >= 0)
        slot = jnp.maximum(slot, 0)

    within = (bwd_y % 8) * 128 + bwd_x % 128
    bwd_cidx = jnp.where(okc, slot * 1024 + within, 0)

    oflat = jnp.arange(H * W, dtype=jnp.int32)

    def warp_tables(fidx, fval, Wt, win):
        """Per-tile claimant-bbox origins + packed in-window rel coords for
        the warp-gather transport; clears claimants outside the static
        window from the validity plane (returns the clipped fval)."""
        if win is None:
            return None, None, None, None, fval
        WRw, WCw = win
        big = jnp.int32(1 << 28)
        fy = fidx // Wt
        fx = fidx - fy * Wt
        ok = fval.reshape(S, -1) > 0.5
        oy_t = jnp.min(jnp.where(ok, fy, big).reshape(S, N, 1024), axis=2)
        ox_t = jnp.min(jnp.where(ok, fx, big).reshape(S, N, 1024), axis=2)
        oy_t = jnp.where(oy_t >= big, 0, oy_t).astype(jnp.int32)
        ox_t = jnp.where(ox_t >= big, 0, ox_t).astype(jnp.int32)
        rely = fy.reshape(S, N, 1024) - oy_t[..., None]
        relx = fx.reshape(S, N, 1024) - ox_t[..., None]
        inw = ok.reshape(S, N, 1024) & (rely < WRw) & (relx < WCw)
        rel = jnp.where(inw, rely * 4096 + relx, 0).astype(jnp.int32)
        nry = jnp.max(jnp.where(inw, rely, 0), axis=2).astype(jnp.int32)
        fval2 = fval * inw.reshape(S, N * 8, 128).astype(jnp.float32)
        return rel.reshape(S, N * 8, 128), oy_t, ox_t, nry, fval2

    win_full = win_par = None
    if warp_hw is not None:
        win_full, win_par = warp_windows(warp_hw)

    def tile_gather(arr):
        """Content grid (S, hb, wb) -> compact flat (S, N*1024): a
        tile-granular gather (rows = N live tiles, not pixels)."""
        t = arr.reshape(S, ty, 8, tx, 128).transpose(0, 1, 3, 2, 4)
        t = t.reshape(S, T, 8 * 128)
        sel = jax.vmap(lambda a, i: a[i])(t, tile_idx)
        return sel.reshape(S, N * 1024)

    if parity_maps and H % 2 == 0 and W % 2 == 0:
        # per-parity rescatter: each checkerboard colour scatters its OWN
        # pixels, so a cross-colour collision (two original pixels of
        # opposite colour rounding to one rect pixel) resolves to the active
        # colour's own plane in that colour's map.  Deriving the parity maps
        # from the full map's last-writer attribution instead permanently
        # froze the losing colour's pixel at cost_max wherever the warp is
        # locally contracting (round-3 advisor finding).  One fused scatter
        # per parity (value = packed half-grid idx + 1); the full map is
        # then derived from the two parity scatters with ZERO extra
        # scatters, so the total per-pass scatter count is unchanged.
        # With ``attrib`` the scatters disappear entirely: each colour's
        # content-grid attribution is tile-gathered into the compact layout
        # and converted to the packed half-grid index in place.
        if attrib is not None:
            def to_packed(q1):
                q = jnp.maximum(q1 - 1, 0)
                fy = q // W
                fx = q - fy * W
                return jnp.where(q1 > 0, fy * (W // 2) + fx // 2 + 1, 0)

            pm = [to_packed(tile_gather(attrib[p])) for p in (0, 1)]
        else:
            yy = oflat // W
            xx = oflat - yy * W
            par = (yy + xx) % 2
            pidx1 = yy * (W // 2) + xx // 2 + 1  # packed idx + 1 (0 = empty)

            def fwd_parity(cidx, ok, p):
                t = jnp.where(ok & (par == p), cidx, N * 1024)
                return jnp.zeros(N * 1024 + 1, jnp.int32).at[t].set(pidx1)[:-1]

            pm = [jax.vmap(lambda c, o: fwd_parity(c, o, p))(bwd_cidx, okc)
                  for p in (0, 1)]

        def unpack_orig(packed1, p):
            # packed half-grid idx -> original flat idx (row-preserving pack:
            # x = 2*(idx % (W//2)) + (p + y) % 2, sampling.checkerboard_pack)
            q = jnp.maximum(packed1 - 1, 0)
            fy = q // (W // 2)
            fx = 2 * (q - fy * (W // 2)) + (p + fy) % 2
            return fy * W + fx

        full_val = (pm[0] > 0) | (pm[1] > 0)
        full_idx = jnp.where(pm[1] > 0, unpack_orig(pm[1], 1),
                             jnp.where(pm[0] > 0, unpack_orig(pm[0], 0), 0))
        fval_full = full_val.astype(jnp.float32).reshape(S, N * 8, 128)
        wrel, woy, wox, wnry, fval_full = warp_tables(full_idx, fval_full, W,
                                                      win_full)
        maps = [TransportMaps(
            fwd_idx=full_idx, fwd_valid=fval_full,
            bwd_cidx=bwd_cidx, bwd_x=bwd_x, bwd_y=bwd_y,
            bwd_valid=okc.reshape(S, H, W),
            warp_rel=wrel, warp_oy=woy, warp_ox=wox, warp_nry=wnry)]

        def packf(a):
            return checkerboard_pack(a.reshape(S, H, W), p).reshape(S, -1)

        for p in (0, 1):
            fidx_p = jnp.maximum(pm[p] - 1, 0)
            fval_p = (pm[p] > 0).astype(jnp.float32).reshape(S, N * 8, 128)
            wrel, woy, wox, wnry, fval_p = warp_tables(fidx_p, fval_p,
                                                       W // 2, win_par)
            maps.append(TransportMaps(
                fwd_idx=fidx_p, fwd_valid=fval_p,
                bwd_cidx=packf(bwd_cidx), bwd_x=packf(bwd_x),
                bwd_y=packf(bwd_y),
                bwd_valid=checkerboard_pack(
                    okc.reshape(S, H, W), p),
                warp_rel=wrel, warp_oy=woy, warp_ox=wox, warp_nry=wnry))
    else:
        if attrib is not None:
            afull = jnp.where(attrib[1] > 0, attrib[1], attrib[0])
            fc = tile_gather(afull)
            fwd_idx = jnp.maximum(fc - 1, 0)
            fwd_val = (fc > 0).astype(jnp.float32)
        else:
            def fwd(cidx, ok):
                t = jnp.where(ok, cidx, N * 1024)
                fidx = jnp.zeros(N * 1024 + 1, jnp.int32).at[t].set(oflat)[:-1]
                fval = jnp.zeros(N * 1024 + 1, jnp.float32).at[t].set(1.0)[:-1]
                return fidx, fval

            fwd_idx, fwd_val = jax.vmap(fwd)(bwd_cidx, okc)
        fwd_val = fwd_val.reshape(S, N * 8, 128)
        wrel, woy, wox, wnry, fwd_val = warp_tables(fwd_idx, fwd_val, W,
                                                    win_full)
        maps = [TransportMaps(
            fwd_idx=fwd_idx, fwd_valid=fwd_val,
            bwd_cidx=bwd_cidx, bwd_x=bwd_x, bwd_y=bwd_y,
            bwd_valid=okc.reshape(S, H, W),
            warp_rel=wrel, warp_oy=woy, warp_ox=wox, warp_nry=wnry)]

    ti = tile_idx // tx
    tj = tile_idx - ti * tx
    tile_oy = oy[:, None].astype(jnp.int32) + 8 * ti
    tile_ox = ox[:, None].astype(jnp.int32) + 128 * tj
    return tuple(maps), tile_oy, tile_ox


class RectContext(NamedTuple):
    """Per-pass rectified working set for the fast rectified NCC path."""

    pr: PairRect
    rect_ref: jax.Array   # (S, Hr+2*PAD_Y, Wr+2*PAD_X) clamp-warped reference
    rect_src: jax.Array   # (S, ..., ...) sentinel-warped sources
    maps: "tuple[TransportMaps, ...]"
                          # compacted transport maps: (full,) or
                          # (full, parity0, parity1); built ONCE per pass so
                          # every kernel invocation transports plane
                          # parameters with pure GATHERS (an XLA scatter row
                          # costs ~14x a gather row on v5e, measured)
    tile_oy: jax.Array    # (S, N) int32 live-tile content-row origins
    tile_ox: jax.Array    # (S, N) int32 live-tile content-col origins
    srow: jax.Array       # (S, 128): [0]=disp_lo, [1]=disp_hi (window guard),
                          # [2]=oy, [3]=ox ((8,128)-aligned compute-grid
                          # offset into the storage frame), [4]=orig px per
                          # rect px (geom-error scale, f_ref / f_rect)
    rect_sdisp: "jax.Array | None" = None
                          # (S, Hp, Wp) per-pair warped source depth maps
                          # stored as the IMPLIED RECT DISPARITY f*B/z_rect
                          # (SENTINEL where no/invalid source depth) for the
                          # fused geometric-consistency term: in rectified
                          # frames the reference's forward-backward
                          # reprojection error (ACMMP.cu:646-671) is exactly
                          # the 1D disparity mismatch |disp_cand - disp_src|


def build_rect_context(
    ref_image: jax.Array,    # (H, W)
    src_images: jax.Array,   # (S, Hp, Wp)
    ref_cam: Camera,
    src_cams: Cameras,
    depth_range,             # (dmin, dmax) traced scalars
    src_packed: jax.Array | None = None,  # unused (kept for call parity;
                                          # warps use their own 16-wide pack)
    comp_hw: tuple[int, int] | None = None,  # static compute-grid size
                                             # (rect_comp_shape); None = full
    src_depths: jax.Array | None = None,  # (S, Hp, Wp): also build rect_sdisp
                                          # for geometric-consistency passes
    live_n: "int | None" = None,          # static live-tile budget
                                          # (rect_live_tile_count); None = all
    parity_maps: bool = True,             # also build per-parity maps
    warp_hw: "tuple[int, int] | None" = None,  # static warp-gather window
                                          # (rect_warp_window); None = the
                                          # transport stays an XLA row-gather
    inv_attrib: bool = False,             # static: scatter-free fwd maps via
                                          # inverse-check attribution (host
                                          # gate rect_inv_attrib_ok)
    reuse: "RectContext | None" = None,   # a context built for ANOTHER PASS
                                          # of the same (image, scale): only
                                          # rect_sdisp depends on src_depths,
                                          # so everything else is adopted
) -> RectContext:
    """Build the per-pass rectified working set (all XLA; one per pass).

    ``reuse``: of the whole working set only ``rect_sdisp`` (the warped
    source disparity planes of geometric passes) depends on the previous
    pass's depth maps; the warped frames, transport maps and window tables
    are pure functions of (images, cameras, depth range), which are
    identical across the photometric and 2 geometric passes of one
    (image, scale) (reference re-uploads its textures per pass,
    ACMMP.cpp:681-845 -- here they stay device-resident instead and only
    the disparity warps rebuild)."""
    from acmmp_spherical_tpu.ops.sampling import grid_coords, pack_bicubic

    H, W = ref_image.shape
    hr, wr = rect_shape(H, W)
    if reuse is not None:
        rect_sdisp = None
        if src_depths is not None:
            rect_sdisp = build_rect_sdisp(reuse.pr, src_depths, src_cams,
                                          (hr, wr), warp_hw)
        return reuse._replace(rect_sdisp=rect_sdisp)
    hb, wb = comp_hw if comp_hw is not None else (hr, wr)
    pr = build_pair_rect(ref_cam, src_cams, (hr, wr))

    # per-pair (8, 128)-aligned offset of the compute grid: anchor it at the
    # warped reference footprint's top-left corner (the only rect pixels any
    # cost is read back from live inside that footprint)
    corners = jnp.asarray([[0.0, 0.0], [W - 1.0, 0.0],
                           [0.0, H - 1.0], [W - 1.0, H - 1.0]], jnp.float32)

    def offsets(H0):
        xr, yr, z = rect_coords(H0, corners[:, 0], corners[:, 1])
        ox = jnp.floor((jnp.min(xr) - 2.0) / 128.0) * 128.0
        oy = jnp.floor((jnp.min(yr) - 2.0) / 8.0) * 8.0
        ox = jnp.clip(ox, 0.0, float(wr - wb))
        oy = jnp.clip(oy, 0.0, float(hr - hb))
        return oy, ox

    off_y, off_x = jax.vmap(offsets)(pr.H0)

    ref_p16 = pack_bicubic(ref_image, ref_cam.width, ref_cam.height)
    rect_ref = jax.vmap(
        lambda H0inv: warp_to_rect(ref_image, H0inv, ref_cam.width,
                                   ref_cam.height, (hr, wr), sentinel=False,
                                   packed16=ref_p16)
    )(pr.H0inv)

    if warp_hw is not None:
        # kernelised sentinel-variant source warp: the XLA packed-row warp
        # was the single largest context-build stage (554 of 862 ms at the
        # bench point; PERF.md round 4 / scripts/profile_ctx_build.py)
        from acmmp_spherical_tpu.ops.pallas.warp_image import warp_src_frames

        rect_src = warp_src_frames(
            src_images, pr.H1inv, src_cams.width, src_cams.height,
            (hr, wr), warp_hw,
            interpret=jax.default_backend() != "tpu")
    else:
        src_p16 = jax.vmap(
            lambda img, wd, ht: pack_bicubic(img, wd, ht)
        )(src_images, src_cams.width, src_cams.height)
        rect_src = jax.vmap(
            lambda img, pk, H1inv, wd, ht: warp_to_rect(
                img, H1inv, wd, ht, (hr, wr), sentinel=True, packed16=pk)
        )(src_images, src_p16, pr.H1inv, src_cams.width, src_cams.height)

    # backward map: original pixel -> nearest rect pixel (bbox coords), then
    # the compacted transport maps (full + per-parity) -- the only scatters
    # of the pass live inside build_transport_maps, amortised
    xs_o, ys_o = grid_coords(H, W)

    def bwd(H0, oy, ox):
        xr, yr, z = rect_coords(H0, xs_o, ys_o)
        xb = jnp.round(xr) - ox            # compute-grid (bbox) coords
        yb = jnp.round(yr) - oy
        ok = (z > 0) & (xb >= 0) & (xb < wb) & (yb >= 0) & (yb < hb)
        xbi = jnp.clip(xb, 0, wb - 1).astype(jnp.int32)
        ybi = jnp.clip(yb, 0, hb - 1).astype(jnp.int32)
        return xbi.reshape(-1), ybi.reshape(-1), ok

    bwd_x, bwd_y, bwd_ok = jax.vmap(bwd)(pr.H0, off_y, off_x)

    attrib = None
    if inv_attrib:
        # scatter-free fwd attribution (host-gated by rect_inv_attrib_ok):
        # for each compute-grid pixel, invert the homography and verify --
        # with the EXACT f32 forward computation bwd() uses -- which of the
        # 3x3 neighbourhood of round(H0^-1(c)) rounds onto it.  Winner on a
        # collision: the largest original flat index of that parity (the
        # scatter path's last-writer order is backend-unspecified; both are
        # valid serializations of the reference's racy write order,
        # SURVEY.md 5.2).  Pure VPU math -- replaces the three per-pass
        # H*W-row scatter sweeps.
        def attrib_pair(H0, H0inv, oy, ox):
            ybc = jax.lax.broadcasted_iota(jnp.float32, (hb, wb), 0)
            xbc = jax.lax.broadcasted_iota(jnp.float32, (hb, wb), 1)
            xo_f, yo_f, _ = rect_coords(H0inv, xbc + ox, ybc + oy)
            xo0 = jnp.round(xo_f).astype(jnp.int32)
            yo0 = jnp.round(yo_f).astype(jnp.int32)
            win = [jnp.zeros((hb, wb), jnp.int32) for _ in range(2)]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    xo = xo0 + dx
                    yo = yo0 + dy
                    inb = (xo >= 0) & (xo < W) & (yo >= 0) & (yo < H)
                    xr, yr, z = rect_coords(H0, xo.astype(jnp.float32),
                                            yo.astype(jnp.float32))
                    claim = (inb & (z > 0)
                             & (jnp.round(xr) - ox == xbc)
                             & (jnp.round(yr) - oy == ybc))
                    oflat1 = yo * W + xo + 1
                    par = (yo + xo) % 2
                    for p in (0, 1):
                        cand = jnp.where(claim & (par == p), oflat1, 0)
                        win[p] = jnp.maximum(win[p], cand)
            return win[0], win[1]

        a0, a1 = jax.vmap(attrib_pair)(pr.H0, pr.H0inv, off_y, off_x)
        attrib = (a0, a1)

    maps, tile_oy, tile_ox = build_transport_maps(
        bwd_x, bwd_y, bwd_ok, (hb, wb), (H, W), off_y, off_x,
        live_n=live_n, parity_maps=parity_maps, warp_hw=warp_hw,
        attrib=attrib)

    dmin, dmax = depth_range[0], depth_range[1]
    fB = pr.K[:, 0] * pr.baseline
    srow = jnp.zeros((pr.K.shape[0], 128), jnp.float32)
    # exact plausible disparity range (no padding): the kernel clips window
    # anchors into it, so a wild plane parameter can never pin a tile's
    # window outside the range where real hypotheses live, and a 512-wide
    # window covers the whole range whenever fB*(1/dmin - 1/dmax) fits
    srow = srow.at[:, 0].set(fB / jnp.maximum(dmax, 1e-6) - 2.0)
    srow = srow.at[:, 1].set(fB / jnp.maximum(dmin, 1e-6) + 2.0)
    srow = srow.at[:, 2].set(off_y)
    srow = srow.at[:, 3].set(off_x)
    srow = srow.at[:, 4].set(1.0 / jnp.maximum(pr.scale, 1e-6))

    rect_sdisp = None
    if src_depths is not None:
        rect_sdisp = build_rect_sdisp(pr, src_depths, src_cams, (hr, wr),
                                      warp_hw)

    return RectContext(pr=pr, rect_ref=rect_ref, rect_src=rect_src,
                       maps=maps, tile_oy=tile_oy, tile_ox=tile_ox,
                       srow=srow, rect_sdisp=rect_sdisp)


def build_rect_sdisp(pr: PairRect, src_depths: jax.Array, src_cams,
                     rect_hw: tuple[int, int],
                     warp_hw: "tuple[int, int] | None"):
    """Warp each source depth map into its pair's rect frame as the implied
    rect disparity f*B/z_rect (SENTINEL where no/invalid source depth) for
    the fused geometric-consistency term -- the only piece of the rect
    working set that changes between the passes of one (image, scale)."""
    hr, wr = rect_hw
    if warp_hw is not None:
        from acmmp_spherical_tpu.ops.pallas.warp_image import (
            warp_src_disparities,
        )

        return warp_src_disparities(
            src_depths, pr.H1inv, pr.R_sr, src_cams.K,
            pr.K[:, 0] * pr.baseline, src_cams.width, src_cams.height,
            (hr, wr), warp_hw,
            interpret=jax.default_backend() != "tpu")
    # XLA fallback: trunc-nearest lookup like the reference's depth reads
    # (ACMMP.cu:657)
    ys_r = jax.lax.broadcasted_iota(
        jnp.float32, (hr + 2 * PAD_Y, wr + 2 * PAD_X), 0) - PAD_Y
    xs_r = jax.lax.broadcasted_iota(
        jnp.float32, (hr + 2 * PAD_Y, wr + 2 * PAD_X), 1) - PAD_X

    def warp_disp(zmap, H1inv, R_sr, K_s, fB, wd, ht):
        px, py, z = rect_coords(H1inv, xs_r, ys_r)
        xi = px.astype(jnp.int32)          # C truncation
        yi = py.astype(jnp.int32)
        ok = (z > 0) & (px >= 0) & (xi < wd.astype(jnp.int32)) \
            & (py >= 0) & (yi < ht.astype(jnp.int32))
        wi = zmap.shape[1]
        zs = zmap.reshape(-1)[jnp.clip(yi, 0, zmap.shape[0] - 1) * wi
                              + jnp.clip(xi, 0, wi - 1)]
        # z in the rect frame: third row of R_sr applied to the src-cam
        # point  z * K_s^-1 (px, py, 1)
        u = (px.astype(jnp.float32) - K_s[0, 2]) / K_s[0, 0]
        v = (py.astype(jnp.float32) - K_s[1, 2]) / K_s[1, 1]
        z_rect = zs * (R_sr[2, 0] * u + R_sr[2, 1] * v + R_sr[2, 2])
        disp = fB / jnp.maximum(z_rect, 1e-6)
        return jnp.where(ok & (zs > 0) & (z_rect > 0), disp, SENTINEL)

    fB_all = pr.K[:, 0] * pr.baseline
    return jax.vmap(warp_disp)(
        src_depths, pr.H1inv, pr.R_sr, src_cams.K, fB_all,
        src_cams.width, src_cams.height)


def host_rectifiable(ref_cam: Camera, src_cams: Cameras,
                     rect_hw: tuple[int, int],
                     *, min_scale: float = 0.55) -> bool:
    """Host-side pure-numpy gate: True when every pair of this problem
    rectifies well enough for the static frame sizes of the rectified kernel.

    Rejects: near-zero baselines, near-forward motion (baseline parallel to
    the optical axis degenerates the rect basis), and epipoles in/near the
    image (the rect frame blows up, so the fitted focal -- ``scale`` --
    collapses).  In-plane rotation/shear of the warp is fine: the kernel
    operates wholly in the rect frame, where rows are epipolar lines by
    construction.  Mirrors ``build_pair_rect`` in numpy so the per-problem
    gate never builds device programs.
    """
    hr, wr = rect_hw
    margin = 2.0
    R0 = np.asarray(ref_cam.R, np.float64)
    t0 = np.asarray(ref_cam.t, np.float64)
    K0 = np.asarray(ref_cam.K, np.float64)
    C0 = -R0.T @ t0
    Rs = np.asarray(src_cams.R, np.float64)
    ts = np.asarray(src_cams.t, np.float64)
    Ks = np.asarray(src_cams.K, np.float64)
    whs = np.asarray(src_cams.wh, np.float64)
    f0 = K0[0, 0]

    def corner_uv(R_cr, K, W_, H_):
        corners = np.array([[0.0, 0.0, 1.0], [W_ - 1.0, 0.0, 1.0],
                            [0.0, H_ - 1.0, 1.0], [W_ - 1.0, H_ - 1.0, 1.0]])
        q = corners @ (R_cr @ np.linalg.inv(K)).T
        if np.any(q[:, 2] <= 1e-6):  # a corner behind the rotated frame
            return None
        return q[:, 0] / q[:, 2], q[:, 1] / q[:, 2]

    for s in range(Rs.shape[0]):
        C1 = -Rs[s].T @ ts[s]
        b = C1 - C0
        bn = np.linalg.norm(b)
        if bn < 1e-9:
            return False
        e1 = b / bn
        z0 = R0[2]
        e2 = np.cross(z0, e1)
        n2 = np.linalg.norm(e2)
        if n2 < 1e-3:  # near-forward motion: rect basis degenerates
            return False
        e2 = e2 / n2
        e3 = np.cross(e1, e2)
        R_rect = np.stack([e1, e2, e3])
        uv0 = corner_uv(R_rect @ R0.T, K0,
                        float(np.asarray(ref_cam.width)),
                        float(np.asarray(ref_cam.height)))
        uv1 = corner_uv(R_rect @ Rs[s].T, Ks[s], whs[s, 0], whs[s, 1])
        if uv0 is None or uv1 is None:
            return False
        u = np.concatenate([uv0[0], uv1[0]])
        v = np.concatenate([uv0[1], uv1[1]])
        du = max(u.max() - u.min(), 1e-12)
        dv = max(v.max() - v.min(), 1e-12)
        f = min(f0, (wr - 1.0 - 2 * margin) / du, (hr - 1.0 - 2 * margin) / dv)
        if not np.isfinite(f) or f / f0 < min_scale:
            return False
    return True
