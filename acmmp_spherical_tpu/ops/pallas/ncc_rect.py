"""Epipolar-rectified fused bilateral-NCC kernel (pinhole).

The transformative property of rectified pairs (ops/rectify.py): for every
plane hypothesis, the source sample of rectified-ref pixel ``(x, y)`` lies at
``(x - disp, y)`` with ``disp`` affine in (x, y) -- same row.  Per (8, 128)
output tile the source rows needed by tap ``(dx, dy)`` are the *static* slice
``[8i + dy, 8i + 8 + dy)``, so the round-1 kernel's row one-hot (the dominant
cost, PERF.md) disappears entirely: sampling is static row slices plus lane
gathers in x, with bilinear interpolation in x only (rows are integral by
construction).

One invocation evaluates a whole *batch* of candidate plane fields (the 8+1
propagation fields or the 5 refinement fields of a half-step) against every
source view.  The candidate axis lives INSIDE the grid step (grid (S, ty, tx),
candidates unrolled in-kernel): the reference-side bilateral weights and sums
depend only on the reference window, so they are computed once per tile and
shared by all candidates -- the dominant per-tap work (exp, ref accumulation,
window DMA) amortises over C.  Source windows are per-candidate (each
candidate's disparity field places its own window) and double-buffered.

The plane -> rect-grid transport is a wide-row *gather* through the per-pass
forward map (rectify.RectContext.fwd_idx): an XLA gather row costs ~10 ns
regardless of width, while a scatter row costs ~14x that (measured on v5e --
a scatter-based transport was 7x slower end-to-end).  Rect pixels no
original pixel claims take D = -1e9 and reject; their cost is never read
back.

Reference equivalence notes (vs ComputeBilateralNCC, ACMMP.cu:398-516): the
patch is taken on the rectified grid (projectively warped patch, bilateral
sigmas in rectified pixels), source taps outside the warped source footprint
are rejected via sentinel values (= out-of-image taps), and the cost field is
evaluated at the rectified pixel each original pixel maps to (exact plane
attribution by construction of the scatter).  These deviations are
quality-gated on the synthetic goldens (tests/test_rect_ncc.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.ops.rectify import (
    PAD_X, PAD_Y, RectContext, SENTINEL, SENTINEL_THRESH,
)

TILE_H = 8
TILE_W = 128
WIN_H = 24        # static rows: tile 8 + dy span 10 + bilinear slack
REF_WIN_W = 384   # 128-aligned static cols covering dx span
# src window: 128-aligned dynamic x origin, placed from the tile's min
# *clipped* disparity (srow carries the exact plausible range, so a wild
# plane parameter can never pin the window outside it); ~246 px of
# disparity span after alignment waste.  The default; params.rect_win_w
# overrides per invocation (512 covers spans up to ~370 px for the
# kernel-evaluated init of wide-range scenes, rectify.rect_span_fits)
SRC_WIN_W = 384


def pack_ab(A, B):
    """Pack two small affine slopes into one f32 lane as (bf16, bf16).

    The slopes only displace taps by A*dx + B*dy with |dx|, |dy| <= patch
    radius, so bf16's 2^-8 relative error moves a tap by well under 0.05 px
    -- far below the bilinear interpolation error.  Caveat: the bound scales
    with |A|, |B| -- steeply slanted hypotheses (|A| >> 1, i.e. near-parallel
    ray/plane) see proportionally larger tap-placement error, but such
    hypotheses already produce decorrelated/rejected costs, so the ranking
    is unaffected.  Halving the transported
    coefficient width matters because the per-pass forward gather is
    per-ELEMENT cost on v5e (~2 ns/element measured; PERF.md round-2
    transport anatomy)."""
    au = jax.lax.bitcast_convert_type(
        A.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32) << 16
    bu = jax.lax.bitcast_convert_type(
        B.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(au | bu, jnp.float32)


def _unpack_ab(ab):
    u = jax.lax.bitcast_convert_type(ab, jnp.uint32)
    A = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    B = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return A, B


def _pack_ab_const(a: float, b: float) -> float:
    """Host-side pack_ab for compile-time scalar constants.

    Mosaic's ``tpu.bitcast`` only accepts vectors, so a traced scalar
    ``pack_ab`` inside the kernel fails hardware verification (it passes
    interpret mode -- the round-4 BENCH crash).  Constants are packed with
    numpy at trace time instead."""
    au = np.asarray(a, dtype=ml_dtypes.bfloat16).view(np.uint16)
    bu = np.asarray(b, dtype=ml_dtypes.bfloat16).view(np.uint16)
    word = (au.astype(np.uint32) << np.uint32(16)) | bu.astype(np.uint32)
    return float(word.astype(np.uint32).view(np.float32))


SENT_PK_CONST = _pack_ab_const(SENTINEL, SENTINEL)


def _rect_kernel(srow_ref, toy_ref, tox_ref, ref_ref, src_ref, *rest,
                 params: PatchMatchParams, n_cand: int,
                 with_geom: bool = False):
    if with_geom:
        (sdisp_ref, d_ref, ab_ref, v_ref, out_ref, gout_ref,
         refwin, srcwin, dwin, wgt_ref, wr_ref, wrr_ref,
         sem_r, sem_s, sem_d) = rest
    else:
        (d_ref, ab_ref, v_ref, out_ref,
         refwin, srcwin, wgt_ref, wr_ref, wrr_ref, sem_r, sem_s) = rest
        sdisp_ref = gout_ref = dwin = sem_d = None
    SRC_WIN_W = params.rect_win_w or 384
    s = pl.program_id(0)
    k = pl.program_id(1)       # live-tile slot (compacted grid)
    cost_max = params.cost_max
    C = n_cand

    out_ref[:, 0] = jnp.full((C, TILE_H, TILE_W), cost_max, jnp.float32)
    if with_geom:
        gout_ref[:, 0] = jnp.full((C, TILE_H, TILE_W), params.geom_max_cost,
                                  jnp.float32)

    valid = v_ref[0] > 0.5
    tile_live = jnp.max(v_ref[0]) > 0.5

    @pl.when(tile_live)
    def _():
        # ---- shared reference window --------------------------------------
        # slot k holds the live compute-grid tile whose storage content
        # origin is (tile_oy, tile_ox) (SMEM tables; see
        # rectify.build_transport_maps)
        oy_t = toy_ref[s, k]
        ox_t = tox_ref[s, k]
        y0 = pl.multiple_of(oy_t, TILE_H)     # padded row of (.. - 8)
        xr0 = pl.multiple_of(ox_t, TILE_W)    # padded col of (.. - 128)
        cp_r = pltpu.make_async_copy(
            ref_ref.at[s, pl.ds(y0, WIN_H), pl.ds(xr0, REF_WIN_W)],
            refwin, sem_r)
        cp_r.start()

        dlo = srow_ref[0, 0, 0]
        dhi = srow_ref[0, 0, 1]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        # unpadded storage-frame rect x of this tile's lanes
        xg = ox_t.astype(jnp.float32) + lane
        wr_pad = src_ref.shape[2]

        def window_origin(D):
            # robust placement: clamp disparities into the plausible range
            # before the tile min so one wild pixel cannot pin the window away
            # (its own taps are coverage-checked individually)
            dclip = jnp.clip(D, dlo, dhi)
            lo = jnp.min(xg - dclip)
            cmin = jnp.floor((lo - 6.0) / TILE_W).astype(jnp.int32) * TILE_W
            return jnp.clip(cmin, -PAD_X, wr_pad - PAD_X - SRC_WIN_W)

        # ---- per-candidate source windows, double-buffered -----------------
        def src_copy(c, cmin, slot):
            xs0 = pl.multiple_of(cmin + PAD_X, TILE_W)
            return pltpu.make_async_copy(
                src_ref.at[s, pl.ds(y0, WIN_H), pl.ds(xs0, SRC_WIN_W)],
                srcwin.at[slot], sem_s.at[slot])

        def disp_copy(c, cmin, slot):
            xs0 = pl.multiple_of(cmin + PAD_X, TILE_W)
            return pltpu.make_async_copy(
                sdisp_ref.at[s, pl.ds(y0, WIN_H), pl.ds(xs0, SRC_WIN_W)],
                dwin.at[slot], sem_d.at[slot])

        cmins = [window_origin(d_ref[c, 0]) for c in range(C)]
        src_copy(0, cmins[0], 0).start()
        if with_geom:
            disp_copy(0, cmins[0], 0).start()

        inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
        inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)
        n_chunks = SRC_WIN_W // TILE_W
        r = params.patch_size // 2
        offs = list(range(-r, r + 1, params.radius_increment))
        n_taps = len(offs) * len(offs)
        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        # ---- reference-side pass: bilateral weights + ref products (once) --
        # Per-tap products are stashed so the candidate loop can rebuild the
        # reference moments gated by ITS OWN source-coverage mask (NCC must
        # use the same tap subset on both sides); only the exp and the
        # products are hoisted, the gated sums are cheap FMAs.
        #
        # The colour term is SEPARABLE: exp(-|a-b|*c) =
        # min(e^{-ac} e^{+bc}, e^{+ac} e^{-bc}), so ONE exp over the window
        # (plus a reciprocal) replaces the 36 per-tap exps; the spatial term
        # is a compile-time scalar per tap.  Window values are clamped to
        # +-40/c before the exp so SENTINEL (-1e4) taps stay finite: a
        # clamped sentinel still differs from any real intensity (0..255,
        # sigma_color=3 -> clamp at +-720) by >= 465, giving weight
        # ~e^-26 ~= 0, matching the old exp(-cdist*c) ~ 0 behaviour.
        cp_r.wait()
        center = refwin[8:16, 128:256]
        clamp = 40.0 / inv_2sc
        ep = jnp.exp(jnp.clip(refwin[:, :], -clamp, clamp) * inv_2sc)
        en = 1.0 / ep
        cen_p = ep[8:16, 128:256]
        cen_n = en[8:16, 128:256]
        t = 0
        for dy in offs:
            for dx in offs:
                ref_pix = refwin[8 + dy:16 + dy, 128 + dx:256 + dx]
                sdist = float((dx * dx + dy * dy) ** 0.5)
                sw = math.exp(-sdist * inv_2ss)
                tap_p = ep[8 + dy:16 + dy, 128 + dx:256 + dx]
                tap_n = en[8 + dy:16 + dy, 128 + dx:256 + dx]
                wgt = sw * jnp.minimum(tap_p * cen_n, tap_n * cen_p)
                wgt_ref[t] = wgt
                wr_ref[t] = wgt * ref_pix
                wrr_ref[t] = wgt * ref_pix * ref_pix
                t += 1

        sent = jnp.full((TILE_H, TILE_W), SENTINEL, jnp.float32)
        sent_pk = jnp.full((TILE_H, TILE_W), SENT_PK_CONST, jnp.float32)
        tap_pack = params.rect_tap_pack

        def src_sample(pk_rows, xfrac, rel):
            """Bilinear-in-x sample of an 8-row static slice; (value, ok).

            With ``params.rect_tap_pack`` (default), ``pk_rows`` carries
            BOTH bilinear neighbours bf16-packed in one f32 lane (``pack_ab``
            of the window and its lane-rolled (+1) copy, built once per
            candidate), so each tap pays ONE lane gather + ONE select per
            chunk instead of two of each -- the tap loop is the kernel's
            dominant cost (PERF.md round 4).  bf16 quantises image values by
            <= 0.5 greylevel (<= 2^-9 relative), far below sensor noise and
            the bicubic warp's resampling error; quality-gated on the
            goldens incl. hostile.  Without it, ``pk_rows`` is the
            (window, rolled-window) f32 pair -- the exact-sampling A/B
            variant.  Branchless chunk combine -- a per-chunk lax.cond
            measured SLOWER than the work it skips on v5e.
            """
            if tap_pack:
                gp = sent_pk
                for cidx in range(n_chunks):
                    i0 = jnp.clip(rel - cidx * TILE_W, 0, TILE_W - 1)
                    sel = (rel >= cidx * TILE_W) & (rel < (cidx + 1) * TILE_W)
                    vp = jnp.take_along_axis(
                        pk_rows[:, cidx * TILE_W:(cidx + 1) * TILE_W], i0,
                        axis=1, mode="promise_in_bounds")
                    gp = jnp.where(sel, vp, gp)
                g0, g1 = _unpack_ab(gp)
            else:
                w0, w1 = pk_rows
                g0 = sent
                g1 = sent
                for cidx in range(n_chunks):
                    i0 = jnp.clip(rel - cidx * TILE_W, 0, TILE_W - 1)
                    sel = (rel >= cidx * TILE_W) & (rel < (cidx + 1) * TILE_W)
                    v0 = jnp.take_along_axis(
                        w0[:, cidx * TILE_W:(cidx + 1) * TILE_W], i0,
                        axis=1, mode="promise_in_bounds")
                    v1 = jnp.take_along_axis(
                        w1[:, cidx * TILE_W:(cidx + 1) * TILE_W], i0,
                        axis=1, mode="promise_in_bounds")
                    g0 = jnp.where(sel, v0, g0)
                    g1 = jnp.where(sel, v1, g1)
            ok = ((rel >= 0) & (rel <= SRC_WIN_W - 2)
                  & (g0 > SENTINEL_THRESH) & (g1 > SENTINEL_THRESH))
            return g0 + (g1 - g0) * xfrac, ok

        # ---- candidate loop ------------------------------------------------
        for c in range(C):
            slot = c % 2
            src_copy(c, cmins[c], slot).wait()
            if with_geom:
                disp_copy(c, cmins[c], slot).wait()
            if c + 1 < C:
                src_copy(c + 1, cmins[c + 1], 1 - slot).start()
                if with_geom:
                    disp_copy(c + 1, cmins[c + 1], 1 - slot).start()

            D = d_ref[c, 0]
            A, B = _unpack_ab(ab_ref[c, 0])

            def tap_coords(dx, dy):
                xsrc = xg + dx - (D + A * dx + B * dy)
                xf = jnp.floor(xsrc)
                rel = xf.astype(jnp.int32) - cmins[c]
                return rel, xsrc - xf

            # bf16-pair pack of the window with its lane-rolled (+1) copy:
            # one per-candidate VPU pass (24 x win_w) buys one gather + one
            # select per tap-chunk instead of two of each below
            win = srcwin[slot]
            win1 = pltpu.roll(win, SRC_WIN_W - 1, 1)  # lane i <- lane i+1
            if tap_pack:
                pkwin = pack_ab(win, win1)
                rows_at = lambda dy: pkwin[8 + dy:16 + dy, :]
            else:
                rows_at = lambda dy: (win[8 + dy:16 + dy, :],
                                      win1[8 + dy:16 + dy, :])

            # centre validation (reference ACMMP.cu:418-433): the source
            # centre sample must exist and sit in front of both cameras
            rel_c, frac_c = tap_coords(0.0, 0.0)
            _, ok_c = src_sample(rows_at(0), frac_c, rel_c)
            center_ok = ok_c & (D > 0.0) & valid

            s_bw = s_r = s_rr = s_s = s_ss = s_rs = zeros
            t = 0
            for dy in offs:
                pk_rows = rows_at(dy)
                for dx in offs:
                    rel, xfrac = tap_coords(float(dx), float(dy))
                    val, ok = src_sample(pk_rows, xfrac, rel)
                    okf = ok.astype(jnp.float32)
                    w_t = okf * wgt_ref[t]
                    s_bw = s_bw + w_t
                    s_r = s_r + okf * wr_ref[t]
                    s_rr = s_rr + okf * wrr_ref[t]
                    s_s = s_s + w_t * val
                    s_ss = s_ss + w_t * val * val
                    s_rs = s_rs + okf * wr_ref[t] * val
                    t += 1

            inv_bw = 1.0 / jnp.maximum(s_bw, 1e-12)
            m_ref = s_r * inv_bw
            m_src = s_s * inv_bw
            var_ref = s_rr * inv_bw - m_ref * m_ref
            var_src = s_ss * inv_bw - m_src * m_src
            covar = s_rs * inv_bw - m_ref * m_src
            ncc = 1.0 - covar * jax.lax.rsqrt(
                jnp.maximum(var_ref * var_src, 1e-30))
            cost = jnp.clip(ncc, 0.0, cost_max)
            bad = ((s_bw < 1e-6) | (var_ref < 1e-5) | (var_src < 1e-5)
                   | ~center_ok)
            out_ref[c, 0] = jnp.where(bad, cost_max, cost)

            if with_geom:
                # fused geometric-consistency cost: in rectified frames the
                # reference's forward-backward reprojection (ACMMP.cu:646-671)
                # collapses to the 1D disparity mismatch at the centre tap --
                # |disp(candidate) - disp implied by the source's stored
                # depth| -- converted to original pixels by srow[4]
                gmax = params.geom_max_cost
                dval = sent
                for cidx in range(n_chunks):
                    i0 = jnp.clip(rel_c - cidx * TILE_W, 0, TILE_W - 1)
                    selc = ((rel_c >= cidx * TILE_W)
                            & (rel_c < (cidx + 1) * TILE_W))
                    v0 = jnp.take_along_axis(
                        dwin[slot, 8:16, cidx * TILE_W:(cidx + 1) * TILE_W],
                        i0, axis=1, mode="promise_in_bounds")
                    dval = jnp.where(selc, v0, dval)
                err = jnp.abs(D - dval) * srow_ref[0, 0, 4]
                gok = center_ok & (dval > SENTINEL_THRESH)
                gout_ref[c, 0] = jnp.where(gok, jnp.minimum(gmax, err), gmax)


def _warp_transport_kernel(oy_ref, ox_ref, nry_ref, rel_ref, v_ref, tabd_ref,
                           tabab_ref, outd_ref, outab_ref, wind, winab,
                           sem_d, sem_ab, *, C, WR, WC, Ht, Wt):
    """In-kernel windowed 2D warp gather: the plane-coefficient transport.

    Per (8, 128) compact rect tile, DMA the original-grid table window
    covering the tile's claimant bbox (precomputed per-pass origins,
    TransportMaps.warp_oy/ox) and extract each pixel's (D, AB) with a
    loop-swapped row one-hot: the (row, chunk) selection masks and lane
    indices are computed once and shared by all C candidate planes (probe:
    91 ms for C=9 vs 349 ms XLA row-gather at the bench point; a lax.cond
    row gate was 4x SLOWER -- Mosaic branch overhead -- and rejected;
    scripts/probe_warp_gather.py).  Exactness: the claimant attribution is
    the map's own (rel carries the exact scatter winner), so the outputs
    are bit-identical to the XLA row-gather path."""
    s = pl.program_id(0)
    k = pl.program_id(1)
    outd_ref[:, 0] = jnp.full((C, TILE_H, TILE_W), -1e9, jnp.float32)
    outab_ref[:, 0] = jnp.zeros((C, TILE_H, TILE_W), jnp.float32)

    @pl.when(jnp.max(v_ref[0]) > 0.5)
    def _():
        oy = oy_ref[s, k]
        ox = ox_ref[s, k]
        # align origins down; clamp so the static window stays in the table
        # (claimants are always covered: fy - y0 <= WR + 7 by construction)
        y0 = pl.multiple_of(
            jnp.clip(oy & ~7, 0, Ht - (WR + 8)), 8)
        x0 = pl.multiple_of(
            jnp.clip(ox & ~127, 0, Wt - (WC + 128)), 128)
        cpd = pltpu.make_async_copy(
            tabd_ref.at[s, :, pl.ds(y0, WR + 8), pl.ds(x0, WC + 128)],
            wind, sem_d)
        cpd.start()
        cpab = pltpu.make_async_copy(
            tabab_ref.at[s, :, pl.ds(y0, WR + 8), pl.ds(x0, WC + 128)],
            winab, sem_ab)
        cpab.start()
        rel = rel_ref[0]
        ry = (rel >> 12) + (oy - y0)
        rx = (rel & 4095) + (ox - x0)
        vmask = v_ref[0] > 0.5
        cpd.wait()
        cpab.wait()

        # fori_loop over 8-row GROUPS (static unroll within a group): a full
        # static unroll lets Mosaic hoist every row load to the top of the
        # kernel -- (WR+8) * chunks * 2C live (8, 128) tiles blew the VMEM
        # stack at WR=104 (measured: 16.5 MB scoped-vmem OOM) -- while a
        # per-ROW fori needs dynamically-offset (1, 128) broadcasts that
        # Mosaic rejects ("Invalid input layout").  Aligned dynamic 8-row
        # group loads + static sub-row slices avoid both.
        n_chunks = (WC + 128) // 128

        def body(g, carry):
            accd, accab = list(carry[0]), list(carry[1])
            r0 = pl.multiple_of(g * 8, 8)
            grpd = wind[:, pl.ds(r0, 8), :]            # (C, 8, WC+128)
            grpab = winab[:, pl.ds(r0, 8), :]
            for r in range(8):
                rsel = ry == r0 + r
                for cx in range(n_chunks):
                    lo = cx * 128
                    idx = jnp.clip(rx - lo, 0, 127)
                    msel = rsel & (rx >= lo) & (rx < lo + 128) & vmask
                    for c in range(C):
                        vd = jnp.take_along_axis(
                            jnp.broadcast_to(grpd[c, r, lo:lo + 128][None],
                                             (TILE_H, TILE_W)),
                            idx, axis=1, mode="promise_in_bounds")
                        vab = jnp.take_along_axis(
                            jnp.broadcast_to(grpab[c, r, lo:lo + 128][None],
                                             (TILE_H, TILE_W)),
                            idx, axis=1, mode="promise_in_bounds")
                        accd[c] = jnp.where(msel, vd, accd[c])
                        accab[c] = jnp.where(msel, vab, accab[c])
            return tuple(accd), tuple(accab)

        # dynamic trip count: only the 8-row groups this TILE's claimants
        # actually span (per-tile max rel_y + alignment slack) -- pairs with
        # no in-plane rotation iterate ~1/3 of the scene-max static window
        n_groups = jnp.minimum(
            (nry_ref[s, k] + (oy - y0) + 8) // 8, (WR + 8) // 8)
        accd, accab = jax.lax.fori_loop(
            0, n_groups, body,
            (tuple(jnp.full((TILE_H, TILE_W), -1e9, jnp.float32)
                   for _ in range(C)),
             tuple(jnp.zeros((TILE_H, TILE_W), jnp.float32)
                   for _ in range(C))))
        for c in range(C):
            outd_ref[c, 0] = accd[c]
            outab_ref[c, 0] = accab[c]


def warp_transport(tab_d, tab_ab, maps, warp_win, *, interpret=False):
    """Transport (S, C, H, Wt) coefficient planes onto the compacted live
    tiles -> (D (C, S, K8, 128), AB (C, S, K8, 128)); bit-identical to the
    XLA row-gather through maps.fwd_idx (invalid pixels: D=-1e9, AB=0)."""
    S, C, Ht, Wt = tab_d.shape
    WR, WC = warp_win
    # pad small tables so the clamped window DMA stays in bounds (production
    # grids are larger than the window; pads only fire on tiny scenes)
    pht = max(0, (WR + 8) - Ht)
    pwt = max(0, (WC + 128) - Wt)
    pht += (-(Ht + pht)) % 8
    pwt += (-(Wt + pwt)) % 128
    if pht or pwt:
        pad = ((0, 0), (0, 0), (0, pht), (0, pwt))
        tab_d = jnp.pad(tab_d, pad, constant_values=-1e9)
        tab_ab = jnp.pad(tab_ab, pad)
    K8 = maps.fwd_valid.shape[1]
    N = K8 // TILE_H
    kern = functools.partial(
        _warp_transport_kernel, C=C, WR=WR, WC=WC,
        Ht=Ht + pht, Wt=Wt + pwt)
    smem = lambda: pl.BlockSpec((S, N), lambda s, k: (0, 0),
                                memory_space=pltpu.SMEM)
    plane = lambda: pl.BlockSpec((1, TILE_H, TILE_W), lambda s, k: (s, k, 0))
    cout = lambda: pl.BlockSpec((C, 1, TILE_H, TILE_W),
                                lambda s, k: (0, s, k, 0))
    oshape = jax.ShapeDtypeStruct((C, S, K8, TILE_W), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(S, N),
        in_specs=[smem(), smem(), smem(), plane(), plane(),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[cout(), cout()],
        out_shape=[oshape, oshape],
        scratch_shapes=[
            pltpu.VMEM((C, WR + 8, WC + 128), jnp.float32),
            pltpu.VMEM((C, WR + 8, WC + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(maps.warp_oy, maps.warp_ox, maps.warp_nry, maps.warp_rel,
      maps.fwd_valid, tab_d, tab_ab)


@functools.partial(jax.jit,
                   static_argnames=("params", "interpret", "with_geom",
                                    "parity"))
def rect_batched_ncc(
    rect: RectContext,
    normals: jax.Array,    # (C, H, Wg, 3) candidate plane normals (ref-cam)
    ws: jax.Array,         # (C, H, Wg)
    params: PatchMatchParams,
    *,
    interpret: bool = False,
    with_geom: bool = False,  # also emit the fused geom cost -> (cv, gv)
    parity: "int | None" = None,  # None: full-grid fields (Wg = W); 0/1: the
                                  # fields are checkerboard-packed half-grids
                                  # (Wg = W//2) and only that colour's costs
                                  # are transported/backmapped -- halves the
                                  # per-invocation gather work exactly (a
                                  # half-step never reads the other colour)
):
    """Evaluate C candidate plane fields against S sources -> (C, S, H, Wg).

    XLA pre-step: per-pair affine coefficients (A, B, cterm) are computed on
    the evaluation grid (pure VPU math) and GATHERED onto each pair's
    compacted live-tile list through the per-pass forward map (exact plane
    attribution); the disparity intercept D is evaluated at the rect pixel
    itself.  XLA post-step: one wide-row gather per pair maps all C cost
    planes back.  A scatter-based transport was measured ~7x slower (an XLA
    scatter row costs ~14x a gather row on v5e); the only scatters live in
    build_rect_context, once per pass.
    """
    C, H, Wg = ws.shape
    maps = rect.maps[0 if parity is None else 1 + parity]
    S = maps.bwd_cidx.shape[0]
    cost_max = params.cost_max

    use_warp = (params.rect_warp_hw is not None
                and maps.warp_rel is not None)
    if use_warp:
        # ---- plane-major coefficients + Pallas warp-gather transport ------
        # (S, C, H, Wg) element planes -- no post-gather transpose -- then
        # the in-kernel windowed 2D gather (warp_transport): bit-identical
        # to the XLA row-gather, ~3.8x faster at the bench point (PERF.md
        # round 4)
        from acmmp_spherical_tpu.ops.rectify import warp_windows

        n_r = jnp.einsum("sij,chwj->scihw", rect.pr.R_rr, normals,
                         precision=jax.lax.Precision.HIGHEST)  # (S,C,3,H,W)
        f = rect.pr.K[:, 0][:, None, None, None]
        wply = ws[None]                           # (1, C, H, Wg)
        scale = -rect.pr.baseline[:, None, None, None] / jnp.where(
            jnp.abs(wply) < 1e-20, 1e-20, wply)
        A = scale * n_r[:, :, 0]
        B = scale * n_r[:, :, 1]
        cterm = scale * n_r[:, :, 2] * f
        cx = rect.pr.K[:, 1][:, None, None, None]
        cy = rect.pr.K[:, 2][:, None, None, None]
        off_x = rect.srow[:, 3][:, None, None, None]
        off_y = rect.srow[:, 2][:, None, None, None]
        xb = maps.bwd_x.astype(jnp.float32).reshape(S, 1, H, Wg)
        yb = maps.bwd_y.astype(jnp.float32).reshape(S, 1, H, Wg)
        D = A * (xb + off_x - cx) + B * (yb + off_y - cy) + cterm
        D = jnp.where(jnp.isfinite(D) & (jnp.abs(D) < 1e8), D, -1e9)
        win = warp_windows(params.rect_warp_hw)[0 if parity is None else 1]
        D, AB = warp_transport(D, pack_ab(A, B), maps, win,
                               interpret=interpret)
    else:
        # ---- affine coefficients on the evaluation grid, (S, M, C*2) ------
        n_r = jnp.einsum("sij,chwj->shwci", rect.pr.R_rr, normals,
                         precision=jax.lax.Precision.HIGHEST)  # (S,H,Wg,C,3)
        f = rect.pr.K[:, 0][:, None, None, None]
        wply = jnp.moveaxis(ws, 0, -1)[None]          # (1, H, Wg, C)
        scale = -rect.pr.baseline[:, None, None, None] / jnp.where(
            jnp.abs(wply) < 1e-20, 1e-20, wply)
        A = scale * n_r[..., 0]
        B = scale * n_r[..., 1]
        cterm = scale * n_r[..., 2] * f
        # D is evaluated ON THE EVALUATION GRID at each pixel's ROUNDED rect
        # coordinates (the backward map) -- identical, by the
        # fwd = exact-inverse-of-round(bwd) construction, to evaluating at
        # the claimed rect pixel's own integer coordinates, but it shrinks
        # the per-invocation forward gather from 3 to 2 floats per
        # candidate: the gather cost scales with row count AND width on v5e
        # (PERF.md), so both are levers.  A and B ride packed as a
        # (bf16, bf16) pair in one f32 lane (see pack_ab).
        cx = rect.pr.K[:, 1][:, None, None, None]     # (S, 1, 1, 1)
        cy = rect.pr.K[:, 2][:, None, None, None]
        off_x = rect.srow[:, 3][:, None, None, None]
        off_y = rect.srow[:, 2][:, None, None, None]
        xb = maps.bwd_x.astype(jnp.float32).reshape(S, H, Wg)[..., None]
        yb = maps.bwd_y.astype(jnp.float32).reshape(S, H, Wg)[..., None]
        D = A * (xb + off_x - cx) + B * (yb + off_y - cy) + cterm
        D = jnp.where(jnp.isfinite(D) & (jnp.abs(D) < 1e8), D, -1e9)
        table = jnp.stack([D, pack_ab(A, B)], -1).reshape(S, H * Wg, C * 2)

        # ---- gather onto the compacted live tiles through the fwd map -----
        K8 = maps.fwd_valid.shape[1]                  # N*8
        dab = jax.vmap(lambda t, idx: t[idx])(table, maps.fwd_idx)
        dab = dab.reshape(S, K8, 128, C, 2)
        D = dab[..., 0].transpose(3, 0, 1, 2)         # (C, S, K8, 128)
        AB = dab[..., 1].transpose(3, 0, 1, 2)
        D = jnp.where(maps.fwd_valid[None] > 0.5, D, -1e9)  # coverage-rej.

    sdisp = rect.rect_sdisp if with_geom else None
    return run_rect_kernel(rect.srow, rect.rect_ref, rect.rect_src, D, AB,
                           maps, rect.tile_oy, rect.tile_ox,
                           params, out_hw=(H, Wg), interpret=interpret,
                           rect_sdisp=sdisp)


def run_rect_kernel(srow, rect_ref, rect_src, D, AB, maps, tile_oy, tile_ox,
                    params: PatchMatchParams, *, out_hw,
                    interpret: bool = False, rect_sdisp=None):
    """pallas_call + cost back-mapping shared by the pinhole wrapper above
    and the spherical wrapper (ops/sphere_rect.py): the kernel itself only
    consumes per-pixel affine displacement fields (D f32, (A, B) bf16-packed
    via pack_ab) in the compacted live-tile layout plus the warped
    row-aligned frames, so both geometries drive the same kernel."""
    C, S, K8, _ = D.shape
    N = K8 // TILE_H
    H, W = out_hw
    with_geom = rect_sdisp is not None
    r = params.patch_size // 2
    n_taps = len(range(-r, r + 1, params.radius_increment)) ** 2
    kernel = functools.partial(_rect_kernel, params=params, n_cand=C,
                               with_geom=with_geom)
    win_w = params.rect_win_w or 384
    cdab = lambda: pl.BlockSpec((C, 1, TILE_H, TILE_W),
                                lambda s, k: (0, s, k, 0))
    smem = lambda: pl.BlockSpec((S, N), lambda s, k: (0, 0),
                                memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((1, 1, 128), lambda s, k: (s, 0, 0)),         # srow
        smem(), smem(),                                            # tile oy/ox
        pl.BlockSpec(memory_space=pl.ANY),                      # ref
        pl.BlockSpec(memory_space=pl.ANY),                      # src
    ]
    operands = [srow[:, None, :], tile_oy, tile_ox, rect_ref, rect_src]
    if with_geom:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # sdisp
        operands.append(rect_sdisp)
    in_specs += [
        cdab(), cdab(),                                            # D, AB
        pl.BlockSpec((1, TILE_H, TILE_W), lambda s, k: (s, k, 0)),
    ]
    operands += [D, AB, maps.fwd_valid]
    out_shape = jax.ShapeDtypeStruct((C, S, K8, TILE_W), jnp.float32)
    scratch = [
        pltpu.VMEM((WIN_H, REF_WIN_W), jnp.float32),
        pltpu.VMEM((2, WIN_H, win_w), jnp.float32),
    ]
    if with_geom:
        scratch.append(pltpu.VMEM((2, WIN_H, win_w), jnp.float32))  # disp win
    scratch += [
        pltpu.VMEM((n_taps, TILE_H, TILE_W), jnp.float32),  # wgt / tap
        pltpu.VMEM((n_taps, TILE_H, TILE_W), jnp.float32),  # wgt*ref / tap
        pltpu.VMEM((n_taps, TILE_H, TILE_W), jnp.float32),  # wgt*ref^2
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_geom:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    outs = pl.pallas_call(
        kernel,
        grid=(S, N),
        in_specs=in_specs,
        out_specs=[cdab(), cdab()] if with_geom else cdab(),
        out_shape=[out_shape, out_shape] if with_geom else out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # ---- map the cost planes back to the evaluation grid ------------------
    # With params.rect_backmap_pack, candidate PAIRS ride one f32 lane
    # (bf16, bf16) through the gather: the v5e gather cost is per row AND
    # per element (PERF.md), so halving the element width saves ~30 ms per
    # C=9 parity invocation at the bench point (scripts/probe_backmap.py).
    # bf16 cost quantisation (<= 2^-8 relative) is config-documented and
    # quality-gated; invalid pixels get the exact f32 fill either way.
    def backmap(plane, fill):
        if params.rect_backmap_pack and C > 1:
            Cp = (C + 1) // 2
            a = plane[0::2]                       # (Cp, S, K8, TILE_W)
            b = plane[1::2]
            if C % 2:
                b = jnp.concatenate([b, jnp.zeros_like(a[:1])], 0)
            packed = pack_ab(a, b)
            back = packed.reshape(Cp, S, K8 * TILE_W).transpose(1, 2, 0)
            picked = jax.vmap(lambda t, idx: t[idx])(back, maps.bwd_cidx)
            pa, pb = _unpack_ab(picked)           # (S, M, Cp) each
            inter = jnp.stack([pa, pb], axis=-1).reshape(S, -1, 2 * Cp)
            out = inter[..., :C].transpose(2, 0, 1).reshape(C, S, H, W)
        else:
            back = plane.reshape(C, S, K8 * TILE_W).transpose(1, 2, 0)
            picked = jax.vmap(lambda t, idx: t[idx])(back, maps.bwd_cidx)
            out = picked.transpose(2, 0, 1).reshape(C, S, H, W)
        return jnp.where(maps.bwd_valid.reshape(1, S, H, W), out, fill)

    if with_geom:
        return (backmap(outs[0], params.cost_max),
                backmap(outs[1], params.geom_max_cost))
    return backmap(outs, params.cost_max)
