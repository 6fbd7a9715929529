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
source view: grid (C, S, tiles).  Plane parameters are pre-gathered onto each
pair's rectified grid by the XLA wrapper (one wide-row gather per half-step
batch, amortised over all candidates) and turned into per-pixel affine
disparity fields (D, A, B) with ``disp(x+dx, y+dy) = D + A dx + B dy``.

Reference equivalence notes (vs ComputeBilateralNCC, ACMMP.cu:398-516): the
patch is taken on the rectified grid (projectively warped patch, bilateral
sigmas in rectified pixels), source taps outside the warped source footprint
are rejected via sentinel values (= out-of-image taps), and the cost field is
evaluated at rectified pixel centres then nearest-mapped back (<= 0.7 px).
These deviations are quality-gated on the synthetic goldens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.ops.rectify import (
    PAD_X, PAD_Y, RectContext, SENTINEL_THRESH,
)

TILE_H = 8
TILE_W = 128
WIN_H = 24        # static rows: tile 8 + dy span 10 + bilinear slack
REF_WIN_W = 384   # 128-aligned static cols covering dx span
SRC_WIN_W = 384   # disparity-dependent dynamic 128-aligned x origin


def _rect_kernel(srow_ref, ref_ref, src_ref, d_ref, a_ref, b_ref, v_ref,
                 out_ref, refwin, srcwin, sem_r, sem_s,
                 *, params: PatchMatchParams):
    i = pl.program_id(2)
    j = pl.program_id(3)
    s = pl.program_id(1)
    cost_max = params.cost_max

    out_ref[0, 0] = jnp.full((TILE_H, TILE_W), cost_max, jnp.float32)

    valid = v_ref[0] > 0.5
    tile_live = jnp.max(v_ref[0]) > 0.5

    @pl.when(tile_live)
    def _():
        # ---- windows -----------------------------------------------------
        y0 = pl.multiple_of(8 * i, TILE_H)          # padded row of (8i - 8)
        xr0 = pl.multiple_of(128 * j, TILE_W)       # padded col of (128j - 128)
        cp_r = pltpu.make_async_copy(
            ref_ref.at[s, pl.ds(y0, WIN_H), pl.ds(xr0, REF_WIN_W)],
            refwin, sem_r)
        cp_r.start()

        D = d_ref[0, 0]
        A = a_ref[0, 0]
        B = b_ref[0, 0]
        # robust window placement: clamp disparities into the plausible range
        # before the tile min so one wild pixel cannot pin the window away
        # (its own taps are coverage-checked individually)
        dlo = srow_ref[0, 0, 0]
        dhi = srow_ref[0, 0, 1]
        dclip = jnp.clip(D, dlo, dhi)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        # unpadded rect x of this tile's lanes
        xg = 128.0 * j.astype(jnp.float32) + lane
        xmin = jnp.min(xg - dclip) - 6.0
        cmin = jnp.floor(xmin / TILE_W).astype(jnp.int32) * TILE_W
        wr_pad = src_ref.shape[2]
        cmin = jnp.clip(cmin, -PAD_X, wr_pad - PAD_X - SRC_WIN_W)
        xs0 = pl.multiple_of(cmin + PAD_X, TILE_W)
        cp_s = pltpu.make_async_copy(
            src_ref.at[s, pl.ds(y0, WIN_H), pl.ds(xs0, SRC_WIN_W)],
            srcwin, sem_s)
        cp_s.start()
        cminf = cmin.astype(jnp.float32)

        cp_r.wait()
        center = refwin[8:16, 128:256]
        cp_s.wait()

        inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
        inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)
        n_chunks = SRC_WIN_W // TILE_W

        def src_sample(xsrc):
            """Bilinear-in-x sample of an 8-row static slice (rows resolved by
            the caller); returns (value, ok)."""
            rows, xfrac, rel = xsrc
            g0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            g1 = g0
            for cidx in range(n_chunks):
                i0 = jnp.clip(rel - cidx * TILE_W, 0, TILE_W - 1)
                i1 = jnp.clip(rel + 1 - cidx * TILE_W, 0, TILE_W - 1)
                chunk = rows[:, cidx * TILE_W:(cidx + 1) * TILE_W]
                v0 = jnp.take_along_axis(chunk, i0, axis=1,
                                         mode="promise_in_bounds")
                v1 = jnp.take_along_axis(chunk, i1, axis=1,
                                         mode="promise_in_bounds")
                g0 = jnp.where((rel >= cidx * TILE_W)
                               & (rel < (cidx + 1) * TILE_W), v0, g0)
                g1 = jnp.where((rel + 1 >= cidx * TILE_W)
                               & (rel + 1 < (cidx + 1) * TILE_W), v1, g1)
            ok = ((rel >= 0) & (rel <= SRC_WIN_W - 2)
                  & (g0 > SENTINEL_THRESH) & (g1 > SENTINEL_THRESH))
            return g0 + (g1 - g0) * xfrac, ok

        def tap_coords(dx, dy):
            xsrc = xg + dx - (D + A * dx + B * dy)
            xf = jnp.floor(xsrc)
            rel = xf.astype(jnp.int32) - cmin
            return rel, xsrc - xf

        # centre validation (reference ACMMP.cu:418-433): the source centre
        # sample must exist and sit in front of both cameras (disp > 0)
        rel_c, frac_c = tap_coords(0.0, 0.0)
        _, ok_c = src_sample((srcwin[8:16, :], frac_c, rel_c))
        center_ok = ok_c & (D > 0.0) & valid

        r = params.patch_size // 2
        offs = list(range(-r, r + 1, params.radius_increment))

        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        s_bw = s_r = s_rr = s_s = s_ss = s_rs = zeros
        for dy in offs:
            src_rows = srcwin[8 + dy:16 + dy, :]
            for dx in offs:
                ref_pix = refwin[8 + dy:16 + dy, 128 + dx:256 + dx]
                sdist = float((dx * dx + dy * dy) ** 0.5)
                rel, xfrac = tap_coords(float(dx), float(dy))
                val, ok = src_sample((src_rows, xfrac, rel))
                cdist = jnp.abs(ref_pix - center)
                wgt = jnp.where(
                    ok,
                    jnp.exp(-sdist * inv_2ss - cdist * inv_2sc),
                    0.0,
                )
                s_bw = s_bw + wgt
                s_r = s_r + wgt * ref_pix
                s_rr = s_rr + wgt * ref_pix * ref_pix
                s_s = s_s + wgt * val
                s_ss = s_ss + wgt * val * val
                s_rs = s_rs + wgt * ref_pix * val

        inv_bw = 1.0 / jnp.maximum(s_bw, 1e-12)
        m_ref = s_r * inv_bw
        m_src = s_s * inv_bw
        var_ref = s_rr * inv_bw - m_ref * m_ref
        var_src = s_ss * inv_bw - m_src * m_src
        covar = s_rs * inv_bw - m_ref * m_src
        ncc = 1.0 - covar * jax.lax.rsqrt(jnp.maximum(var_ref * var_src, 1e-30))
        cost = jnp.clip(ncc, 0.0, cost_max)
        bad = ((s_bw < 1e-6) | (var_ref < 1e-5) | (var_src < 1e-5)
               | ~center_ok)
        out_ref[0, 0] = jnp.where(bad, cost_max, cost)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def rect_batched_ncc(
    rect: RectContext,
    normals: jax.Array,    # (C, H, W, 3) candidate plane normals (ref-cam)
    ws: jax.Array,         # (C, H, W)
    params: PatchMatchParams,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Evaluate C candidate plane fields against S sources -> (C, S, H, W).

    XLA pre-step: one wide-row gather per pair moves all C candidates' plane
    parameters onto the rectified grid (gather cost is per row regardless of
    width, PERF.md), then the affine disparity fields are pure VPU math.
    XLA post-step: one wide-row gather per pair maps all C cost planes back to
    the original grid.
    """
    C, H, W = ws.shape
    S = rect.fwd_idx.shape[0]
    Hr, Wr = rect.fwd_valid.shape[1:]
    cost_max = params.cost_max

    # ---- gather plane params onto each pair's rectified grid --------------
    table = jnp.concatenate(
        [normals.reshape(C, H * W, 3), ws.reshape(C, H * W, 1)], axis=-1
    )                                             # (C, HW, 4)
    table = table.transpose(1, 0, 2).reshape(H * W, 4 * C)
    gathered = jax.vmap(lambda idx: table[idx])(rect.fwd_idx)  # (S, HrWr, 4C)
    gathered = gathered.reshape(S, Hr * Wr, C, 4).transpose(2, 0, 1, 3)

    # ---- affine disparity fields (D, A, B) per (candidate, pair) ----------
    n_r = jnp.einsum("sij,cspj->cspi", rect.pr.R_rr, gathered[..., :3],
                     precision=jax.lax.Precision.HIGHEST)
    wply = gathered[..., 3]
    f = rect.pr.K[:, 0][None, :, None]
    cx = rect.pr.K[:, 1][None, :, None]
    cy = rect.pr.K[:, 2][None, :, None]
    scale = -rect.pr.baseline[None, :, None] / jnp.where(
        jnp.abs(wply) < 1e-20, 1e-20, wply)
    A = scale * n_r[..., 0]
    B = scale * n_r[..., 1]
    cterm = scale * n_r[..., 2] * f
    ys_r = jax.lax.broadcasted_iota(jnp.float32, (Hr, Wr), 0).reshape(-1)
    xs_r = jax.lax.broadcasted_iota(jnp.float32, (Hr, Wr), 1).reshape(-1)
    D = A * (xs_r - cx) + B * (ys_r - cy) + cterm
    finite = jnp.isfinite(D) & (jnp.abs(D) < 1e8)
    D = jnp.where(finite, D, -1e9)                # coverage-rejected
    D = D.reshape(C, S, Hr, Wr)
    A = A.reshape(C, S, Hr, Wr)
    B = B.reshape(C, S, Hr, Wr)

    kernel = functools.partial(_rect_kernel, params=params)
    ty, tx = Hr // TILE_H, Wr // TILE_W
    tile = lambda: pl.BlockSpec((1, 1, TILE_H, TILE_W),
                                lambda c, s, i, j: (c, s, i, j))
    cost_rect = pl.pallas_call(
        kernel,
        grid=(C, S, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda c, s, i, j: (s, 0, 0)),   # srow
            pl.BlockSpec(memory_space=pltpu.ANY),                      # ref
            pl.BlockSpec(memory_space=pltpu.ANY),                      # src
            tile(), tile(), tile(),                                    # D A B
            pl.BlockSpec((1, TILE_H, TILE_W), lambda c, s, i, j: (s, i, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda c, s, i, j: (c, s, i, j)),
        out_shape=jax.ShapeDtypeStruct((C, S, Hr, Wr), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, REF_WIN_W), jnp.float32),
            pltpu.VMEM((WIN_H, SRC_WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rect.srow[:, None, :], rect.rect_ref, rect.rect_src, D, A, B,
      rect.fwd_valid)

    # ---- map the cost planes back to the original grid --------------------
    back = cost_rect.reshape(C, S, Hr * Wr).transpose(1, 2, 0)   # (S, HrWr, C)
    picked = jax.vmap(lambda t, idx: t[idx])(back, rect.bwd_idx)  # (S, HW, C)
    cost = picked.transpose(2, 0, 1).reshape(C, S, H, W)
    return jnp.where(rect.bwd_valid[None], cost, cost_max)
