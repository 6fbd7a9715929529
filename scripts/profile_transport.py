#!/usr/bin/env python
"""Stage-by-stage timing of the rect_batched_ncc XLA transport.

profile_pass.py showed the C=9 invocation costs ~904 ms of which the Pallas
kernel is ~128 ms: ~780 ms is the XLA pre/post transport (coefficient einsum,
forward gather, transposes, D evaluation, backmap).  This script times each
stage in isolation (jit-fenced, best of reps) so the redesign targets the
right op.
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def fence(f, *a, reps=3, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 768])
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--cands", type=int, default=9)
    args = ap.parse_args()

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import (
        PatchMatchInputs, initialize_state, prepare_inputs,
    )
    from acmmp_spherical_tpu.ops.ncc import ref_tap_context
    from acmmp_spherical_tpu.ops.rectify import (
        build_rect_context, rect_comp_shape, rect_init_window, rect_shape,
    )
    from acmmp_spherical_tpu.ops.pallas import ncc_rect as NR
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    n_src = args.views
    C = args.cands
    scene = CubeRoom()
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H,
                                focal=0.9 * W, radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        images = np.load(cache)["images"]
    except Exception:
        images, d, _ = render_scene(cams, scene, W, H)
        np.savez(cache, images=images, depths=d)

    dmin, dmax = np.asarray(cams[0].depth_range)
    rhw = rect_shape(H, W)
    stacked = stack_cameras(cams[1:])
    from acmmp_spherical_tpu.ops.rectify import rect_live_tile_count
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    iwin = rect_init_window(cams[0], stacked, rhw)
    params = dataclasses.replace(
        PatchMatchParams().with_depth_range(dmin, dmax), fast_ncc=True,
        rect_ncc=True, rect_comp_hw=comp_hw, rect_live_n=live_n,
        rect_init=iwin > 0, rect_init_win=iwin or 384,
    )
    images_d = jax.device_put(jnp.asarray(images))
    inputs = PatchMatchInputs(
        ref_image=images_d[0], src_images=images_d[1:],
        ref_cam=cams[0], src_cams=stacked,
        src_valid=jnp.ones(n_src, bool),
    )
    dr = (jnp.float32(dmin), jnp.float32(dmax))
    rect = jax.jit(lambda: build_rect_context(
        inputs.ref_image, inputs.src_images, inputs.ref_cam, inputs.src_cams,
        dr, comp_hw=comp_hw, live_n=live_n))()
    jax.block_until_ready(rect)
    inputs2 = prepare_inputs(inputs, params)
    ctx = ref_tap_context(inputs.ref_image, cams[0], params)
    state = jax.jit(functools.partial(initialize_state, params=params))(
        inputs2, key=jax.random.key(0), ctx=ctx)
    normals = jnp.repeat(state.normal[None], C, 0)
    ws = jnp.repeat(state.w[None], C, 0)

    maps = rect.maps[0]
    S = maps.bwd_cidx.shape[0]
    K8 = maps.fwd_valid.shape[1]
    print(f"S={S} C={C} H={H} W={W} compact K8={K8} (live tiles {K8//8})")

    # ---- stage 1: coefficient einsum + stack to (S, HW, 3C) ----------------
    def stage1(normals, ws):
        n_r = jnp.einsum("sij,chwj->shwci", rect.pr.R_rr, normals,
                         precision=jax.lax.Precision.HIGHEST)
        f = rect.pr.K[:, 0][:, None, None, None]
        wply = jnp.moveaxis(ws, 0, -1)[None]
        scale = -rect.pr.baseline[:, None, None, None] / jnp.where(
            jnp.abs(wply) < 1e-20, 1e-20, wply)
        A = scale * n_r[..., 0]
        B = scale * n_r[..., 1]
        cterm = scale * n_r[..., 2] * f
        return jnp.stack([A, B, cterm], -1).reshape(S, H * W, 3 * C)

    j1 = jax.jit(stage1)
    t1, table = fence(j1, normals, ws)
    print(f"stage1 einsum+stack -> (S, HW, 3C): {t1*1e3:8.1f} ms")

    # ---- stage 2: forward gather onto the compacted live tiles -------------
    def stage2(table):
        return jax.vmap(lambda t, idx: t[idx])(table, maps.fwd_idx)

    j2 = jax.jit(stage2)
    t2, abc = fence(j2, table)
    print(f"stage2 fwd row-gather (S, K8*128, 3C): {t2*1e3:8.1f} ms")

    # ---- stage 3: reshape/transpose to (C, S, K8, 128) x3 ------------------
    def stage3(abc):
        a = abc.reshape(S, K8, 128, C, 3)
        A = a[..., 0].transpose(3, 0, 1, 2)
        B = a[..., 1].transpose(3, 0, 1, 2)
        ct = a[..., 2].transpose(3, 0, 1, 2)
        return A, B, ct

    j3 = jax.jit(stage3)
    t3, (A, B, ct) = fence(j3, abc)
    print(f"stage3 transpose -> 3x (C, S, K8, 128): {t3*1e3:8.1f} ms")

    # ---- stage 4: D eval is folded into stage1 in production ---------------
    def stage4(A, B, ct):
        D = A * 0.0 + B * 0.0 + ct
        finite = (jnp.isfinite(D) & (jnp.abs(D) < 1e8)
                  & (maps.fwd_valid[None] > 0.5))
        return jnp.where(finite, D, -1e9)

    j4 = jax.jit(stage4)
    t4, D = fence(j4, A, B, ct)
    print(f"stage4 finite mask: {t4*1e3:8.1f} ms")

    # ---- stage 5: pallas kernel only ---------------------------------------
    def stage5(D, A, B):
        kernel = functools.partial(NR._rect_kernel, params=params, n_cand=C,
                                   with_geom=False)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        N = K8 // NR.TILE_H
        win_w = params.rect_win_w or 384
        r = params.patch_size // 2
        n_taps = len(range(-r, r + 1, params.radius_increment)) ** 2
        cdab = lambda: pl.BlockSpec((C, 1, NR.TILE_H, NR.TILE_W),
                                    lambda s, k: (0, s, k, 0))
        smem = lambda: pl.BlockSpec((S, N), lambda s, k: (0, 0),
                                    memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel,
            grid=(S, N),
            in_specs=[
                pl.BlockSpec((1, 1, 128), lambda s, k: (s, 0, 0)),
                smem(), smem(),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                cdab(), cdab(),
                pl.BlockSpec((1, NR.TILE_H, NR.TILE_W),
                             lambda s, k: (s, k, 0)),
            ],
            out_specs=cdab(),
            out_shape=jax.ShapeDtypeStruct((C, S, K8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NR.WIN_H, NR.REF_WIN_W), jnp.float32),
                pltpu.VMEM((2, NR.WIN_H, win_w), jnp.float32),
                pltpu.VMEM((n_taps, NR.TILE_H, NR.TILE_W), jnp.float32),
                pltpu.VMEM((n_taps, NR.TILE_H, NR.TILE_W), jnp.float32),
                pltpu.VMEM((n_taps, NR.TILE_H, NR.TILE_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(rect.srow[:, None, :], rect.tile_oy, rect.tile_ox,
          rect.rect_ref, rect.rect_src, D, NR.pack_ab(A, B), maps.fwd_valid)

    j5 = jax.jit(stage5)
    t5, cost = fence(j5, D, A, B)
    print(f"stage5 pallas kernel: {t5*1e3:8.1f} ms")

    # ---- stage 6: backmap ----------------------------------------------------
    def stage6(cost):
        back = cost.reshape(C, S, K8 * 128).transpose(1, 2, 0)
        picked = jax.vmap(lambda t, idx: t[idx])(back, maps.bwd_cidx)
        out = picked.transpose(2, 0, 1).reshape(C, S, H, W)
        return jnp.where(maps.bwd_valid.reshape(1, S, H, W), out,
                         params.cost_max)

    j6 = jax.jit(stage6)
    t6, _ = fence(j6, cost)
    print(f"stage6 backmap: {t6*1e3:8.1f} ms")

    total = t1 + t2 + t3 + t4 + t5 + t6
    print(f"sum of stages: {total*1e3:8.1f} ms (fused invocation ~904 ms)")


if __name__ == "__main__":
    main()
