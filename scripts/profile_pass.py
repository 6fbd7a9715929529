#!/usr/bin/env python
"""Component breakdown of one photometric pass at the bench operating point.

Times (fenced with block_until_ready, best of reps):
  * build_rect_context (per pass)
  * initialize_state with rect_init (per pass)
  * one 9-candidate rect_batched_ncc invocation (the propagation batch)
  * one 6-candidate invocation (refinement batch incl. exact-idx none)
  * one full checkerboard halfstep (all of the above + view selection)
  * a full run_patchmatch pass (reference total)
Optionally (--prescreen) also times a pass with rect_prescreen=True.
"""

import argparse
import dataclasses
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
    ap.add_argument("--prescreen", action="store_true")
    ap.add_argument("--no-inv-attrib", action="store_true",
                    help="rect_inv_attrib=False: keep the scatter-based "
                         "transport map build (A/B of the inverse-check "
                         "attribution; PERF.md round 5)")
    ap.add_argument("--no-tap-pack", action="store_true",
                    help="rect_tap_pack=False: f32 window sampling (the A/B "
                         "variant of the bf16 pair-pack; PERF.md round 5)")
    ap.add_argument("--size", type=int, nargs=2, default=[1024, 768])
    ap.add_argument("--views", type=int, default=8)
    args = ap.parse_args()

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import (
        PatchMatchInputs, checkerboard_halfstep, initialize_state,
        prepare_inputs, _batched_cost_vectors,
    )
    from acmmp_spherical_tpu.ops.ncc import ref_tap_context
    from acmmp_spherical_tpu.ops.rectify import (
        build_rect_context, host_rectifiable, rect_comp_shape,
        rect_init_window, rect_inv_attrib_ok, rect_live_tile_count,
        rect_shape, rect_warp_window,
    )
    from acmmp_spherical_tpu.ops.sampling import checkerboard_pack
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H = args.size
    n_src = args.views
    scene = CubeRoom()
    cams = make_ring_of_cameras(1 + n_src, width=W, height=H,
                                focal=0.9 * W, radius=0.25)
    cache = f"/tmp/acmmp_bench_scene_{W}x{H}x{n_src}.npz"
    try:
        data = np.load(cache)
        images = data["images"]
    except Exception:
        images, _, _ = render_scene(cams, scene, W, H)
        np.savez(cache, images=images, depths=_)

    dmin, dmax = np.asarray(cams[0].depth_range)
    rhw = rect_shape(H, W)
    stacked = stack_cameras(cams[1:])
    comp_hw = rect_comp_shape(cams[0], stacked, rhw)
    live_n = rect_live_tile_count(cams[0], stacked, rhw, comp_hw)
    iwin = rect_init_window(cams[0], stacked, rhw)
    warp_hw = rect_warp_window(cams[0], stacked, rhw)
    T = (comp_hw[0] // 8) * (comp_hw[1] // 128)
    print(f"live_n={live_n} of T={T} ({live_n/T:.2f}) warp_hw={warp_hw}")
    params = dataclasses.replace(
        PatchMatchParams().with_depth_range(dmin, dmax), fast_ncc=True,
        rect_ncc=True, rect_comp_hw=comp_hw, rect_live_n=live_n,
        rect_init=iwin > 0, rect_init_win=iwin or 384,
        rect_prescreen=args.prescreen, rect_warp_hw=warp_hw,
        rect_tap_pack=not args.no_tap_pack,
        rect_inv_attrib=(not args.no_inv_attrib
                         and rect_inv_attrib_ok(cams[0], stacked, rhw)),
    )
    images_d = jax.device_put(jnp.asarray(images))
    inputs = PatchMatchInputs(
        ref_image=images_d[0], src_images=images_d[1:],
        ref_cam=cams[0], src_cams=stacked,
        src_valid=jnp.ones(n_src, bool),
    )

    # --- rect context build -------------------------------------------------
    dr = (jnp.float32(dmin), jnp.float32(dmax))
    build = jax.jit(lambda: build_rect_context(
        inputs.ref_image, inputs.src_images, inputs.ref_cam, inputs.src_cams,
        dr, comp_hw=comp_hw, live_n=live_n, warp_hw=warp_hw,
        inv_attrib=params.rect_inv_attrib))
    t_ctx, rect = fence(build)
    print(f"build_rect_context: {t_ctx*1e3:8.1f} ms")

    inputs2 = prepare_inputs(inputs, params)

    # NOTE: big arrays (inputs2/ctx) must be jit ARGUMENTS, not closure
    # captures -- captured arrays embed as HLO constants and blow past the
    # remote-compile tunnel's request-size limit (HTTP 413).
    # --- init ---------------------------------------------------------------
    ctx = ref_tap_context(inputs.ref_image, cams[0], params)
    init_fn = jax.jit(lambda inp, c, k: initialize_state(inp, params, k, ctx=c))
    t_init, state = fence(init_fn, inputs2, ctx, jax.random.key(0))
    print(f"initialize_state (rect_init={params.rect_init}): {t_init*1e3:8.1f} ms")

    # --- one C=9 propagation-batch invocation (full grid + parity-packed) ---
    n9 = jnp.repeat(state.normal[None], 9, 0)
    w9 = jnp.repeat(state.w[None], 9, 0)
    inv = jax.jit(lambda inp, c, n, w: _batched_cost_vectors(
        inp, c, params, n, w)[0])
    t9, _ = fence(inv, inputs2, ctx, n9, w9)
    print(f"rect_batched_ncc C=9 (full): {t9*1e3:8.1f} ms")
    invp = jax.jit(lambda inp, c, n, w: _batched_cost_vectors(
        inp, c, params, n, w, parity=0)[0])
    n9p = jnp.moveaxis(checkerboard_pack(jnp.moveaxis(n9, -1, 1), 0), 1, -1)
    w9p = checkerboard_pack(w9, 0)
    t9p, _ = fence(invp, inputs2, ctx, n9p, w9p)
    print(f"rect_batched_ncc C=9 (parity-packed): {t9p*1e3:8.1f} ms")
    t5p, _ = fence(invp, inputs2, ctx, n9p[:5], w9p[:5])
    print(f"rect_batched_ncc C=5 (parity-packed): {t5p*1e3:8.1f} ms")
    t1, _ = fence(inv, inputs2, ctx, n9[:1], w9[:1])
    print(f"rect_batched_ncc C=1 (full): {t1*1e3:8.1f} ms")

    # --- one halfstep -------------------------------------------------------
    hs = jax.jit(lambda st, inp, c, k: checkerboard_halfstep(
        st, inp, c, params, k, jnp.int32(1), 0))
    t_hs, _ = fence(hs, state, inputs2, ctx, jax.random.key(1))
    print(f"checkerboard_halfstep: {t_hs*1e3:8.1f} ms")

    # --- full pass ----------------------------------------------------------
    t_pass, _ = fence(lambda k: run_patchmatch(inputs, params, k),
                      jax.random.key(2), reps=2)
    print(f"full pass: {t_pass*1e3:8.1f} ms "
          f"(6 halfsteps -> {6*t_hs*1e3:.0f} ms + init {t_init*1e3:.0f} + "
          f"ctx {t_ctx*1e3:.0f})")


if __name__ == "__main__":
    main()
