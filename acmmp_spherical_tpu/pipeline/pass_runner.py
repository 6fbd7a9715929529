"""Per-image pass runner: the host orchestration of one PatchMatch pass.

Equivalent of the reference's ``ProcessProblem`` (main.cpp:73-210) +
``ACMMP::InuputInitialization`` / ``CudaSpaceInitialization``
(ACMMP.cpp:567-845): load and rescale the view cluster, move it to the device,
run the (optionally seeded) PatchMatch pass, run the planar-prior second round
when requested, and persist depth/normal/cost as ``.dmb``.

Views are padded to a common stack shape and to a fixed source count so every
problem at a given scale compiles to the same XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PipelineConfig, PatchMatchParams
from acmmp_spherical_tpu.core.camera import Camera, scale_camera, stack_cameras
from acmmp_spherical_tpu.core import geometry as G
from acmmp_spherical_tpu.io import dmb
from acmmp_spherical_tpu.io.scene import (
    Problem, ScenePaths, load_image_gray, read_camera_file,
)
from acmmp_spherical_tpu.ops.jbu import joint_bilateral_upsample
from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
from acmmp_spherical_tpu.pipeline.patchmatch import (
    run_patchmatch, run_patchmatch_split,
)
from acmmp_spherical_tpu.pipeline.prior import build_planar_prior, draw_triangulation
from acmmp_spherical_tpu.utils.log import get_logger

log = get_logger(__name__)


def _load_view(sp: ScenePaths, image_id: int, max_size: int):
    """Load + downscale one view (reference ACMMP.cpp:576-643)."""
    img = load_image_gray(sp.image_file(image_id))
    cam = read_camera_file(sp.camera_file(image_id))
    h, w = img.shape
    _size_cache[str(sp.image_file(image_id))] = (h, w)
    cam = scale_camera(cam, 1.0, 1.0, w, h)
    if w > max_size or h > max_size:
        import cv2

        factor = min(max_size / w, max_size / h)
        nw, nh = round(w * factor), round(h * factor)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        cam = scale_camera(cam, nw / w, nh / h, nw, nh)
    return img.astype(np.float32), cam


_size_cache: dict = {}


def _view_geometry(sp: ScenePaths, image_id: int, max_size: int):
    """(camera, h, w) after the cur-size rescale WITHOUT keeping pixels --
    the host-side mirror used by compute_scene_rect_settings."""
    path = str(sp.image_file(image_id))
    if path not in _size_cache:
        img = load_image_gray(sp.image_file(image_id))
        _size_cache[path] = img.shape
    h, w = _size_cache[path]
    cam = read_camera_file(sp.camera_file(image_id))
    cam = scale_camera(cam, 1.0, 1.0, w, h)
    if w > max_size or h > max_size:
        factor = min(max_size / w, max_size / h)
        nw, nh = round(w * factor), round(h * factor)
        cam = scale_camera(cam, nw / w, nh / h, nw, nh)
        h, w = nh, nw
    return cam, h, w


def compute_scene_rect_settings(sp: ScenePaths, problems: Sequence[Problem],
                                cfg: PipelineConfig):
    """Scene-wide UNIFIED static rect-kernel settings for the current scale.

    The rect path's static knobs (compute-grid bbox, live-tile budget, init
    window) are per-problem geometry functions; left per-problem they make
    every image a distinct compiled program (~minutes of remote compile per
    image at production sizes -- measured in the round-3 envelope run).  The
    reference pays ZERO recompiles (main.cpp:392-482), so the pipeline
    max/and-reduces them over the scene once per scale and every problem
    shares one program per pass variant (a wider bbox/budget/window only
    adds coverage; batch_runner applies the same reduction per chunk).

    Returns ``(comp_hw, live_n, iwin_pinhole, iwin_sphere, failed_ids,
    warp_hw)`` or None when no problem rectifies.  ``warp_hw`` is the
    scene-max warp-gather transport window, or None when any problem's
    geometry exceeds the static bound (the whole scale then keeps the XLA
    gather transport -- one compiled program either way).  ``failed_ids`` lists problems whose
    settings derivation raised: they are EXCLUDED from the max-reduction, so
    ``load_problem`` must not clamp the unified tuple onto them (their bbox /
    live budget may exceed the scene max) -- it derives per-problem instead
    (round-3 advisor finding).
    """
    from acmmp_spherical_tpu.ops.rectify import (
        host_rectifiable, rect_comp_shape, rect_init_window,
        rect_inv_attrib_ok, rect_live_tile_count, rect_shape,
        rect_warp_window,
    )
    from acmmp_spherical_tpu.ops.sphere_rect import (
        sphere_init_window, sphere_live_tile_count, sphere_rectifiable,
    )

    by_id = {p.ref_image_id: p for p in problems}
    comp = None
    live = None
    live_s = None
    iwin_p = None
    iwin_s = None
    warp = None
    warp_none = False   # any problem with no usable warp window disables it
    inv_ok = True       # scatter-free attribution: scene-wide AND of the
                        # Lipschitz host gate (one compiled program per pass)
    failed = set()
    for problem in problems:
        try:
            ref_cam, h, w = _view_geometry(sp, problem.ref_image_id,
                                           problem.cur_image_size)
            src = []
            for sid in problem.src_image_ids[: cfg.max_src_views]:
                cur = (by_id[sid].cur_image_size if sid in by_id
                       else problem.cur_image_size)
                src.append(_view_geometry(sp, sid, cur)[0])
            if not src:
                continue
            stacked = stack_cameras(src)
            if ref_cam.model == "pinhole":
                rhw = rect_shape(h, w)
                if not host_rectifiable(ref_cam, stacked, rhw):
                    continue
                chw = rect_comp_shape(ref_cam, stacked, rhw)
                ln = rect_live_tile_count(ref_cam, stacked, rhw, chw)
                iw = rect_init_window(ref_cam, stacked, rhw,
                                      min_scale=cfg.depth_min_scale,
                                      max_scale=cfg.depth_max_scale)
                comp = (chw if comp is None else
                        (max(comp[0], chw[0]), max(comp[1], chw[1])))
                live = ln if live is None else max(live, ln)
                iwin_p = iw if iwin_p is None else (
                    0 if 0 in (iwin_p, iw) else max(iwin_p, iw))
                whw = rect_warp_window(ref_cam, stacked, rhw)
                if whw is None:
                    warp_none = True
                elif not warp_none:
                    warp = (whw if warp is None else
                            (max(warp[0], whw[0]), max(warp[1], whw[1])))
                inv_ok = inv_ok and rect_inv_attrib_ok(ref_cam, stacked, rhw)
            elif ref_cam.model == "sphere":
                if not sphere_rectifiable(ref_cam, stacked):
                    continue
                iw = sphere_init_window(ref_cam, stacked,
                                        min_scale=cfg.depth_min_scale)
                iwin_s = iw if iwin_s is None else (
                    0 if 0 in (iwin_s, iw) else max(iwin_s, iw))
                sl = sphere_live_tile_count(ref_cam)
                live_s = sl if live_s is None else max(live_s, sl)
        except Exception:
            failed.add(problem.ref_image_id)
            log.exception("rect settings for image %08d failed; it will "
                          "derive per-problem settings instead of the "
                          "unified tuple", problem.ref_image_id)
    if comp is None and iwin_s is None:
        return None
    return (comp, live, iwin_p, iwin_s, frozenset(failed),
            None if warp_none else warp, live_s, inv_ok)


def _pad_stack(arrays: Sequence[np.ndarray], shape=None) -> np.ndarray:
    """Zero-pad 2D arrays to a common (Hp, Wp) and stack."""
    if shape is None:
        hp = max(a.shape[0] for a in arrays)
        wp = max(a.shape[1] for a in arrays)
    else:
        hp, wp = shape
    out = np.zeros((len(arrays), hp, wp), np.float32)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0], : a.shape[1]] = a
    return out


@dataclasses.dataclass
class LoadedProblem:
    inputs: PatchMatchInputs
    ref_image_np: np.ndarray
    ref_cam: Camera
    height: int
    width: int


def load_problem(
    sp: ScenePaths,
    problems: Sequence[Problem],
    idx: int,
    cfg: PipelineConfig,
    *,
    geom: bool = False,
    multi_geometry: bool = False,
) -> tuple[LoadedProblem, PatchMatchParams]:
    """Build device inputs for one problem (InuputInitialization analog)."""
    problem = problems[idx]
    by_id = {p.ref_image_id: p for p in problems}

    ref_img, ref_cam = _load_view(sp, problem.ref_image_id, problem.cur_image_size)
    src_imgs, src_cams = [], []
    for sid in problem.src_image_ids[: cfg.max_src_views]:
        cur = by_id[sid].cur_image_size if sid in by_id else problem.cur_image_size
        im, cm = _load_view(sp, sid, cur)
        src_imgs.append(im)
        src_cams.append(cm)

    n_src = len(src_imgs)
    # pad to the scene-wide source count (rounded up for shape stability), not
    # the global cap: padded views are masked but still *computed*, so over-
    # padding multiplies the NCC work
    scene_max = max((min(len(p.src_image_ids), cfg.max_src_views)
                     for p in problems), default=1)
    n_pad = max(1, -(-scene_max // 2) * 2)
    src_valid = np.zeros(n_pad, bool)
    src_valid[:n_src] = True
    while len(src_imgs) < n_pad:
        src_imgs.append(np.zeros((1, 1), np.float32))
        src_cams.append(src_cams[0] if n_src else ref_cam)

    dmin, dmax = np.asarray(ref_cam.depth_range)
    # the working range travels as a traced input (inputs.depth_range), NOT as
    # static params: a static range would recompile every image
    depth_range = jnp.asarray(
        [cfg.depth_min_scale * dmin, cfg.depth_max_scale * dmax], jnp.float32
    )
    params = cfg.patchmatch
    if cfg.fast_ncc == "on" or (
        cfg.fast_ncc == "auto"
        and jax.default_backend() == "tpu"
        and ref_cam.model == "pinhole"
    ):
        params = dataclasses.replace(params, fast_ncc=True)
    if ref_cam.model == "pinhole" and (
        cfg.rect_ncc == "on"
        or (cfg.rect_ncc == "auto" and jax.default_backend() == "tpu")
    ):
        # photometric/hierarchy AND geometric passes on rectifiable problems
        # take the epipolar-rectified kernel (geom passes fuse the 1D
        # disparity-mismatch consistency term); the per-problem host gate
        # rejects forward-motion / degenerate pairs
        from acmmp_spherical_tpu.ops.rectify import (
            host_rectifiable, rect_comp_shape, rect_init_window,
            rect_live_tile_count, rect_shape,
        )

        stacked = stack_cameras(src_cams[:n_src] if n_src else src_cams)
        rhw = rect_shape(ref_img.shape[0], ref_img.shape[1])
        if n_src and host_rectifiable(ref_cam, stacked, rhw):
            unify = cfg.rect_unify
            # problems whose settings derivation failed during unification
            # were excluded from the max-reduction: never clamp the unified
            # tuple onto them (advisor r3) -- derive per-problem below
            unify_ok = (unify is not None and unify[0] is not None
                        and not (len(unify) > 4
                                 and problem.ref_image_id in unify[4]))
            if unify_ok:
                # scene-wide unified shapes: one compiled program per pass
                # variant per scale (see compute_scene_rect_settings)
                chw, live_n, iwin = unify[0], unify[1], unify[2]
                chw = (min(chw[0], rhw[0]), min(chw[1], rhw[1]))
                iwin = iwin or 0
                warp_hw = unify[5] if len(unify) > 5 else None
                inv = bool(unify[7]) if len(unify) > 7 else False
            else:
                from acmmp_spherical_tpu.ops.rectify import (
                    rect_inv_attrib_ok, rect_warp_window,
                )

                iwin = rect_init_window(ref_cam, stacked, rhw,
                                        min_scale=cfg.depth_min_scale,
                                        max_scale=cfg.depth_max_scale)
                chw = rect_comp_shape(ref_cam, stacked, rhw)
                live_n = rect_live_tile_count(ref_cam, stacked, rhw, chw)
                warp_hw = rect_warp_window(ref_cam, stacked, rhw)
                inv = rect_inv_attrib_ok(ref_cam, stacked, rhw)
            params = dataclasses.replace(
                params, rect_ncc=True, rect_comp_hw=chw, rect_live_n=live_n,
                rect_init=iwin > 0, rect_init_win=iwin or 384,
                rect_warp_hw=warp_hw, rect_inv_attrib=inv)
    if ref_cam.model == "sphere" and (
        cfg.rect_ncc == "on"
        or (cfg.rect_ncc == "auto" and jax.default_backend() == "tpu")
    ):
        # spherical problems (incl. geom passes: fused meridian disparity
        # mismatch) take the pole-rotated fast kernel whenever every pair
        # has a usable baseline (ops/sphere_rect); the init eval rides the
        # kernel when the full span fits (sphere_init_window)
        from acmmp_spherical_tpu.ops.sphere_rect import (
            sphere_init_window, sphere_live_tile_count, sphere_rectifiable,
        )

        stacked = stack_cameras(src_cams[:n_src] if n_src else src_cams)
        if n_src and sphere_rectifiable(ref_cam, stacked):
            unify = cfg.rect_unify
            if (unify is not None and unify[3] is not None
                    and not (len(unify) > 4
                             and problem.ref_image_id in unify[4])):
                iwin = unify[3]
                live_s = (unify[6] if len(unify) > 6 and unify[6] is not None
                          else sphere_live_tile_count(ref_cam))
            else:
                iwin = sphere_init_window(ref_cam, stacked,
                                          min_scale=cfg.depth_min_scale)
                live_s = sphere_live_tile_count(ref_cam)
            params = dataclasses.replace(
                params, rect_ncc=True, sphere_live_n=live_s,
                rect_init=iwin > 0, rect_init_win=iwin or 384)
    if geom:
        params = params.with_geom(multi_geometry)

    src_depths = None
    if geom:
        # load the previous pass's depth maps of every source view
        # (ACMMP.cpp:653-678); suffix chosen by multi_geometry
        deps = []
        for i, sid in enumerate(problem.src_image_ids[: cfg.max_src_views]):
            path = sp.depth_file(sid, geom=multi_geometry)
            deps.append(dmb.read_depth_dmb(path) if path.exists()
                        else np.zeros((1, 1), np.float32))
        while len(deps) < n_pad:
            deps.append(np.zeros((1, 1), np.float32))
        src_depths = jnp.asarray(_pad_stack(deps))

    inputs = PatchMatchInputs(
        ref_image=jnp.asarray(ref_img),
        src_images=jnp.asarray(_pad_stack(src_imgs)),
        ref_cam=ref_cam,
        src_cams=stack_cameras(src_cams),
        src_valid=jnp.asarray(src_valid),
        src_depths=src_depths,
        depth_range=depth_range,
    )
    lp = LoadedProblem(
        inputs=inputs, ref_image_np=ref_img, ref_cam=ref_cam,
        height=ref_img.shape[0], width=ref_img.shape[1],
    )
    return lp, params


def _load_seed(sp: ScenePaths, image_id: int, *, multi_geometry: bool):
    """Previous-pass seed fields for geom passes (CudaSpaceInitialization,
    ACMMP.cpp:753-785)."""
    depth = dmb.read_depth_dmb(sp.depth_file(image_id, geom=multi_geometry))
    normal = dmb.read_normal_dmb(sp.normal_file(image_id))
    return jnp.asarray(normal), jnp.asarray(depth)


def _load_hierarchy_seed(sp: ScenePaths, lp: LoadedProblem, image_id: int):
    """Coarse-scale seed for hierarchy passes (ACMMP.cpp:788-844).

    The inter-scale JBU pass has already written a full-resolution depths.dmb
    seed; normals/costs are still at the coarse resolution and are upsampled
    here with the same guided filter the reference applies in-kernel
    (ACMMP.cu:713-779).
    """
    depth = dmb.read_depth_dmb(sp.depth_file(image_id, geom=False))
    normal = dmb.read_normal_dmb(sp.normal_file(image_id))
    H, W = lp.height, lp.width
    if depth.shape != (H, W):
        # JBU was skipped (scale ratio 1); fall back to the freshest depth
        gpath = sp.depth_file(image_id, geom=True)
        if gpath.exists():
            d2 = dmb.read_depth_dmb(gpath)
            if d2.shape == (H, W):
                depth = d2
    if normal.shape[:2] != (H, W):
        normal = np.asarray(
            joint_bilateral_upsample(jnp.asarray(normal), jnp.asarray(lp.ref_image_np))
        )
        norms = np.linalg.norm(normal, axis=-1, keepdims=True)
        normal = normal / np.maximum(norms, 1e-12)
    if depth.shape != (H, W):
        # final fallback: plain guided upsample of whatever depth we have
        depth = np.asarray(
            joint_bilateral_upsample(jnp.asarray(depth), jnp.asarray(lp.ref_image_np))
        )
    return jnp.asarray(normal), jnp.asarray(depth)


def process_problem(
    sp: ScenePaths,
    problems: Sequence[Problem],
    idx: int,
    cfg: PipelineConfig,
    *,
    geom: bool = False,
    planar_prior: bool = False,
    hierarchy: bool = False,
    multi_geometry: bool = False,
    seed: Optional[int] = None,
    tile_mesh=None,
    ctx_cache: Optional[dict] = None,
) -> None:
    """Run one pass for one problem and persist the results
    (ProcessProblem analog, main.cpp:73-210).

    ``tile_mesh``: intra-image tile parallelism (parallel/tile.py) -- the
    plane state is sharded along the image width over the mesh's ``tile``
    axis (GSPMD halo exchange; SURVEY.md 5.8 #4).  For frames whose working
    set exceeds one chip; runs the exact array-program path (the Pallas
    fast kernels do not partition).

    ``ctx_cache``: cross-pass context cache (cfg.ctx_reuse) owned by the
    scale loop in multiscale.run_pipeline: maps a per-image key to the
    PREPARED inputs of this image's first pass of the scale, whose
    depth-independent pieces (packed tables, warped frames, transport
    maps) are adopted by the later passes instead of rebuilt
    (ops/propagate.prepare_inputs).  Only active in split-program mode
    (the fused program traces its own prepare)."""
    problem = problems[idx]
    image_id = problem.ref_image_id
    sp.result_dir(image_id).mkdir(parents=True, exist_ok=True)

    lp, params = load_problem(
        sp, problems, idx, cfg, geom=geom, multi_geometry=multi_geometry
    )
    if hierarchy:
        params = params.with_hierarchy()
    shard_state = None
    if tile_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from acmmp_spherical_tpu.parallel.tile import make_state_sharder

        params = dataclasses.replace(params, fast_ncc=False, rect_ncc=False,
                                     rect_comp_hw=None, rect_live_n=None,
                                     rect_init=False, rect_warp_hw=None)
        shard_state = make_state_sharder(tile_mesh)
        lp.inputs = jax.device_put(lp.inputs, NamedSharding(tile_mesh, P()))

    key = jax.random.fold_in(
        jax.random.key(cfg.seed if seed is None else seed), image_id
    )
    seed_normal = seed_depth = None
    if geom:
        seed_normal, seed_depth = _load_seed(sp, image_id, multi_geometry=multi_geometry)
    elif hierarchy:
        seed_normal, seed_depth = _load_hierarchy_seed(sp, lp, image_id)

    log.info("pass image=%08d size=%dx%d geom=%s prior=%s hier=%s multi=%s",
             image_id, lp.width, lp.height, geom, planar_prior, hierarchy,
             multi_geometry)
    # split-program execution on TPU: large fused pass programs crash the
    # v5e worker at some shape classes (round-5 envelope: every SEEDED pass
    # variant at 800x600; the same stages dispatched separately are clean).
    # ~4% slower (no cross-stage fusion); tile-shard keeps the fused path
    # (its sharding hook lives inside the one program).
    split = tile_mesh is None and (cfg.split_iterations == "on" or (
        cfg.split_iterations == "auto" and jax.default_backend() == "tpu"))
    run_pass = run_patchmatch_split if split else run_patchmatch
    kw = {} if split else {"shard_state": shard_state}
    pass_inputs = lp.inputs
    if split:
        # split mode exposes the prepare stage, so the pipeline can reuse
        # the depth-independent context pieces across the passes of one
        # (image, scale) -- see ops/propagate.prepare_inputs.  The prior
        # re-run below reuses them even without a cross-pass cache.
        from acmmp_spherical_tpu.pipeline.patchmatch import _split_prepare

        ck = (image_id, lp.height, lp.width, params.rect_comp_hw,
              params.rect_live_n, params.rect_warp_hw,
              params.rect_inv_attrib, params.rect_init_win,
              params.sphere_live_n)
        cached = ctx_cache.get(ck) if ctx_cache is not None else None
        pass_inputs = _split_prepare(lp.inputs, params, cached)
        kw["prepared"] = True
        if ctx_cache is not None and cached is None:
            # store ONLY the reusable pieces (packed tables + rect context
            # minus the per-pass disparity planes): holding the full inputs
            # would pin duplicate image stacks in device memory
            rect_slim = pass_inputs.rect
            if rect_slim is not None:
                rect_slim = rect_slim._replace(rect_sdisp=None)
            slim = PatchMatchInputs(
                ref_image=None, src_images=None, ref_cam=None,
                src_cams=None, src_valid=None,
                src_packed=pass_inputs.src_packed, rect=rect_slim)
            nbytes = sum(a.nbytes
                         for a in jax.tree_util.tree_leaves(slim)
                         if hasattr(a, "nbytes"))
            budget = cfg.ctx_cache_mb * (1 << 20)
            if ctx_cache.setdefault("_bytes", 0) + nbytes <= budget:
                ctx_cache[ck] = slim
                ctx_cache["_bytes"] += nbytes
            else:
                log.info("ctx cache full (%d/%d MB): image %08d rebuilds "
                         "per pass", ctx_cache["_bytes"] >> 20,
                         cfg.ctx_cache_mb, image_id)
    depth, normal_world, cost, state = run_pass(
        pass_inputs, params, key,
        seed_normal_world=seed_normal, seed_depth=seed_depth, **kw,
    )

    if planar_prior:
        # second round with the Delaunay planar prior (main.cpp:113-197)
        import cv2

        dmin, dmax = np.asarray(lp.ref_cam.depth_range)
        prior_normal, prior_w, mask, tris = build_planar_prior(
            lp.ref_cam, np.asarray(depth), np.asarray(cost),
            cfg.depth_min_scale * dmin, cfg.depth_max_scale * dmax, cfg.prior,
        )
        overlay = draw_triangulation(lp.ref_image_np, tris)
        cv2.imwrite(str(sp.result_dir(image_id) / "triangulation.png"),
                    overlay[..., ::-1])
        if mask.any():
            prior_inputs = pass_inputs._replace(
                prior_normal=jnp.asarray(prior_normal),
                prior_w=jnp.asarray(prior_w),
                prior_mask=jnp.asarray(mask),
            )
            if tile_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                prior_inputs = jax.device_put(
                    prior_inputs, NamedSharding(tile_mesh, P()))
            pparams = params.with_planar_prior()
            key2 = jax.random.fold_in(key, 1)
            depth, normal_world, cost, state = run_pass(
                prior_inputs, pparams, key2, prev_state=state, **kw,
            )

    dmb.write_dmb(sp.depth_file(image_id, geom=geom), np.asarray(depth))
    dmb.write_dmb(sp.normal_file(image_id), np.asarray(normal_world))
    dmb.write_dmb(sp.cost_file(image_id), np.asarray(cost))
