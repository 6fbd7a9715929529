"""Configuration dataclasses.

The reference scatters its hyper-parameters over compile-time defaults
(reference ACMMP.h:32-55), magic constants at use sites (see SURVEY.md section 5.6)
and converter argparse flags (colmap2mvsnet_acm.py:411-430).  Here every knob
lives in one frozen dataclass, with the reference values as defaults, so a run
is fully described by its config + seed.

All classes are plain (hashable, static) Python dataclasses: they are closed
over by jit-compiled functions, so changing a value triggers a recompile, which
is the intended semantics for algorithm hyper-parameters.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class PatchMatchParams:
    """Per-pass PatchMatch hyper-parameters.

    Defaults mirror reference ACMMP.h:32-55 plus the magic constants inlined in
    ACMMP.cu / main.cpp (citations on each field).
    """

    # -- core schedule (ACMMP.h:33-40) --------------------------------------
    max_iterations: int = 3          # photometric; geom passes force 2 (ACMMP.cpp:551)
    patch_size: int = 11             # NCC window (ACMMP.h:34)
    radius_increment: int = 2        # NCC tap stride (ACMMP.h:37) -> 6x6=36 taps
    sigma_spatial: float = 5.0       # bilateral spatial sigma, px (ACMMP.h:38)
    sigma_color: float = 3.0         # bilateral color sigma (ACMMP.h:39)
    top_k: int = 4                   # views aggregated in the initial cost (ACMMP.h:40)
    max_image_size: int = 3200       # long-side cap (ACMMP.h:36)

    # -- working depth range (set per problem; ACMMP.cpp:645-646) -----------
    depth_min: float = 0.0
    depth_max: float = 1.0

    # -- mode flags (ACMMP.h:50-54) -----------------------------------------
    # note: the reference's ``upsample`` flag (ACMMP.h:54) has no equivalent
    # here by design -- the in-kernel hypothesis JBU of RandomInitialization
    # mode (c) (ACMMP.cu:713-779) is replaced by a host-side JBU of the coarse
    # depth/normal fields before seeding (pass_runner.py), so no kernel needs
    # to know whether sizes differ.
    geom_consistency: bool = False
    planar_prior: bool = False
    multi_geometry: bool = False
    hierarchy: bool = False

    # -- propagation / view selection constants (ACMMP.cu) ------------------
    num_votes: int = 15              # importance-sample votes (ACMMP.cu:1187)
    view_prior_selected: float = 0.9  # neighbor-selected prior (ACMMP.cu:1154)
    view_prior_unselected: float = 0.1  # (ACMMP.cu:1156)
    cost_threshold_base: float = 0.8  # anneal: 0.8*exp(-iter^2/90) (ACMMP.cu:1163)
    cost_threshold_anneal: float = 90.0
    view_weight_beta: float = 0.18   # exp(-c^2/0.18) good-view weight (ACMMP.cu:1170)
    view_fallback_beta: float = 0.32  # exp(-thr^2/0.32) fallback (ACMMP.cu:1181)
    bad_cost: float = 1.2            # "false" view threshold (ACMMP.cu:1173)
    max_bad_views: int = 3           # reject view if >=3 candidates cost >1.2 (ACMMP.cu:1177)
    min_good_candidates: int = 2     # need count>2 for the mean path (ACMMP.cu:1177)
    geom_weight_prop: float = 0.2    # geom cost weight in propagation (ACMMP.cu:1216)
    geom_weight_refine: float = 0.1  # geom cost weight in refinement (ACMMP.cu:890)
    # note: the reference's 0.1*3.0 penalty for invalid candidates in geom mode
    # (ACMMP.cu:1219) has no knob here: invalid candidate regions carry cost
    # +inf (a documented intended-semantics fix, see ops/propagate.py), so they
    # can never win the argmin and the penalty term is unreachable.
    geom_max_cost: float = 3.0       # geometric consistency clamp (ACMMP.cu:648)
    cost_max: float = 2.0            # NCC cost clamp (ACMMP.cu:414)

    # -- refinement (ACMMP.cu:797-936) ---------------------------------------
    refine_perturbation: float = 0.02  # depth window +-2%, normal 0.02*pi (ACMMP.cu:815)

    # -- fast windowed-NCC kernel (PERF.md; pinhole, TPU) ---------------------
    # Smooth cost evaluations (propagation candidates, current plane,
    # perturbed refinement candidates) run through the Pallas window kernel;
    # random-depth candidates and fresh-random first iterations stay on the
    # exact XLA path.  Off by default; the pipeline enables it on TPU pinhole
    # scenes.
    fast_ncc: bool = False
    # run the first iteration after fresh-random init on the exact path
    # (windows cover random fields poorly; measured on the goldens the
    # all-fast default loses no median accuracy because the exact
    # random-depth refinement evals keep exploring -- see PERF.md)
    exact_first_iteration: bool = False
    # epipolar-rectified NCC kernel (ops/pallas/ncc_rect.py): the fastest path
    # for photometric/hierarchy passes on rectifiable pinhole pairs.  The
    # pipeline enables it per problem after the host_rectifiable gate; prior
    # and geometric passes keep the windowed kernel (fast_ncc).
    rect_ncc: bool = False
    # static compute-grid size for the rectified kernel (rows, cols): the
    # warped-reference bbox from ops/rectify.rect_comp_shape (host-side, per
    # problem).  None = the full storage frame.  ~2x fewer kernel tiles at
    # the bench operating point.
    rect_comp_hw: "tuple[int, int] | None" = None
    # static live-tile budget of the compacted transport
    # (ops/rectify.rect_live_tile_count, host-side per problem): only tiles
    # inside the warped-reference footprint (~43% of the bbox at the bench
    # operating point) are gathered/computed.  None = keep every bbox tile.
    rect_live_n: "int | None" = None
    # static (WR, WC) window of the Pallas warp-gather transport
    # (ops/rectify.rect_warp_window, host-side per problem): the plane
    # coefficient transport onto the compacted live tiles runs as an
    # in-kernel windowed 2D gather instead of an XLA row-gather (measured
    # 91 vs 349 ms per C=9 invocation at the bench point).  None = XLA
    # row-gather transport.
    rect_warp_hw: "tuple[int, int] | None" = None
    # static live-tile budget of the SPHERE pole-rotated transport
    # (ops/sphere_rect.sphere_live_tile_count, host-side per problem): only
    # tiles inside the per-pair latitude caps (~87% of the frame at the
    # default 78 deg cap) are gathered/computed.  None = identity compaction.
    sphere_live_n: "int | None" = None
    # route the initial-field cost evaluation through the rectified kernel
    # too (instead of the exact path): safe whenever the problem's FULL
    # plausible disparity span fits the kernel's source window, so even a
    # fresh random field evaluates with full tap coverage
    # (ops/rectify.rect_span_fits, host-side per problem)
    rect_init: bool = False
    # static source-window width of the rectified kernel (128-aligned);
    # usable disparity span ~ width - 144.  384 default; the init eval uses
    # rect_init_win (512 covers the full plausible span of wide-range
    # scenes, where per-iteration evals only ever see narrow tile spans)
    rect_win_w: int = 384
    rect_init_win: int = 384
    # two-stage candidate evaluation in rect mode: rank the propagation /
    # refinement candidates with a coarse tap grid (radius_increment =
    # prescreen_increment, 9 taps instead of 36), then give ONLY the
    # per-pixel winner and the current plane the full-tap evaluation.  The
    # accept ratchet always compares full-tap costs, so a mis-ranked winner
    # costs convergence speed, never correctness.  The reference evaluates
    # every candidate at full taps (ACMMP.cu:1146-1228); this trades ~4x of
    # the dominant kernel work for slightly noisier candidate choice
    # (quality-gated on the goldens incl. the discontinuity scene).
    rect_prescreen: bool = False
    prescreen_increment: int = 5
    # bf16 pair-packing of the source window in the rect kernel's tap loop:
    # both bilinear neighbours of a tap ride one f32 lane (pack_ab), so each
    # tap pays ONE lane gather + ONE select per window chunk instead of two
    # of each.  Quantises sampled image values to bf16 (<= 0.5 greylevel,
    # <= 2^-9 relative) -- below sensor noise and the bicubic warp's
    # resampling error; the reference samples f32 textures bilinearly
    # (ACMMP.cu:425-495).  Static: both variants compile to separate
    # programs; A/B measured on hardware (PERF.md round 5).
    rect_tap_pack: bool = True
    # bf16 pair-packing of the backmapped cost planes: candidate pairs ride
    # one f32 lane through the per-pair wide-row backmap gather, halving its
    # per-element cost (the v5e gather model is ~16-30 ns/row + ~2-3
    # ns/element; PERF.md round 5 backmap probe: parity C=9 101 ms vs C=5
    # 73 ms).  Costs quantise to bf16 (<= 2^-8 relative, i.e. <= 0.008 at
    # cost_max=2) entering view selection / candidate argmin -- ties within
    # that width were already RNG-order-arbitrary; gated on the goldens
    # incl. discontinuity + hostile.  The reference keeps f32 costs
    # end-to-end (ACMMP.cu:1146-1228).
    rect_backmap_pack: bool = True
    # scatter-free transport-map attribution: build the fwd maps by
    # inverse-checking the 3x3 neighbourhood of H0^-1(c) per compute-grid
    # pixel (exact f32 forward re-verification) instead of the three
    # per-pass H*W-row scatter sweeps (an XLA scatter row costs ~14x a
    # gather row on v5e; PERF.md).  Static; set from the host gate
    # rectify.rect_inv_attrib_ok (requires the rect->orig local Lipschitz
    # bound < 2 so the 3x3 candidate set provably contains every claimant).
    # Collision winners become largest-flat-index-of-the-parity instead of
    # the scatter's backend-unspecified last-writer -- both deterministic
    # serializations of the reference's racy write order (SURVEY.md 5.2).
    rect_inv_attrib: bool = False

    # -- planar prior model (ACMMP.cu:818-824, 1249-1255) --------------------
    prior_gamma: float = 0.5
    prior_beta: float = 0.18
    prior_angle_sigma_deg: float = 5.0
    prior_depth_sigma_div: float = 64.0  # sigma_d = (dmax-dmin)/64
    prior_init_perturbation: float = 0.02  # init perturb 3*0.02 (ACMMP.cu:692-699)

    # -- hierarchy (ACMMP.cu:713-779, 1315-1320) -----------------------------
    hierarchy_commit_margin: float = 0.1  # commit only if cost improves by >0.1
    jbu_sigma_spatial: float = 0.5   # hypothesis-upsampling sigmas (ACMMP.cu:715-716)
    jbu_sigma_range: float = 25.5

    # -- median filter (ACMMP.cu:1366-1480) ----------------------------------
    filter_min_cost: float = 0.001   # pixels below keep their depth

    # number of source views actually present (ref counts num_images = 1+src;
    # we keep the padded source count separately in the problem batch).
    @property
    def prior_angle_sigma(self) -> float:
        return math.pi * self.prior_angle_sigma_deg / 180.0

    def with_geom(self, multi_geometry: bool) -> "PatchMatchParams":
        """SetGeomConsistencyParams (reference ACMMP.cpp:548-555)."""
        return dataclasses.replace(
            self, geom_consistency=True, max_iterations=2, multi_geometry=multi_geometry
        )

    def with_hierarchy(self) -> "PatchMatchParams":
        return dataclasses.replace(self, hierarchy=True)

    def with_planar_prior(self) -> "PatchMatchParams":
        return dataclasses.replace(self, planar_prior=True)

    def with_depth_range(self, dmin: float, dmax: float) -> "PatchMatchParams":
        return dataclasses.replace(self, depth_min=float(dmin), depth_max=float(dmax))


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Planar-prior construction (host side; reference ACMMP.cpp:904-1011)."""

    cell_size: int = 5               # support-point grid (ACMMP.cpp:907)
    support_cost_threshold: float = 0.1  # (ACMMP.cpp:925)


@dataclasses.dataclass(frozen=True)
class FusionParams:
    """GPU-path fusion thresholds (the path the reference actually runs,
    ACMMP.cu:1758-1778). The stricter of the two reference fusion variants."""

    max_reproj_error: float = 1.0
    max_rel_depth_diff: float = 0.01
    max_normal_angle: float = 0.149  # radians
    min_consistent: int = 3          # including the reference view itself
    max_src_views: int = 32          # FusionProblem cap (ACMMP.cu:1659)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Coarse-to-fine driver settings (reference main.cpp:392-482)."""

    patchmatch: PatchMatchParams = PatchMatchParams()
    prior: PriorConfig = PriorConfig()
    fusion: FusionParams = FusionParams()

    size_bound: int = 1000           # pyramid coarsest bound (main.cpp:38)
    geom_iterations: int = 2         # geometric passes per scale (main.cpp:412)
    depth_min_scale: float = 0.6     # working range padding (ACMMP.cpp:645-646)
    depth_max_scale: float = 1.2
    planar_prior: bool = True        # run the prior-assisted second round
    fast_ncc: str = "auto"           # windowed NCC kernel: "auto" = on for
                                     # TPU pinhole scenes, "on", "off"
    rect_ncc: str = "auto"           # epipolar-rectified NCC kernel: "auto" =
                                     # on for TPU pinhole problems passing the
                                     # host_rectifiable gate, "on", "off"
    seed: int = 0                    # global RNG seed (reference used clock64();
                                     # we are deterministic by design)
    max_src_views: int = 20          # pad/truncate source views per problem
                                     # (converter default top_k, colmap2mvsnet_acm.py:424)
    skip_if_complete: bool = False   # resume support: skip passes whose outputs exist
    # scene-wide unified static rect-kernel settings for the current scale:
    # (comp_hw, live_n, iwin_pinhole, iwin_sphere) from
    # pass_runner.compute_scene_rect_settings, set per scale by run_pipeline
    # so every problem shares ONE compiled program per pass variant (the
    # reference pays zero recompiles, main.cpp:392-482).  None = derive
    # per problem (standalone process_problem calls).
    rect_unify: "tuple | None" = None
    tile_shard: int = 1              # intra-image tile parallelism: shard
                                     # each depth map along the image width
                                     # over this many local devices (GSPMD
                                     # halo exchange; parallel/tile.py).  For
                                     # frames too large for one chip; forces
                                     # the exact array-program path and
                                     # disables view batching.
    batch_problems: str = "auto"     # device-batched pass execution over the
                                     # local view mesh (pipeline/batch_runner):
                                     # "auto" = on when >1 local device,
                                     # "on", "off".  Replaces the reference's
                                     # strictly serial per-image loop
                                     # (main.cpp:431-446)
    ctx_reuse: str = "auto"          # cross-pass reuse of the rect working
                                     # set: the warped frames / transport
                                     # maps / packed tables of one (image,
                                     # scale) are pure functions of (images,
                                     # cameras, depth range) and so are
                                     # IDENTICAL across its photometric +
                                     # geometric passes -- cache them
                                     # device-resident and rebuild only the
                                     # warped source disparities per geom
                                     # pass (the reference re-uploads its
                                     # textures per pass, ACMMP.cpp:681-845).
                                     # "auto" = on for TPU serial split-mode
                                     # passes, "on", "off".  Bounded by
                                     # ctx_cache_mb; needs split_iterations.
    ctx_cache_mb: int = 3072         # device-memory budget for the context
                                     # cache (per scale, all images); images
                                     # beyond the budget rebuild per pass
    split_iterations: str = "auto"   # run each pass stage (init, every
                                     # half-step, extraction) as its OWN
                                     # compiled program: "auto" = on for TPU
                                     # serial passes, "on", "off".  Costs ~4%
                                     # (no cross-stage fusion) and buys
                                     # immunity to the v5e fused-program
                                     # worker crashes at some shape classes
                                     # (round-3 scan fault; round-5 seeded
                                     # 800x600 fault -- PERF.md round 5,
                                     # scripts/repro_e2e_fault.py)


DEFAULT_CONFIG = PipelineConfig()
