"""Golden-file regression fixture (SURVEY test strategy / ROADMAP).

One seeded photometric pass on the analytic golden, summarised by regional
statistics and compared against a committed snapshot.  The quality gates
elsewhere bound *error*; this fixture detects unintended *behavioral* drift
(a change that moves estimates around while medians stay fine).  Statistics
(not raw dmb bytes) make the fixture robust to benign jaxlib changes; the
tolerance is far tighter than any quality gate.

Two variants are snapshotted: the exact path and the production rectified
path (``rect_ncc=True``; interpret-mode Mosaic on CPU).  The SAME fixtures
also gate the TPU backend via ``scripts/drift_gate.py`` (VERDICT r2 weak #7:
a Mosaic numeric regression on hardware must not pass CI silently) -- run it
on a TPU host to produce DRIFT_rN.json.

Regenerate deliberately after an intended algorithm change:
    python tests/test_regression_fixture.py --regen
"""

import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

import pytest

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_pass_stats.json"
FIXTURE_RECT = (pathlib.Path(__file__).parent / "fixtures"
                / "golden_pass_stats_rect.json")
FIXTURE_WARP = (pathlib.Path(__file__).parent / "fixtures"
                / "golden_pass_stats_warp.json")


def _run_golden_pass(rect: bool = False, warp: bool = False):
    import dataclasses

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import PINHOLE, stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    W, H, n = 96, 64, 4
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H,
                                focal=80.0)
    images, depths, _ = render_scene(cams, CubeRoom(), W, H)
    images = jnp.asarray(images)
    dr = jnp.asarray(np.asarray(cams[0].depth_range), jnp.float32)
    inputs = PatchMatchInputs(
        ref_image=images[0], src_images=images[1:], ref_cam=cams[0],
        src_cams=stack_cameras(cams[1:]), src_valid=jnp.ones(n - 1, bool),
        depth_range=dr,
    )
    params = PatchMatchParams()
    if rect:
        from acmmp_spherical_tpu.ops.rectify import (
            rect_comp_shape, rect_init_window, rect_live_tile_count,
            rect_shape, rect_warp_window,
        )

        rhw = rect_shape(H, W)
        stacked = stack_cameras(cams[1:])
        chw = rect_comp_shape(cams[0], stacked, rhw)
        iwin = rect_init_window(cams[0], stacked, rhw)
        whw = rect_warp_window(cams[0], stacked, rhw) if warp else None
        assert whw is not None or not warp
        params = dataclasses.replace(
            params, rect_ncc=True, rect_comp_hw=chw,
            rect_live_n=rect_live_tile_count(cams[0], stacked, rhw, chw),
            rect_init=iwin > 0, rect_init_win=iwin or 384,
            rect_warp_hw=whw)
    d, nrm, cost, _ = run_patchmatch(inputs, params, jax.random.key(2333))
    return np.asarray(d), np.asarray(nrm), np.asarray(cost)


def _stats(d, nrm, cost):
    out = {}
    H, W = d.shape
    for qi, sl in enumerate([np.s_[: H // 2, : W // 2],
                             np.s_[: H // 2, W // 2:],
                             np.s_[H // 2:, : W // 2],
                             np.s_[H // 2:, W // 2:]]):
        out[f"depth_mean_q{qi}"] = float(np.mean(d[sl]))
        out[f"depth_median_q{qi}"] = float(np.median(d[sl]))
        out[f"cost_mean_q{qi}"] = float(np.mean(cost[sl]))
    out["normal_mean_abs"] = float(np.mean(np.abs(nrm)))
    out["depth_p10"] = float(np.percentile(d, 10))
    out["depth_p90"] = float(np.percentile(d, 90))
    return out


def check_against_fixture(stats: dict, ref: dict, *, rtol: float = 2e-3,
                          atol: float = 2e-3):
    for k, v in ref.items():
        assert abs(stats[k] - v) <= max(atol, rtol * abs(v)), (
            k, stats[k], v,
            "intended change? regenerate: python "
            "tests/test_regression_fixture.py --regen")


def test_golden_pass_regression():
    stats = _stats(*_run_golden_pass())
    check_against_fixture(stats, json.loads(FIXTURE.read_text()))


@pytest.mark.slow
def test_golden_pass_regression_rect():
    """The production rectified path against its committed snapshot
    (interpret-mode Mosaic on CPU; the TPU counterpart is
    scripts/drift_gate.py)."""
    stats = _stats(*_run_golden_pass(rect=True))
    check_against_fixture(stats, json.loads(FIXTURE_RECT.read_text()))


@pytest.mark.slow
def test_golden_pass_regression_warp():
    """The rect path with the round-4 warp-gather transport + kernelised
    source warp (the production TPU configuration) against its snapshot."""
    stats = _stats(*_run_golden_pass(rect=True, warp=True))
    check_against_fixture(stats, json.loads(FIXTURE_WARP.read_text()))


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
        FIXTURE.parent.mkdir(parents=True, exist_ok=True)
        FIXTURE.write_text(json.dumps(_stats(*_run_golden_pass()), indent=1))
        FIXTURE_RECT.write_text(
            json.dumps(_stats(*_run_golden_pass(rect=True)), indent=1))
        FIXTURE_WARP.write_text(
            json.dumps(_stats(*_run_golden_pass(rect=True, warp=True)),
                       indent=1))
        print(f"wrote {FIXTURE}, {FIXTURE_RECT} and {FIXTURE_WARP}")
