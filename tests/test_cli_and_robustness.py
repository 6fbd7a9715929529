"""CLI entry points and failure-tolerance behavior (SURVEY.md 5.3)."""

import numpy as np
import pytest

from acmmp_spherical_tpu.pipeline.cli import main as cli_main


def test_cli_help_and_parsing(capsys):
    with pytest.raises(SystemExit):
        cli_main(["--help"])
    with pytest.raises(SystemExit):
        cli_main([])  # subcommand required


def test_fusion_skips_missing_views(tmp_path):
    """Fusion must gracefully skip views with missing results
    (reference ACMMP.cu:1847-1866)."""
    from acmmp_spherical_tpu.config import PipelineConfig
    from acmmp_spherical_tpu.core.camera import PINHOLE
    from acmmp_spherical_tpu.io.dmb import write_dmb
    from acmmp_spherical_tpu.io.scene import ScenePaths, read_pair_file
    from acmmp_spherical_tpu.pipeline.multiscale import run_fusion
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene, write_synthetic_scene_to_disk,
    )

    scene = CubeRoom()
    W, H, n = 48, 36, 5
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=44.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    root = tmp_path / "dense"
    sp = write_synthetic_scene_to_disk(root, cams, images)
    problems = read_pair_file(sp.pair_file)

    # write GT results for all but view 3
    for i in range(n):
        if i == 3:
            continue
        sp.result_dir(i).mkdir(parents=True, exist_ok=True)
        write_dmb(sp.depth_file(i, geom=True), depths[i])
        write_dmb(sp.normal_file(i), normals[i])

    n_pts = run_fusion(sp, problems, PipelineConfig(), geom=True)
    assert n_pts > 0  # fused from the 4 available views
    pts = n_pts


def test_corrupt_dmb_raises_cleanly(tmp_path):
    from acmmp_spherical_tpu.io.dmb import read_dmb

    p = tmp_path / "bad.dmb"
    p.write_bytes(b"\x07\x00\x00\x00" + b"\x00" * 12)  # wrong type tag
    with pytest.raises(Exception):
        read_dmb(p)


def test_empty_problem_no_sources(tmp_path):
    """A problem with zero source views must not crash the pass runner
    (all views padded-invalid -> cost_max everywhere)."""
    import jax
    import jax.numpy as jnp

    from acmmp_spherical_tpu.config import PatchMatchParams
    from acmmp_spherical_tpu.core.camera import stack_cameras
    from acmmp_spherical_tpu.ops.propagate import PatchMatchInputs
    from acmmp_spherical_tpu.pipeline.patchmatch import run_patchmatch
    from acmmp_spherical_tpu.utils.synthetic import (
        CubeRoom, make_ring_of_cameras, render_scene,
    )

    cams = make_ring_of_cameras(2, width=32, height=24, focal=28.0)
    images, _, _ = render_scene(cams, CubeRoom(), 32, 24)
    dmin, dmax = np.asarray(cams[0].depth_range)
    params = PatchMatchParams(max_iterations=1).with_depth_range(dmin, dmax)
    inputs = PatchMatchInputs(
        ref_image=jnp.asarray(images[0]),
        src_images=jnp.asarray(images[1:]),
        ref_cam=cams[0],
        src_cams=stack_cameras(cams[1:]),
        src_valid=jnp.zeros(1, bool),   # no valid sources
    )
    depth, normal, cost, _ = run_patchmatch(inputs, params, jax.random.key(0))
    assert np.isfinite(np.asarray(depth)).all()
    np.testing.assert_allclose(np.asarray(cost), 2.0)  # cost_max everywhere
