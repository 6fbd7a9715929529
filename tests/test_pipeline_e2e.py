"""End-to-end pipeline test (BASELINE.json config 1: a small pinhole scene run
from the on-disk layout through photometric + planar-prior + geometric passes
to a fused point cloud)."""

import numpy as np
import pytest

from acmmp_spherical_tpu.config import PipelineConfig
from acmmp_spherical_tpu.core.camera import PINHOLE
from acmmp_spherical_tpu.io import read_ply
from acmmp_spherical_tpu.io.dmb import read_depth_dmb
from acmmp_spherical_tpu.pipeline.multiscale import run_pipeline
from acmmp_spherical_tpu.utils.metrics import (
    cube_surface_distance, depth_error_stats,
)
from acmmp_spherical_tpu.utils.synthetic import (
    CubeRoom, make_ring_of_cameras, render_scene, write_synthetic_scene_to_disk,
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene") / "dense"
    scene = CubeRoom()
    W, H, n = 64, 48, 5
    cams = make_ring_of_cameras(n, model=PINHOLE, width=W, height=H, focal=56.0)
    images, depths, normals = render_scene(cams, scene, W, H)
    sp = write_synthetic_scene_to_disk(root, cams, images)
    return root, scene, depths


def test_full_pipeline_small_pinhole(scene_dir):
    root, scene, gt_depths = scene_dir
    cfg = PipelineConfig()
    n_points = run_pipeline(root, cfg)

    # per-view geometric depth maps exist and are accurate
    from acmmp_spherical_tpu.io.scene import ScenePaths

    sp = ScenePaths(root)
    d0 = read_depth_dmb(sp.depth_file(0, geom=True))
    stats = depth_error_stats(d0, gt_depths[0])
    assert stats["median_rel_err"] < 0.02, stats

    # fused cloud: enough points, on the cube surface
    assert n_points > 2000, n_points
    pts, nrm, col = read_ply(sp.ply_file())
    dist = cube_surface_distance(pts, scene.half)
    acc = np.mean(dist < 0.08)  # 1% of the 8-unit room
    assert acc > 0.9, f"only {acc:.2%} of fused points within tau"

    # costs/normals written for every view
    for i in range(5):
        assert sp.normal_file(i).exists()
        assert sp.cost_file(i).exists()
        assert (sp.result_dir(i) / "triangulation.png").exists()


def test_pipeline_resume_skips(scene_dir):
    root, *_ = scene_dir
    import dataclasses

    cfg = dataclasses.replace(PipelineConfig(), skip_if_complete=True)
    # second run with resume: all passes skip, fusion still runs
    import time

    t0 = time.time()
    n_points = run_pipeline(root, cfg)
    assert n_points > 2000
    assert time.time() - t0 < 60.0  # no recompute of the patchmatch passes
