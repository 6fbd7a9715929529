"""Planar-prior construction (host side).

Mirrors the reference's host pipeline (ACMMP.cpp:904-1011, main.cpp:113-197):

1. support points: the minimum-cost pixel of every 5x5 cell with cost < 0.1;
2. Delaunay triangulation of the support points (scipy.spatial.Delaunay in
   place of cv::Subdiv2D -- both produce a Delaunay triangulation of the same
   point set);
3. per-triangle plane fit: SVD null-space of the homogeneous 3-point system on
   the ref-camera-frame 3D points, sign-normalised (GetPriorPlaneParams);
4. triangle rasterisation into a label mask.  The reference steps barycentric
   coordinates at 1/max-edge-length, which leaves holes on sliver triangles;
   we rasterise exactly (cv2.fillPoly) -- a documented improvement;
5. prior depth validation: pixels whose prior-plane depth falls outside the
   working range are unmasked (main.cpp:168-181).
"""

from __future__ import annotations

import numpy as np

from acmmp_spherical_tpu.config import PriorConfig
from acmmp_spherical_tpu.core.camera import Camera
from acmmp_spherical_tpu.core import geometry as G


def get_support_points(cost: np.ndarray, cfg: PriorConfig) -> np.ndarray:
    """(N, 2) int (x, y) minimum-cost support points (ACMMP.cpp:904-930)."""
    from acmmp_spherical_tpu.io import native

    cost = np.ascontiguousarray(cost, np.float32)
    if native.available():
        return native.support_points(cost, cfg.cell_size,
                                     cfg.support_cost_threshold)
    H, W = cost.shape
    cs = cfg.cell_size
    pts = []
    for row in range(0, H, cs):
        for col in range(0, W, cs):
            block = cost[row:row + cs, col:col + cs]
            idx = np.argmin(block)
            r, c = np.unravel_index(idx, block.shape)
            if block[r, c] < cfg.support_cost_threshold:
                pts.append((col + c, row + r))
    return np.asarray(pts, np.int32).reshape(-1, 2)


def triangulate(points: np.ndarray) -> np.ndarray:
    """(T, 3, 2) triangle vertices via Delaunay (ACMMP.cpp:932-954)."""
    if len(points) < 3:
        return np.zeros((0, 3, 2), np.int32)
    from scipy.spatial import Delaunay, QhullError

    try:
        tri = Delaunay(points.astype(np.float64))
    except QhullError:
        return np.zeros((0, 3, 2), np.int32)
    return points[tri.simplices]


def fit_plane(cam: Camera, depth: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Plane (nx, ny, nz, w) through a triangle's 3 ref-cam 3D points
    (GetPriorPlaneParams, ACMMP.cpp:956-989)."""
    xs = tri[:, 0].astype(np.float32)
    ys = tri[:, 1].astype(np.float32)
    ds = depth[tri[:, 1], tri[:, 0]].astype(np.float32)
    X = np.asarray(G.unproject_cam(cam, xs, ys, ds))  # (3, 3)
    A = np.concatenate([X, np.ones((3, 1), np.float32)], axis=1)
    # SVD null-space (cv::SVD::solveZ equivalent)
    _, _, vt = np.linalg.svd(A)
    n4 = vt[-1]
    norm = np.linalg.norm(n4[:3])
    if n4[3] < 0:
        norm = -norm
    if norm == 0:
        return np.array([0, 0, -1, 0], np.float32)
    return (n4 / norm).astype(np.float32)


def build_planar_prior(
    cam: Camera,
    depth: np.ndarray,
    cost: np.ndarray,
    depth_min: float,
    depth_max: float,
    cfg: PriorConfig,
):
    """Full prior construction.

    Returns (prior_normal (H, W, 3), prior_w (H, W), mask (H, W) bool,
    triangles (T, 3, 2)) -- triangles returned for the diagnostic overlay.
    """
    import cv2

    H, W = depth.shape
    pts = get_support_points(cost, cfg)
    tris = triangulate(pts)

    mask_idx = np.zeros((H, W), np.int32)
    planes = []
    kept = []
    for t, tri in enumerate(tris):
        if (tri[:, 0] < 0).any() or (tri[:, 0] >= W).any() or \
           (tri[:, 1] < 0).any() or (tri[:, 1] >= H).any():
            continue
        planes.append(fit_plane(cam, depth, tri))
        kept.append(tri)
        cv2.fillPoly(mask_idx, [tri.astype(np.int32)], len(planes))

    prior_normal = np.zeros((H, W, 3), np.float32)
    prior_normal[..., 2] = -1.0
    prior_w = np.zeros((H, W), np.float32)
    mask = mask_idx > 0
    if planes:
        planes = np.stack(planes)  # (T, 4)
        lab = mask_idx[mask] - 1
        prior_normal[mask] = planes[lab, :3]
        prior_w[mask] = planes[lab, 3]

        # validate prior depths against the working range (main.cpp:168-181)
        ys, xs = np.nonzero(mask)
        n = prior_normal[ys, xs]
        w = prior_w[ys, xs]
        d = np.asarray(
            G.depth_from_plane(cam, xs.astype(np.float32), ys.astype(np.float32),
                               n, w)
        )
        ok = (d >= depth_min) & (d <= depth_max)
        mask[ys[~ok], xs[~ok]] = False

    return prior_normal, prior_w, mask, np.asarray(kept).reshape(-1, 3, 2)


def draw_triangulation(image_gray: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Diagnostic overlay like the reference's triangulation.png
    (main.cpp:122-137)."""
    import cv2

    img = np.clip(image_gray, 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    for tri in triangles:
        for a, b in ((0, 1), (0, 2), (1, 2)):
            cv2.line(rgb, tuple(tri[a]), tuple(tri[b]), (255, 0, 0))
    return rgb
