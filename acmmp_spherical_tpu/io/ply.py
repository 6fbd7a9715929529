"""Binary PLY point-cloud writer/reader.

Produces the same vertex layout as the reference
(reference ACMMP.cpp:481-534): little-endian ``x y z nx ny nz`` float32 +
``red green blue`` uint8.  Unlike the reference's OpenMP loop with a critical
section around every 27-byte vertex, this is a single vectorised numpy pack --
orders of magnitude faster on the host and deterministic in point order.

Note: the reference's CUDA fusion path stores colors as (R, G, B) in
``PointList.color`` but the PLY writer then assumes (B, G, R), so its output
has red/blue swapped (ACMMP.cu:1703-1707 vs ACMMP.cpp:510-512).  We write true
RGB.
"""

from __future__ import annotations

import numpy as np

_DTYPE = np.dtype(
    [
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1"),
    ]
)


def write_ply(path, points: np.ndarray, normals: np.ndarray, colors: np.ndarray) -> None:
    """Write a colored, normal-equipped point cloud.

    ``points``/``normals``: (N, 3) float; ``colors``: (N, 3) in 0..255 (RGB).
    Non-finite coordinates are zeroed like the reference (ACMMP.cpp:514-518).
    """
    from acmmp_spherical_tpu.io import native

    if native.available():
        native.ply_write(path, points, normals, colors)
        return
    n = len(points)
    points = np.asarray(points, np.float32)
    points = np.where(np.isfinite(points), points, 0.0)
    rec = np.empty(n, _DTYPE)
    rec["x"], rec["y"], rec["z"] = points.T
    nrm = np.asarray(normals, np.float32)
    rec["nx"], rec["ny"], rec["nz"] = nrm.T
    col = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
    rec["red"], rec["green"], rec["blue"] = col.T

    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def read_ply(path):
    """Read a PLY written by :func:`write_ply` (for tests / quality metrics).

    Returns (points, normals, colors) arrays.
    """
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated PLY header")
            header += line
        lines = header.decode("ascii").splitlines()
        n = None
        for ln in lines:
            if ln.startswith("element vertex"):
                n = int(ln.split()[-1])
        if n is None:
            raise ValueError(f"{path}: no vertex element")
        rec = np.frombuffer(f.read(n * _DTYPE.itemsize), _DTYPE)
    points = np.stack([rec["x"], rec["y"], rec["z"]], -1)
    normals = np.stack([rec["nx"], rec["ny"], rec["nz"]], -1)
    colors = np.stack([rec["red"], rec["green"], rec["blue"]], -1)
    return points, normals, colors
