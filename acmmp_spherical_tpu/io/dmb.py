"""The ``.dmb`` binary raster format.

Byte-compatible with the reference codec (reference ACMMP.cpp:363-479):
little-endian header of four int32s ``(type=1, h, w, nb)`` followed by
``h*w*nb`` float32s, row-major, channel-interleaved.

These files are the pipeline's inter-pass persistence layer and therefore its
checkpoint format (SURVEY.md section 5.4): every pass can be re-seeded purely
from the ``.dmb`` outputs of the previous pass.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_HEADER = struct.Struct("<iiii")
_DMB_TYPE_FLOAT = 1


def read_dmb(path: str | os.PathLike) -> np.ndarray:
    """Read a .dmb file -> (h, w) float32 or (h, w, nb) float32 array."""
    from acmmp_spherical_tpu.io import native

    if native.available():
        return native.dmb_read(path)
    with open(path, "rb") as f:
        raw = f.read()
    dtype_tag, h, w, nb = _HEADER.unpack_from(raw, 0)
    if dtype_tag != _DMB_TYPE_FLOAT:
        raise ValueError(f"{path}: unsupported dmb type {dtype_tag}")
    data = np.frombuffer(raw, np.float32, count=h * w * nb, offset=_HEADER.size)
    return data.reshape(h, w) if nb == 1 else data.reshape(h, w, nb)


def write_dmb(path: str | os.PathLike, array: np.ndarray) -> None:
    """Write an (h, w) or (h, w, nb) float32 array as .dmb."""
    from acmmp_spherical_tpu.io import native

    array = np.ascontiguousarray(array, np.float32)
    if array.ndim in (2, 3) and native.available():
        native.dmb_write(path, array)
        return
    if array.ndim == 2:
        h, w, nb = *array.shape, 1
    elif array.ndim == 3:
        h, w, nb = array.shape
    else:
        raise ValueError(f"dmb arrays must be 2D or 3D, got {array.shape}")
    with open(path, "wb") as f:
        f.write(_HEADER.pack(_DMB_TYPE_FLOAT, h, w, nb))
        f.write(array.tobytes())


def read_depth_dmb(path) -> np.ndarray:
    a = read_dmb(path)
    if a.ndim != 2:
        raise ValueError(f"{path}: expected single-channel depth, got {a.shape}")
    return a


def read_normal_dmb(path) -> np.ndarray:
    a = read_dmb(path)
    if a.ndim != 3 or a.shape[-1] != 3:
        raise ValueError(f"{path}: expected 3-channel normals, got {a.shape}")
    return a
