from acmmp_spherical_tpu.core.camera import (  # noqa: F401
    PINHOLE,
    SPHERE,
    Camera,
    Cameras,
    stack_cameras,
    camera_center,
)
from acmmp_spherical_tpu.core import geometry  # noqa: F401
