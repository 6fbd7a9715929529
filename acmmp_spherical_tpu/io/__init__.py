from acmmp_spherical_tpu.io.dmb import (  # noqa: F401
    read_dmb,
    write_dmb,
    read_depth_dmb,
    read_normal_dmb,
)
from acmmp_spherical_tpu.io.ply import write_ply, read_ply  # noqa: F401
from acmmp_spherical_tpu.io.scene import (  # noqa: F401
    Problem,
    ScenePaths,
    read_camera_file,
    write_camera_file,
    read_pair_file,
    write_pair_file,
    load_image_gray,
    load_image_color,
    rescale_to_max_size,
)
