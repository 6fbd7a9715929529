from acmmp_spherical_tpu.parallel.mesh import (  # noqa: F401
    make_view_mesh,
    make_view_tile_mesh,
    shard_batch_over_views,
)
from acmmp_spherical_tpu.parallel.view_parallel import (  # noqa: F401
    ProblemBatch,
    multichip_train_step,
)
