from coalign_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate)
from coalign_tpu.parallel.distributed import (  # noqa: F401
    get_dist_info, init_distributed_mode)
