"""Multi-host initialization + environment detection.

TPU-native counterpart of ref opencood/tools/multi_gpu_utils.py:16-38
(init_distributed_mode / get_dist_info): instead of NCCL process groups,
multi-host JAX forms one global device mesh over DCN via
jax.distributed.initialize; rank/world come from the standard env vars the
reference reads (RANK / WORLD_SIZE, SLURM_PROCID) or the coordinator
address.
"""

from __future__ import annotations

import os


def detect_env():
    """Returns (rank, world_size, coordinator) from env/SLURM, or None."""
    if "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        rank = int(os.environ["RANK"])
        world = int(os.environ["WORLD_SIZE"])
    elif "SLURM_PROCID" in os.environ:
        rank = int(os.environ["SLURM_PROCID"])
        world = int(os.environ.get("SLURM_NTASKS", "1"))
    else:
        return None
    coord = os.environ.get("COORDINATOR_ADDRESS",
                           os.environ.get("MASTER_ADDR", "127.0.0.1")
                           + ":" + os.environ.get("MASTER_PORT", "8476"))
    return rank, world, coord


def init_distributed_mode() -> dict:
    """Initialize multi-host JAX when launched under a multi-process
    environment; no-op (single process) otherwise.

    Returns {'rank', 'world_size', 'distributed'}.
    """
    import jax

    env = detect_env()
    if env is None or env[1] <= 1:
        return {"rank": 0, "world_size": 1, "distributed": False}
    rank, world, coord = env
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=world, process_id=rank)
    return {"rank": rank, "world_size": world, "distributed": True}


def get_dist_info() -> tuple:
    """(rank, world_size) — mirrors ref multi_gpu_utils.get_dist_info."""
    import jax

    return jax.process_index(), jax.process_count()
