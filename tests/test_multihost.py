"""Multi-host DCN path smoke test: two CPU processes form one JAX
distributed system via parallel/distributed.init_distributed_mode and run a
global psum (ref counterpart: opencood/tools/multi_gpu_utils.py:16-38 NCCL
init + all-reduce). Exercises the code path the single-process suite
cannot: jax.distributed.initialize + cross-process collectives."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from coalign_tpu.parallel.distributed import (get_dist_info,
                                              init_distributed_mode)
info = init_distributed_mode()
assert info["distributed"], info
rank, world = get_dist_info()
assert world == 2, (rank, world)
import jax.numpy as jnp
from jax.experimental import multihost_utils
# each process contributes rank+1; global sum over DCN must be 3
total = multihost_utils.process_allgather(jnp.asarray([rank + 1.0])).sum()
assert float(total) == 3.0, float(total)
print(f"RANK{rank} OK total={float(total)}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(RANK=str(rank), WORLD_SIZE="2",
                   MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.pathsep.join(sys.path))
        env.pop("XLA_FLAGS", None)  # no virtual device forcing here
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK" in out
