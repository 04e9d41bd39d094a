"""Torch-free reader for PyTorch ``.pth`` checkpoints.

The reference framework's entire eval story is checkpoint-driven
(ref opencood/tools/train_utils.py:29-74 load_saved_model); to let a
reference user bring their trained models to this framework we read the
torch serialization format directly with numpy — no torch import.

A modern ``torch.save`` file is a zip archive::

    <stem>/data.pkl      pickle (protocol 2) of the object graph; tensors
                         are ``torch._utils._rebuild_tensor_v2(storage,
                         offset, size, stride, requires_grad, hooks)`` where
                         ``storage`` is a pickle *persistent id*
                         ``('storage', StorageClass, key, location, numel)``
    <stem>/data/<key>    the raw little-endian storage bytes
    <stem>/byteorder     'little' (big-endian files are rejected)

We run the pickle with a restricted Unpickler: only the handful of
torch/numpy globals a state_dict needs are resolved, everything else
raises — so the reader is also safe against arbitrary-code pickles.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

# torch storage class name -> numpy dtype. BFloat16/Half promote cleanly
# to float32 downstream; bfloat16 has no numpy dtype so we decode manually.
_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",
}


class _Storage:
    """Lazy handle to one raw storage inside the zip."""

    def __init__(self, zf: zipfile.ZipFile, name: str, dtype, numel: int):
        self.zf = zf
        self.name = name
        self.dtype = dtype
        self.numel = numel
        self._data = None

    def data(self) -> np.ndarray:
        if self._data is None:
            raw = self.zf.read(self.name)
            if self.dtype == "bfloat16":
                # bf16 = top 16 bits of an f32
                u16 = np.frombuffer(raw, np.uint16, count=self.numel)
                self._data = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                self._data = np.frombuffer(raw, self.dtype, count=self.numel)
        return self._data


def _rebuild_tensor_v2(storage: _Storage, offset, size, stride,
                       requires_grad=False, hooks=None, metadata=None):
    flat = storage.data()
    if not size:  # 0-dim tensor (e.g. BatchNorm num_batches_tracked)
        return flat[offset:offset + 1].reshape(()).copy()
    itemsize = flat.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        flat[offset:], shape=tuple(size),
        strides=tuple(s * itemsize for s in stride)).copy()


def _rebuild_parameter(tensor, requires_grad=False, hooks=None):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES and module.startswith("torch"):
            return ("storage_class", _STORAGE_DTYPES[name])
        allowed = {
            ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
            ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
            ("collections", "OrderedDict"): OrderedDict,
            ("torch.serialization", "_get_layout"): lambda name: None,
            ("numpy.core.multiarray", "scalar"): (
                lambda dtype, raw: np.frombuffer(raw, dtype)[0]),
            ("numpy.core.multiarray", "_reconstruct"): (
                lambda cls, shape, dt: np.empty(shape, dt)),
            ("numpy", "dtype"): np.dtype,
            ("numpy", "ndarray"): np.ndarray,
        }
        try:
            return allowed[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"refusing to unpickle global {module}.{name} "
                f"(not part of a plain state_dict)")

    def persistent_load(self, pid):
        kind, storage_class, key, _location, numel = pid
        assert kind == "storage", pid
        tag, dtype = storage_class
        assert tag == "storage_class", storage_class
        return _Storage(self.zf, f"{self.prefix}/data/{key}", dtype, numel)


def load_torch_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """Read a torch-format checkpoint into ``{key: numpy array}``.

    Handles both a bare ``state_dict`` and the common
    ``{'model_state_dict'|'state_dict'|'model': sd, ...}`` wrappers the
    reference writes (ref train_utils.py:60 ``torch.load`` of
    ``net_epoch*.pth``).
    """
    zf = zipfile.ZipFile(path)
    pkl = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl:
        raise ValueError(f"{path}: not a torch zip checkpoint "
                         "(legacy tar format is not supported)")
    prefix = pkl[0][: -len("/data.pkl")]
    try:
        bo = zf.read(f"{prefix}/byteorder").decode().strip()
        if bo != "little":
            raise ValueError(f"{path}: {bo}-endian checkpoints unsupported")
    except KeyError:
        pass  # older files have no byteorder record; they are little-endian
    obj = _Unpickler(io.BytesIO(zf.read(pkl[0])), zf, prefix).load()
    for wrapper in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and wrapper in obj \
                and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
            break
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: top-level object is {type(obj)}, "
                         "expected a state_dict")
    return OrderedDict(
        (k, v) for k, v in obj.items() if isinstance(v, np.ndarray))
