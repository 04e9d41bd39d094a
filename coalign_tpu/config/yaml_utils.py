"""YAML "hypes" loading with derived-parameter computation.

Mirrors the reference config schema (opencood/hypes_yaml/yaml_utils.py) so
reference experiment YAMLs drive this framework unchanged, but replaces the
``eval(param['yaml_parser'])`` reflection with an explicit registry.
"""

from __future__ import annotations

import math
import re

import numpy as np
import yaml

_FLOAT_RESOLVER = re.compile(
    r"""^(?:
     [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _Loader(yaml.SafeLoader):
    pass


# recognize 1e-10-style floats (plain pyyaml treats them as strings,
# ref yaml_utils.py:35-44)
_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_RESOLVER, list("-+0123456789."))


def load_yaml(path: str) -> dict:
    """Load a hypes yaml and apply its declared derived-param parser."""
    with open(path, "r") as f:
        param = yaml.load(f, Loader=_Loader)
    parser_name = param.get("yaml_parser")
    if parser_name:
        param = PARSERS[parser_name](param)
    return param


def save_yaml(data: dict, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(data), f, default_flow_style=None)


def _to_plain(obj):
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def _fill_anchor_grid_args(param: dict) -> dict:
    """Shared W/H/D + voxel-size bookkeeping (ref yaml_utils.py:117-137).
    No-op for anchor-free configs (PIXOR's BevPostprocessor)."""
    if ("voxel_size" not in param["preprocess"].get("args", {})
            or "anchor_args" not in param["postprocess"]):
        return param
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    anchor_args = param["postprocess"]["anchor_args"]
    vw, vh, vd = voxel_size
    anchor_args["vw"] = vw
    anchor_args["vh"] = vh
    anchor_args["vd"] = vd
    anchor_args["W"] = math.ceil((cav_lidar_range[3] - cav_lidar_range[0]) / vw)
    anchor_args["H"] = math.ceil((cav_lidar_range[4] - cav_lidar_range[1]) / vh)
    anchor_args["D"] = math.ceil((cav_lidar_range[5] - cav_lidar_range[2]) / vd)
    param["postprocess"]["anchor_args"] = anchor_args
    return param


def load_point_pillar_params(param: dict) -> dict:
    """Grid size + anchor args for PointPillars (ref yaml_utils.py:97-137)."""
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    grid_size = np.round(
        (np.array(cav_lidar_range[3:6]) - np.array(cav_lidar_range[0:3]))
        / np.array(voxel_size)).astype(np.int64)
    param["model"]["args"]["point_pillar_scatter"]["grid_size"] = grid_size.tolist()
    return _fill_anchor_grid_args(param)


def load_second_params(param: dict) -> dict:
    """SECOND voxel backbone derived params (ref yaml_utils.py:140-180)."""
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    grid_size = np.round(
        (np.array(cav_lidar_range[3:6]) - np.array(cav_lidar_range[0:3]))
        / np.array(voxel_size)).astype(np.int64)
    param["model"]["args"]["grid_size"] = grid_size.tolist()
    # plumb the preprocessor's voxel caps into the model: voxelization is
    # on-device inside the model here, so the sparse backbone must see the
    # same train/test caps the reference's SpVoxelPreprocessor applies
    # (ref sp_voxel_preprocessor.py:22 — 32000 train / 70000 test)
    for cap in ("max_voxel_train", "max_voxel_test"):
        if cap in param["preprocess"]["args"]:
            param["model"]["args"].setdefault(
                cap, param["preprocess"]["args"][cap])
    return _fill_anchor_grid_args(param)


def load_general_params(param: dict) -> dict:
    """Anchor-grid args only (models that need no extra derived params)."""
    return _fill_anchor_grid_args(param)


PARSERS = {
    "load_point_pillar_params": load_point_pillar_params,
    "load_second_params": load_second_params,
    "load_general_params": load_general_params,
}
