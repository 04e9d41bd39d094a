"""Model registry: string-keyed, mirroring the reference's ``model.core_method``
reflection (ref opencood/tools/train_utils.py:113-146) without importlib."""

from __future__ import annotations

_REGISTRY = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def build_model(config: dict):
    """Build a model from the yaml ``model`` subtree (core_method + args)."""
    # import here so registration side effects run
    from coalign_tpu.models import (camera, fpvrcnn, pixor,  # noqa: F401
                                    second_family, zoo)

    name = config["core_method"]
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name].from_config(config["args"])
