from coalign_tpu.data.batch import (EarlyFusionBatcher,  # noqa: F401
                                    IntermediateFusionBatcher,
                                    LateFusionBatcher)
from coalign_tpu.data.synthetic import SyntheticScenes  # noqa: F401


def build_dataset(params: dict, train: bool = True):
    """Compose fusion strategy x dataset source from the yaml ``fusion`` /
    ``root_dir`` blocks (ref data_utils/datasets/__init__.py:10-28).

    Returns (base_dataset, batcher). The base dataset serves canonical
    frames; the batcher assembles padded fixed-shape device batches.
    """
    fusion = params["fusion"]["core_method"].lower()
    name = params["fusion"].get("dataset",
                                params.get("dataset", "opv2v")).lower()

    root = params["root_dir"] if train else (
        params.get("validate_dir") or params["root_dir"])
    if name in ("opv2v", "v2xset"):
        from coalign_tpu.data.opv2v import (OPV2VBaseDataset,
                                            V2XSETBaseDataset)
        cls = OPV2VBaseDataset if name == "opv2v" else V2XSETBaseDataset
        base = cls(root, train=train,
                   max_cav=params["train_params"].get("max_cav", 5))
    elif name == "dairv2x":
        from coalign_tpu.data.dairv2x import DAIRV2XBaseDataset
        base = DAIRV2XBaseDataset(params["data_dir"], split_json=root,
                                  train=train)
    elif name == "v2xsim":
        from coalign_tpu.data.v2xsim import V2XSIMBaseDataset
        base = V2XSIMBaseDataset(root, train=train,
                                 max_cav=params["train_params"].get(
                                     "max_cav", 5))
    else:
        raise KeyError(f"unknown dataset {name!r}")

    noise = params.get("noise_setting", {})
    args = noise.get("args", {}) if noise.get("add_noise") else {}
    kw = dict(
        max_cav=params["train_params"].get("max_cav", 5),
        lidar_range=params["preprocess"]["cav_lidar_range"],
        comm_range=params.get("comm_range", 70.0),
        pos_std=args.get("pos_std", 0.0),
        rot_std=args.get("rot_std", 0.0),
        laplace=bool(args.get("laplace", False)),
    )
    if "camera" in params.get("input_source", ["lidar"]):
        from coalign_tpu.data.camera_batch import CameraBatcher
        if hasattr(base, "load_camera"):
            base.load_camera = True
        final_dim = params["model"]["args"]["data_aug_conf"]["final_dim"]
        return base, CameraBatcher(
            max_cav=kw["max_cav"], final_dim=final_dim,
            lidar_range=kw["lidar_range"], comm_range=kw["comm_range"],
            pos_std=kw["pos_std"], rot_std=kw["rot_std"],
            laplace=kw["laplace"])
    if train and params.get("data_augment"):
        from coalign_tpu.data.augment import WorldAugmentor
        kw["augmentor"] = WorldAugmentor(params["data_augment"])
    batchers = {
        "intermediate": IntermediateFusionBatcher,
        "early": EarlyFusionBatcher,
        "late": LateFusionBatcher,
    }
    key = next((k for k in batchers if k in fusion), "intermediate")
    kw["train"] = train
    return base, batchers[key](**kw)
