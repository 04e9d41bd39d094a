"""DAIR-V2X-C on-disk dataset reader (real-world vehicle + infrastructure).

TPU-first rework of ref opencood/data_utils/datasets/basedataset/
dairv2x_basedataset.py: exactly two agents per frame — the vehicle (always
ego) and one roadside infrastructure unit. Poses are composed from calib
jsons (lidar->novatel->world for the vehicle, virtuallidar->world + the
per-frame ``system_error_offset`` for the infrastructure; ref
transformation_utils.py:455-489). The cooperative label lives world-frame as
``world_8_points`` corner lists (ref box_utils.project_world_objects_dairv2x
:1064); single-side labels live in each agent's own lidar frame.

Frame contract matches data/synthetic.py; DAIR has no stable object ids so
ids are sequential and downstream gt dedup uses IoU, not ids (ref
dairv2x_basedataset.py:30 generate_gt_bbx_by_iou).
"""

from __future__ import annotations

import json
import os

import numpy as np

from coalign_tpu.data.pcd_io import read_pcd
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.transforms import tfm_to_pose


def _read_json(path):
    with open(path) as f:
        return json.load(f)


def _rt_to_tfm(rotation, translation) -> np.ndarray:
    t = np.eye(4, dtype=np.float64)
    t[:3, :3] = np.asarray(rotation, dtype=np.float64)
    t[:3, 3] = np.asarray(translation, dtype=np.float64).reshape(3)
    return t


def veh_lidar_pose(lidar_to_novatel: dict, novatel_to_world: dict):
    """T_world<-lidar for the vehicle side (ref transformation_utils.py:455)."""
    a2b = _rt_to_tfm(lidar_to_novatel["transform"]["rotation"],
                     lidar_to_novatel["transform"]["translation"])
    b2c = _rt_to_tfm(novatel_to_world["rotation"],
                     novatel_to_world["translation"])
    return b2c @ a2b


def inf_lidar_pose(virtuallidar_to_world: dict, offset: dict):
    """T_world<-virtuallidar with system error offset applied
    (ref transformation_utils.py:469)."""
    t = _rt_to_tfm(virtuallidar_to_world["rotation"],
                   virtuallidar_to_world["translation"])
    t[0, 3] += offset.get("delta_x", 0.0)
    t[1, 3] += offset.get("delta_y", 0.0)
    return t


def world_corners_to_boxes(object_list):
    """Cooperative label: list of {'world_8_points': (8,3)} -> world hwl
    boxes (flattened to yaw-only like ref corner_to_center)."""
    if not object_list:
        return np.zeros((0, 7), np.float32), np.zeros((0,), np.int64)
    corners = np.stack([np.asarray(o["world_8_points"], dtype=np.float64)
                        for o in object_list])
    boxes = np.asarray(B.corner_to_center(corners, "hwl"), dtype=np.float32)
    return boxes, np.arange(len(boxes), dtype=np.int64)


def single_label_to_boxes(object_list):
    """Single-side label: list of {'3d_dimensions', '3d_location',
    'rotation'} in the agent's own lidar frame -> (N, 7) hwl boxes."""
    boxes = []
    for o in object_list:
        d, p = o["3d_dimensions"], o["3d_location"]
        boxes.append([p["x"], p["y"], p["z"], d["h"], d["w"], d["l"],
                      o["rotation"]])
    if not boxes:
        return np.zeros((0, 7), np.float32)
    return np.asarray(boxes, dtype=np.float32)


class DAIRV2XBaseDataset:
    """Serves canonical frames from a DAIR-V2X-C root + split json."""

    def __init__(self, data_dir: str, split_json: str, train: bool = True,
                 load_lidar: bool = True, use_complemented_label: bool = True):
        self.root = data_dir
        self.train = train
        self.load_lidar = load_lidar
        # "complemented annotation" backup labels (ref :118-153)
        self.label_sub = "label_world" if use_complemented_label else \
            "label_world_backup"
        self.split_info = _read_json(split_json)
        co = _read_json(os.path.join(data_dir, "cooperative/data_info.json"))
        self.co_data = {}
        for fi in co:
            vid = os.path.basename(fi["vehicle_image_path"]).replace(
                ".jpg", "")
            self.co_data[vid] = fi

    def __len__(self):
        return len(self.split_info)

    def __getitem__(self, idx):
        veh_id = self.split_info[idx]
        info = self.co_data[veh_id]
        inf_id = os.path.basename(info["infrastructure_image_path"]).replace(
            ".jpg", "")

        t_wv = veh_lidar_pose(
            _read_json(os.path.join(
                self.root, f"vehicle-side/calib/lidar_to_novatel/{veh_id}.json")),
            _read_json(os.path.join(
                self.root, f"vehicle-side/calib/novatel_to_world/{veh_id}.json")))
        t_wi = inf_lidar_pose(
            _read_json(os.path.join(
                self.root,
                f"infrastructure-side/calib/virtuallidar_to_world/{inf_id}.json")),
            info.get("system_error_offset", {}))

        label_path = info["cooperative_label_path"]
        if self.label_sub == "label_world_backup":
            label_path = label_path.replace("label_world",
                                            "label_world_backup")
        coop = _read_json(os.path.join(self.root, label_path))
        boxes_w, ids = world_corners_to_boxes(coop)

        agents = []
        for ai, (t, frame_id, side) in enumerate(
                [(t_wv, veh_id, "vehicle-side"),
                 (t_wi, inf_id, "infrastructure-side")]):
            pose = np.asarray(tfm_to_pose(t), dtype=np.float32)
            agent = {"pose": pose, "cav_id": str(ai),
                     "visible_ids": ids if ai == 0 else
                     np.zeros((0,), np.int64)}
            # per-agent single-side labels in own lidar frame
            lbl_dir = ("label/lidar" if side == "vehicle-side"
                       else "label/virtuallidar")
            lbl = os.path.join(self.root, side, lbl_dir, f"{frame_id}.json")
            if os.path.exists(lbl):
                agent["single_boxes"] = single_label_to_boxes(
                    _read_json(lbl))
            if self.load_lidar:
                key = ("vehicle_pointcloud_path" if ai == 0
                       else "infrastructure_pointcloud_path")
                agent["points"] = read_pcd(os.path.join(self.root, info[key]))
            agents.append(agent)

        return {"agents": agents,
                "objects": {"boxes": boxes_w, "ids": ids},
                "frame_id": veh_id}
