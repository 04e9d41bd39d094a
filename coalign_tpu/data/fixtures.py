"""Write synthetic scenes to disk in the real OPV2V layout.

The reference ships no test fixtures (SURVEY §4); this generator produces a
miniature but format-faithful OPV2V root (scenario/cav/{ts}.yaml + .pcd) from
data/synthetic.SyntheticScenes, so the on-disk reader (data/opv2v.py) is
tested against a known oracle without the 100+ GB real dataset.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import yaml

from coalign_tpu.data.pcd_io import write_pcd
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.transforms import pose_to_tfm


def write_opv2v_fixture(root: str, scenes, frames_per_scenario: int = 4,
                        rsu_last: bool = False, with_cameras: bool = False,
                        cam_hw=(120, 160)):
    """Materialize ``scenes`` (SyntheticScenes or list of frames) under
    ``root`` in OPV2V on-disk layout. Returns the root path.

    Every agent sees every object (synthetic scenes have no occlusion
    culling), so each cav yaml lists all objects — like OPV2V where each
    cav's yaml carries the vehicles in its vicinity.
    """
    n = len(scenes)
    n_scen = max(1, n // frames_per_scenario)
    for si in range(n_scen):
        scen_dir = os.path.join(root, f"scenario_{si:04d}")
        for fi in range(frames_per_scenario):
            idx = si * frames_per_scenario + fi
            if idx >= n:
                break
            frame = scenes[idx]
            ts = f"{idx:06d}"
            boxes = frame["objects"]["boxes"]
            ids = frame["objects"]["ids"]
            vehicles = {}
            for b, oid in zip(boxes, ids):
                x, y, z, h, w, l, yaw = [float(v) for v in b]
                vehicles[int(oid)] = {
                    "location": [x, y, z],
                    "center": [0.0, 0.0, 0.0],
                    "angle": [0.0, float(np.rad2deg(yaw)), 0.0],
                    "extent": [l / 2, w / 2, h / 2],
                }
            for ai, agent in enumerate(frame["agents"]):
                # ego must sort first; optional trailing RSU gets a
                # negative id (ref opv2v_basedataset.py:99-103)
                is_rsu = rsu_last and ai == len(frame["agents"]) - 1 and ai > 0
                cav_id = f"-{ai + 1}" if is_rsu else f"{ai + 1:03d}"
                cav_dir = os.path.join(scen_dir, cav_id)
                os.makedirs(cav_dir, exist_ok=True)
                params = {
                    "lidar_pose": [float(v) for v in agent["pose"]],
                    "true_ego_pos": [float(v) for v in agent["pose"]],
                    "ego_speed": 0.0,
                    "vehicles": vehicles,
                }
                if with_cameras:
                    from PIL import Image
                    h, w = cam_hw
                    for ci in range(4):
                        # 4 cameras at lidar pose, yawed 90 deg apart
                        cords = [float(v) for v in agent["pose"]]
                        cords[4] = float(cords[4] + 90.0 * ci)
                        params[f"camera{ci}"] = {
                            "cords": cords,
                            "intrinsic": [[w, 0.0, (w - 1) / 2],
                                          [0.0, w, (h - 1) / 2],
                                          [0.0, 0.0, 1.0]],
                            "extrinsic": np.eye(4).tolist(),
                        }
                        rng = np.random.default_rng(idx * 31 + ai * 7 + ci)
                        img = rng.integers(
                            0, 255, (h, w, 3), dtype=np.uint8)
                        Image.fromarray(img).save(os.path.join(
                            cav_dir, f"{ts}_camera{ci}.png"))
                with open(os.path.join(cav_dir, ts + ".yaml"), "w") as f:
                    yaml.safe_dump(params, f)
                write_pcd(os.path.join(cav_dir, ts + ".pcd"),
                          agent["points"])
    return root


def _yaw_to_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def write_v2xsim_fixture(path: str, scenes) -> str:
    """Materialize ``scenes`` as a V2X-Sim style info pickle + .bin clouds.
    ``path`` is the pickle path; lidar .bin files land next to it."""
    root = os.path.dirname(os.path.abspath(path))
    infos = []
    for idx in range(len(scenes)):
        frame = scenes[idx]
        boxes = frame["objects"]["boxes"]  # world hwl
        gt = np.zeros((len(boxes), 10), dtype=np.float64)
        gt[:, :3] = boxes[:, :3]
        gt[:, 3] = boxes[:, 5]  # dx = l
        gt[:, 4] = boxes[:, 4]  # dy = w
        gt[:, 5] = boxes[:, 3]  # dz = h
        for i, b in enumerate(boxes):
            gt[i, 6:10] = _yaw_to_quat(b[6])
        info = {"agent_num": len(frame["agents"])}
        for ai, agent in enumerate(frame["agents"]):
            cav = ai + 1
            pts = agent["points"]
            scan = np.zeros((len(pts), 5), dtype=np.float32)
            scan[:, :4] = pts
            rel = f"lidar_{idx:04d}_{cav}.bin"
            scan.tofile(os.path.join(root, rel))
            info[f"lidar_path_{cav}"] = rel
            info[f"lidar_pose_{cav}"] = np.asarray(
                pose_to_tfm(agent["pose"]), dtype=np.float64)
            info[f"labels_{cav}"] = {
                "gt_boxes_global": gt,
                "gt_object_ids": np.asarray(frame["objects"]["ids"]),
            }
        infos.append(info)
    with open(path, "wb") as f:
        pickle.dump(infos, f)
    return path


def write_dairv2x_fixture(root: str, scenes) -> str:
    """Materialize 2-agent scenes in the DAIR-V2X-C on-disk layout.
    Returns the split-json path; ``root`` is the data_dir."""
    def jdump(rel, obj):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(obj, f)

    data_info, split = [], []
    for idx in range(len(scenes)):
        frame = scenes[idx]
        assert len(frame["agents"]) >= 2, "DAIR fixture needs 2 agents"
        veh, inf = frame["agents"][0], frame["agents"][1]
        fid = f"{idx:06d}"
        split.append(fid)

        t_wv = np.asarray(pose_to_tfm(veh["pose"]), dtype=np.float64)
        t_wi = np.asarray(pose_to_tfm(inf["pose"]), dtype=np.float64)
        # vehicle pose split into lidar->novatel (identity) @ novatel->world
        jdump(f"vehicle-side/calib/lidar_to_novatel/{fid}.json",
              {"transform": {"rotation": np.eye(3).tolist(),
                             "translation": [[0.0], [0.0], [0.0]]}})
        jdump(f"vehicle-side/calib/novatel_to_world/{fid}.json",
              {"rotation": t_wv[:3, :3].tolist(),
               "translation": t_wv[:3, 3:4].tolist()})
        jdump(f"infrastructure-side/calib/virtuallidar_to_world/{fid}.json",
              {"rotation": t_wi[:3, :3].tolist(),
               "translation": t_wi[:3, 3:4].tolist()})

        boxes = frame["objects"]["boxes"]
        corners = np.asarray(B.boxes_to_corners_3d(boxes, "hwl"))
        coop = [{"world_8_points": c.tolist(), "type": "car"}
                for c in corners]
        jdump(f"cooperative/label_world/{fid}.json", coop)
        jdump(f"cooperative/label_world_backup/{fid}.json", coop)
        jdump(f"vehicle-side/label/lidar/{fid}.json", [])
        jdump(f"infrastructure-side/label/virtuallidar/{fid}.json", [])

        for side, agent in (("vehicle-side", veh),
                            ("infrastructure-side", inf)):
            pdir = os.path.join(root, side, "velodyne")
            os.makedirs(pdir, exist_ok=True)
            write_pcd(os.path.join(pdir, fid + ".pcd"), agent["points"])

        data_info.append({
            "vehicle_image_path": f"vehicle-side/image/{fid}.jpg",
            "infrastructure_image_path":
                f"infrastructure-side/image/{fid}.jpg",
            "vehicle_pointcloud_path": f"vehicle-side/velodyne/{fid}.pcd",
            "infrastructure_pointcloud_path":
                f"infrastructure-side/velodyne/{fid}.pcd",
            "cooperative_label_path": f"cooperative/label_world/{fid}.json",
            "system_error_offset": {"delta_x": 0.0, "delta_y": 0.0},
        })
    jdump("cooperative/data_info.json", data_info)
    split_path = os.path.join(root, "split.json")
    with open(split_path, "w") as f:
        json.dump(split, f)
    return split_path
