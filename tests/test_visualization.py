"""Visualization: BEV/3D canvases render points + boxes to PNG."""

import numpy as np
from PIL import Image

from coalign_tpu.utils import box_utils as B
from coalign_tpu.visualization import Canvas3D, CanvasBEV, visualize


def test_canvas_bev_draws(tmp_path):
    c = CanvasBEV(canvas_shape=(200, 400), canvas_x_range=(-40, 40),
                  canvas_y_range=(-20, 20))
    pts = np.array([[0.0, 0.0], [10.0, 5.0], [999.0, 0.0]])  # last OOB
    c.draw_canvas_points(pts, radius=1, color=(10, 10, 10))
    # center pixel colored
    assert (c.canvas[100, 200] == 10).all()
    boxes = np.asarray(B.boxes_to_corners_3d(
        np.array([[5.0, 0.0, 0.0, 1.5, 2.0, 4.0, 0.3]]), "hwl"))
    c.draw_boxes(boxes, color=(0, 200, 0))
    p = c.save(str(tmp_path / "bev.png"))
    img = np.asarray(Image.open(p))
    assert img.shape == (200, 400, 3)
    assert (img == [0, 200, 0]).all(-1).sum() > 10  # box outline present


def test_canvas_bev_left_hand_flips_y(tmp_path):
    """left_hand=True mirrors y before rasterizing (ref canvas_bev.py:77:
    CARLA datasets are left-hand coordinate): a point at +y lands where
    the right-hand canvas puts -y."""
    rh = CanvasBEV(canvas_shape=(200, 400), canvas_x_range=(-40, 40),
                   canvas_y_range=(-20, 20))
    lh = CanvasBEV(canvas_shape=(200, 400), canvas_x_range=(-40, 40),
                   canvas_y_range=(-20, 20), left_hand=True)
    pt = np.array([[10.0, 5.0]])
    r_rh, c_rh, _ = rh.get_canvas_coords(pt)
    r_lh, c_lh, _ = lh.get_canvas_coords(pt)
    r_neg, c_neg, _ = rh.get_canvas_coords(np.array([[10.0, -5.0]]))
    assert c_rh[0] == c_lh[0] == c_neg[0]
    assert r_lh[0] == r_neg[0] != r_rh[0]

    # 3D canvas: the flip happens pre-projection
    c3_rh = Canvas3D(canvas_shape=(120, 160))
    c3_lh = Canvas3D(canvas_shape=(120, 160), left_hand=True)
    p = np.array([[8.0, 3.0, 0.0]])
    _, col_rh, _ = c3_rh.project(p)
    _, col_lh, _ = c3_lh.project(p)
    _, col_neg, _ = c3_rh.project(p * [1, -1, 1])
    assert col_lh[0] == col_neg[0] != col_rh[0]


def test_canvas_3d_and_visualize(tmp_path):
    c = Canvas3D(canvas_shape=(120, 160))
    pts = np.array([[5.0, 0.0, 0.0], [10.0, 2.0, 0.5], [-50.0, 0.0, 0.0]])
    c.draw_canvas_points(pts)
    assert (c.canvas != 255).any()

    gt = np.asarray(B.boxes_to_corners_3d(
        np.array([[8.0, 0.0, 0.0, 1.5, 2.0, 4.0, 0.0]]), "hwl"))
    pred = np.asarray(B.boxes_to_corners_3d(
        np.array([[8.2, 0.1, 0.0, 1.5, 2.0, 4.0, 0.05]]), "hwl"))
    out = visualize(pred, gt, pts, [-40, -20, -3, 40, 20, 1],
                    str(tmp_path / "vis.png"), method="bev")
    img = np.asarray(Image.open(out))
    assert (img == [220, 30, 30]).all(-1).any()   # predictions drawn
    assert (img == [0, 180, 0]).all(-1).any()     # gt drawn

    out3d = visualize(pred, gt, pts, [-40, -20, -3, 40, 20, 1],
                      str(tmp_path / "vis3d.png"), method="3d")
    assert np.asarray(Image.open(out3d)).shape[2] == 3


def test_vis_data_sequence_tool(tmp_path):
    """The sequence viewer renders gt+points PNGs from a fixture dataset
    (ref visualization/vis_data_sequence_*.py)."""
    import os

    import yaml

    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.vis_data_sequence import main

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=lr, points_per_object=32,
                             ground_points=64, seed=7)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)
    cfg = {
        "name": "vis_test",
        "root_dir": root, "validate_dir": root, "test_dir": root,
        "noise_setting": {"add_noise": False},
        "train_params": {"batch_size": 1, "max_cav": 2},
        "input_source": ["lidar"], "label_type": "lidar",
        "comm_range": 70,
        "fusion": {"core_method": "late", "dataset": "opv2v",
                   "args": {"proj_first": False}},
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": [0.4, 0.4, 4],
                                "max_points_per_voxel": 16,
                                "max_voxel_train": 2000,
                                "max_voxel_test": 2000},
                       "cav_lidar_range": lr},
        "postprocess": {"core_method": "VoxelPostprocessor",
                        "gt_range": lr,
                        "anchor_args": {"cav_lidar_range": lr,
                                        "l": 3.9, "w": 1.6, "h": 1.56,
                                        "r": [0, 90], "feature_stride": 2,
                                        "num": 2},
                        "target_args": {"pos_threshold": 0.6,
                                        "neg_threshold": 0.45,
                                        "score_threshold": 0.2},
                        "order": "hwl", "max_num": 16, "nms_thresh": 0.15},
    }
    path = str(tmp_path / "vis.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    written = main(["-y", path, "--out", str(tmp_path / "seq"),
                    "--frames", "2"])
    assert len(written) == 2
    for png in written:
        assert os.path.getsize(png) > 500
