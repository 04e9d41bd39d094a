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
