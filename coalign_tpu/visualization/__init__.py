from coalign_tpu.visualization.canvas_bev import CanvasBEV  # noqa: F401
from coalign_tpu.visualization.canvas_3d import Canvas3D  # noqa: F401
from coalign_tpu.visualization.simple_vis import visualize  # noqa: F401
