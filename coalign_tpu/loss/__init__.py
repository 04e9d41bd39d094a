from coalign_tpu.loss.point_pillar_loss import PointPillarLoss, build_loss  # noqa: F401
