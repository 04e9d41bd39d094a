from coalign_tpu.models.fuse.fusion import (  # noqa: F401
    MaxFusion, AttFusion, build_fusion)
