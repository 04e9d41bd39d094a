from coalign_tpu.posegraph.box_align import (  # noqa: F401
    BoxAlignConfig, box_alignment_relative_sample, align_poses_batch)
