"""coalign_tpu — TPU-native collaborative 3D perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CoAlign/OpenCOOD
(multi-agent V2V/V2X collaborative 3D object detection). Everything in the
compute path is fixed-shape, masked, and batched so a full frame
(voxelize -> pillar encode -> backbone -> warp+fuse -> decode -> NMS) is a
single jitted XLA program.

Design contract differences vs. the PyTorch reference (deliberate, TPU-first):
  * Agents are padded to ``L = max_cav`` with a boolean ``agent_mask`` instead
    of being flattened to a variable ``sum(n_cav)`` leading dim + record_len.
  * Feature maps are NHWC (TPU-native layout), not NCHW.
  * Voxelization + PillarVFE + scatter are fused into one segment-reduction
    pass over the raw padded point clouds — no (M, 32, 4) pillar tables.
  * Rotated NMS / IoU run on device with fixed-K masked tensors, replacing
    the reference's CPU shapely / CUDA iou3d path.
"""

__version__ = "0.1.0"
