"""Pose-noise robustness sweep (the CoAlign headline experiment).

TPU-first rework of opencood/tools/inference_w_noise.py:70-120: evaluate AP
at sigma_pos/sigma_rot in {0, 0.2, 0.4, 0.6} (m / deg), Gaussian (optionally
Laplace), rebuilding batches per noise setting; optionally running the
stage-1 + pose-graph correction before fusion.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from coalign_tpu.inference import make_infer_fn
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils import eval_utils as E

NOISE_LEVELS = ((0.0, 0.0), (0.2, 0.2), (0.4, 0.4), (0.6, 0.6))


def noise_sweep(model, variables, batcher_factory, dataset, anchors,
                postprocess_cfg, *, stage1=None, stage1_variables=None,
                align_cfg=None, levels=NOISE_LEVELS, batch_size=4,
                max_frames=None, batch_hook=None):
    """Returns {(pos_std, rot_std): {'ap30','ap50','ap70'}}.

    batcher_factory(pos_std, rot_std) must return a fresh batcher so each
    noise level redraws poses (ref inference_w_noise.py rebuilds the
    dataset per setting, seed 303).
    stage1: optional jitted stage-1 fn (tools/stage1.make_stage1_fn) — when
    given, poses are pose-graph corrected before fusion (CoAlign pass 2).
    """
    from coalign_tpu.tools.stage1 import correct_batch_poses

    infer = make_infer_fn(model, anchors, postprocess_cfg)
    results = {}
    for pos_std, rot_std in levels:
        batcher = batcher_factory(pos_std, rot_std)
        stat = E.new_result_stat()
        frames = 0
        for bidx, batch in enumerate(batcher.batches(
                dataset, batch_size, shuffle=False, drop_last=False)):
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            if batch_hook is not None and (pos_std > 0 or rot_std > 0):
                # offline CoAlign correction from the precalc json,
                # re-solved against THIS level's noise draw
                rows = int(batch["gt_boxes"].shape[0])
                jbatch = batch_hook(jbatch, list(range(
                    bidx * batch_size, bidx * batch_size + rows)))
            if stage1 is not None and (pos_std > 0 or rot_std > 0):
                dets = stage1(stage1_variables, jbatch)
                jbatch = correct_batch_poses(
                    jbatch, dets, align_cfg) if align_cfg else \
                    correct_batch_poses(jbatch, dets)
            dets = infer(variables, jbatch)
            dets = {k: np.asarray(v) for k, v in dets.items()}
            for bi in range(batch["gt_boxes"].shape[0]):
                keep = dets["mask"][bi]
                gt = batch["gt_boxes"][bi][batch["gt_mask"][bi]]
                gt_corners = np.asarray(B.boxes_to_corners_3d(gt, "hwl"))
                for t in (0.3, 0.5, 0.7):
                    E.accumulate_tp_fp(dets["corners3d"][bi][keep],
                                       dets["scores"][bi][keep],
                                       gt_corners, stat, t)
                frames += 1
            if max_frames and frames >= max_frames:
                break
        results[(pos_std, rot_std)] = E.eval_final_results(stat)
    return results


def main(argv=None):
    """CLI mirroring ref tools/inference_w_noise.py: load a trained
    model_dir, re-draw pose noise per sigma level, report AP per level."""
    import argparse
    import copy
    import json
    import os

    import numpy as np

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="dir with config.yaml + step_* checkpoints")
    p.add_argument("--levels", default="0,0.2,0.4,0.6",
                   help="comma-separated sigmas (m and deg, paired)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--eval_frames", type=int, default=None)
    p.add_argument("--root_dir", default=None)
    p.add_argument("--also_laplace", action="store_true",
                   help="additionally sweep Laplace-distributed noise "
                        "(ref inference_w_noise.py also_laplace)")
    opt = p.parse_args(argv)

    from coalign_tpu.config.yaml_utils import save_yaml
    from coalign_tpu.data import build_dataset
    from coalign_tpu.tools.run import _load_model_dir, postprocess_cfg

    # shared model_dir loader: flax orbax runs AND reference torch runs
    # (net_epoch*.pth import) — the sweep previously ignored .pth dirs and
    # would have swept a randomly-initialized model
    params, base, _, model, spec, state = _load_model_dir(opt)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def make_factory(laplace: bool):
        def batcher_factory(pos_std, rot_std):
            p2 = copy.deepcopy(params)
            p2["noise_setting"] = {
                "add_noise": pos_std > 0 or rot_std > 0,
                "args": {"pos_std": pos_std, "rot_std": rot_std,
                         "pos_mean": 0, "rot_mean": 0,
                         "laplace": laplace}}
            _, b = build_dataset(p2, train=False)
            return b
        return batcher_factory

    levels = tuple((float(s), float(s))
                   for s in opt.levels.split(",") if s != "")
    from coalign_tpu.tools.run import _box_align_hook
    hook = _box_align_hook(params)
    results = noise_sweep(model, variables, make_factory(False), base,
                          getattr(spec, "anchors", spec), postprocess_cfg(params),
                          levels=levels, batch_size=opt.batch_size,
                          max_frames=opt.eval_frames, batch_hook=hook)
    out = {f"{k[0]:g}_{k[1]:g}": v for k, v in results.items()}
    if opt.also_laplace:
        # ref inference_w_noise.py:70-120 repeats the sweep with Laplace
        # noise (same sigma table, 'laplace' key in noise args)
        lap = noise_sweep(model, variables, make_factory(True), base,
                          getattr(spec, "anchors", spec), postprocess_cfg(params),
                          levels=levels, batch_size=opt.batch_size,
                          max_frames=opt.eval_frames, batch_hook=hook)
        out.update({f"laplace_{k[0]:g}_{k[1]:g}": v
                    for k, v in lap.items()})
    print(json.dumps(out))
    save_yaml(out, os.path.join(opt.model_dir, "eval_noise_sweep.yaml"))
    return results


if __name__ == "__main__":
    main()
