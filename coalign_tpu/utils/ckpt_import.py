"""Import reference (opencood) torch checkpoints into flax param trees.

The reference's eval story is checkpoint-driven (ref
opencood/tools/train_utils.py:29-74 ``load_saved_model``); this module lets
a user of the reference bring their trained ``net_epoch*.pth`` weights to
this framework. Covers the PointPillars family — ``point_pillar``,
``point_pillar_baseline``, ``point_pillar_baseline_multiscale`` (the
CoAlign flagship; its att fusion is parameter-free) — with both backbone
variants (resblock.py ResNet trunk and base_bev_backbone.py plain stages).

Layout conversions (torch -> flax):
  Linear    (out, in)          -> (in, out)                    .T
  Conv2d    OIHW               -> HWIO                         (2,3,1,0)
  ConvTranspose2d (in,out,k,k) -> (k,k,in,out) + SPATIAL FLIP  — flax
      ``nn.ConvTranspose`` (transpose_kernel=False) is a fractionally
      strided *correlation*, torch's is the conv adjoint; verified
      numerically in tests/test_ckpt_import.py.
  BatchNorm weight/bias/running_mean/running_var
            -> params scale/bias + batch_stats mean/var
  Conv bias feeding a bias-free flax conv followed by BatchNorm (the
      reference NaiveCompressor writes Conv(bias=True)+BN) is folded into
      the BN running_mean (mean' = mean - bias): eval-mode output is
      bit-identical.
"""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _tconv(w):  # (in,out,kh,kw) -> flipped (kh,kw,in,out)
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


class _Tree:
    """Accumulates (collection, 'a/b/c' path) -> array assignments."""

    def __init__(self):
        self.params: dict[str, np.ndarray] = {}
        self.stats: dict[str, np.ndarray] = {}
        self.bn_bias_folds: dict[str, np.ndarray] = {}

    def bn(self, prefix: str, field: str, value):
        """Map one torch BatchNorm entry under flax module ``prefix``."""
        if field == "weight":
            self.params[f"{prefix}/scale"] = value
        elif field == "bias":
            self.params[f"{prefix}/bias"] = value
        elif field == "running_mean":
            self.stats[f"{prefix}/mean"] = value
        elif field == "running_var":
            self.stats[f"{prefix}/var"] = value
        # num_batches_tracked has no flax counterpart

    def fold_bias_into_bn(self, bn_prefix: str, bias):
        self.bn_bias_folds[bn_prefix] = bias

    def finish(self):
        for bn_prefix, bias in self.bn_bias_folds.items():
            key = f"{bn_prefix}/mean"
            if key not in self.stats:
                raise KeyError(f"conv bias fold target {key} missing")
            self.stats[key] = self.stats[key] - bias
        return self.params, self.stats


def _resnet_block_offsets(keys) -> dict[int, int]:
    """Stage -> cumulative BasicBlock index (flax names blocks globally)."""
    per_stage = defaultdict(int)
    for k in keys:
        m = re.match(r"layer(\d+)\.(\d+)\.", k)
        if m:
            per_stage[int(m.group(1))] = max(per_stage[int(m.group(1))],
                                             int(m.group(2)) + 1)
    offsets, total = {}, 0
    for s in sorted(per_stage):
        offsets[s] = total
        total += per_stage[s]
    return offsets


def _map_resnet_trunk(sub: dict, out: _Tree, prefix: str):
    """ref resblock.py ResNetModified -> models/layers.py ResNetTrunk."""
    offsets = _resnet_block_offsets(sub)
    part_map = {"conv1": "Conv_0", "bn1": "MaskedBatchNorm_0",
                "conv2": "Conv_1", "bn2": "MaskedBatchNorm_1",
                "downsample.0": "Conv_2", "downsample.1": "MaskedBatchNorm_2"}
    for k, v in sub.items():
        m = re.match(r"layer(\d+)\.(\d+)\.(conv\d|bn\d|downsample\.[01])"
                     r"\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized resnet trunk key {k}")
        s, b, part, field = (int(m.group(1)), int(m.group(2)), m.group(3),
                             m.group(4))
        path = f"{prefix}/BasicBlock_{offsets[s] + b}/{part_map[part]}"
        if part.startswith(("conv", "downsample.0")):
            out.params[f"{path}/kernel"] = _conv(v)
        else:
            out.bn(path, field, v)


def _map_plain_blocks(sub: dict, out: _Tree, prefix: str):
    """ref base_bev_backbone.py Sequential blocks -> ConvStage stack.

    torch Sequential layout per stage: [ZeroPad2d, Conv, BN, ReLU] then
    per extra conv [Conv, BN, ReLU] — so Conv at j in {1,4,7,...} is the
    (j-1)//3-th ConvBNReLU of the stage.
    """
    for k, v in sub.items():
        m = re.match(r"(\d+)\.(\d+)\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized backbone block key {k}")
        s, j, field = int(m.group(1)), int(m.group(2)), m.group(3)
        conv_idx = (j - 1) // 3
        path = f"{prefix}/stages_{s}/ConvBNReLU_{conv_idx}"
        if (j - 1) % 3 == 0:  # Conv
            out.params[f"{path}/Conv_0/kernel"] = _conv(v)
        elif (j - 2) % 3 == 0:  # BN
            out.bn(f"{path}/MaskedBatchNorm_0", field, v)
        else:
            raise KeyError(f"unexpected backbone block slot {k}")


def _map_deblocks(sub: dict, out: _Tree, prefix: str, target_params):
    """ref deblocks ModuleList -> Deblock modules. Slot 0 is either a
    ConvTranspose2d (upsample stride >= 1) or a Conv2d (downsample);
    disambiguated by which flax param the target tree actually has."""
    for k, v in sub.items():
        m = re.match(r"(\d+)\.([01])\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized deblock key {k}")
        i, j, field = int(m.group(1)), int(m.group(2)), m.group(3)
        path = f"{prefix}/deblocks_{i}"
        if j == 0:
            tkey = f"{path}/ConvTranspose_0/kernel"
            if target_params is None or tkey in target_params:
                out.params[tkey] = _tconv(v)
            else:
                out.params[f"{path}/Conv_0/kernel"] = _conv(v)
        else:
            out.bn(f"{path}/MaskedBatchNorm_0", field, v)


def _map_backbone(sub: dict, out: _Tree, prefix: str, target_params):
    resnet = {k[len("resnet."):]: v for k, v in sub.items()
              if k.startswith("resnet.")}
    blocks = {k[len("blocks."):]: v for k, v in sub.items()
              if k.startswith("blocks.")}
    deblocks = {k[len("deblocks."):]: v for k, v in sub.items()
                if k.startswith("deblocks.")}
    if resnet:
        _map_resnet_trunk(resnet, out, f"{prefix}/trunk")
    if blocks:
        _map_plain_blocks(blocks, out, prefix)
    _map_deblocks(deblocks, out, prefix, target_params)


def _map_pfn(sub: dict, out: _Tree, prefix: str):
    """ref pillar_vfe.py PFNLayer stack -> PillarEncoder Dense/BN stack."""
    for k, v in sub.items():
        m = re.match(r"(\d+)\.(linear|norm)\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized pfn key {k}")
        i, part, field = int(m.group(1)), m.group(2), m.group(3)
        if part == "linear":
            if field == "weight":
                out.params[f"{prefix}/Dense_{i}/kernel"] = v.T
            else:
                out.params[f"{prefix}/Dense_{i}/bias"] = v
        else:
            out.bn(f"{prefix}/MaskedBatchNorm_{i}", field, v)


def _map_shrink(sub: dict, out: _Tree, prefix: str):
    """ref downsample_conv.py DoubleConv stack -> DownsampleConv."""
    for k, v in sub.items():
        m = re.match(r"layers\.(\d+)\.double_conv\.([02])\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized shrink key {k}")
        i, j, field = int(m.group(1)), int(m.group(2)), m.group(3)
        path = f"{prefix}/Conv_{2 * i + (j // 2)}"
        if field == "weight":
            out.params[f"{path}/kernel"] = _conv(v)
        else:
            out.params[f"{path}/bias"] = v


def _map_compressor(sub: dict, out: _Tree, prefix: str):
    """ref naive_compress.py (Conv bias=True + BN) -> 3x ConvBNReLU
    (bias-free conv): conv bias folds into the BN running mean."""
    slots = {("encoder", 0): 0, ("decoder", 0): 1, ("decoder", 3): 2}
    for k, v in sub.items():
        m = re.match(r"(encoder|decoder)\.(\d+)\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized compressor key {k}")
        part, j, field = m.group(1), int(m.group(2)), m.group(3)
        conv_slot = slots.get((part, j - j % 3))
        path = f"{prefix}/ConvBNReLU_{conv_slot}"
        if j % 3 == 0:  # Conv
            if field == "weight":
                out.params[f"{path}/Conv_0/kernel"] = _conv(v)
            else:
                out.fold_bias_into_bn(f"{path}/MaskedBatchNorm_0", v)
        else:  # BN
            out.bn(f"{path}/MaskedBatchNorm_0", field, v)


_HEAD_RE = re.compile(r"(cls|reg|dir|iou|unc)_head\.(weight|bias)$")

_TOP_LEVEL = {
    "pillar_vfe.pfn_layers.": ("encoder", _map_pfn),
    "shrink_conv.": ("shrink", _map_shrink),
    "naive_compressor.": ("compressor", _map_compressor),
}


def opencood_to_flax(state_dict: dict, target_variables=None):
    """Translate an opencood PointPillars-family state_dict.

    Returns ``{"params": flat, "batch_stats": flat}`` with '/'-joined
    paths matching this package's flax module tree. Raises KeyError on any
    reference key it does not understand — silent drops would mean silent
    accuracy loss.
    """
    from flax.traverse_util import flatten_dict

    target_params = None
    if target_variables is not None:
        target_params = {"/".join(k): v for k, v in flatten_dict(
            target_variables["params"]).items()}

    out = _Tree()
    backbone = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("backbone."):
            backbone[key[len("backbone."):]] = value
            continue
        m = _HEAD_RE.match(key)
        if m:
            name, field = m.groups()
            if field == "weight":
                out.params[f"heads/{name}_head/kernel"] = _conv(value)
            else:
                out.params[f"heads/{name}_head/bias"] = value
            continue
        for ref_prefix, (flax_prefix, fn) in _TOP_LEVEL.items():
            if key.startswith(ref_prefix):
                fn({key[len(ref_prefix):]: value}, out, flax_prefix)
                break
        else:
            raise KeyError(f"unmapped reference key {key!r} — extend "
                           "coalign_tpu/utils/ckpt_import.py")
    if backbone:
        _map_backbone(backbone, out, "backbone", target_params)
    return dict(zip(("params", "batch_stats"), out.finish()))


def merge_into_variables(flat: dict, variables: dict) -> dict:
    """Overlay translated flat arrays onto an initialized variable tree,
    validating shapes. Entries of the tree not present in the checkpoint
    are kept (e.g. fusion modules the torch model did not have)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    new_vars = {}
    for col, key in (("params", "params"), ("batch_stats", "batch_stats")):
        tree = flatten_dict(variables.get(col, {}))
        have = {"/".join(k): k for k in tree}
        for path, value in flat[key].items():
            if path not in have:
                raise KeyError(
                    f"checkpoint entry {path} not in model {col} tree; "
                    f"nearest: "
                    f"{[p for p in have if p.split('/')[0] == path.split('/')[0]][:4]}")
            cur = tree[have[path]]
            if tuple(cur.shape) != tuple(value.shape):
                raise ValueError(f"{col}:{path} shape {value.shape} != "
                                 f"model {tuple(cur.shape)}")
            tree[have[path]] = jnp.asarray(
                np.ascontiguousarray(value), dtype=cur.dtype)
        new_vars[col] = unflatten_dict(tree)
    return new_vars


def load_reference_checkpoint(path: str, variables: dict) -> dict:
    """One-call import: read a reference ``.pth`` (torch-free) and overlay
    it onto initialized model ``variables`` ({'params', 'batch_stats'})."""
    from coalign_tpu.utils.torch_ckpt import load_torch_state_dict

    sd = load_torch_state_dict(path)
    return merge_into_variables(opencood_to_flax(sd, variables), variables)
