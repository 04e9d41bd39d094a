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


def _map_pixel_weight(sub: dict, out: _Tree, prefix: str):
    """ref disco_fuse.py:76 PixelWeightLayer (Conv bias=True + BN x3 then a
    bare Conv) -> models/fuse/graph_fusion.py PixelWeightLayer (3x bias-free
    ConvBNReLU + Conv): conv biases fold into the BN running means."""
    for k, v in sub.items():
        m = re.match(r"(conv|bn)1_(\d)\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized pixel_weight_layer key {k}")
        part, i, field = m.group(1), int(m.group(2)), m.group(3)
        if i == 4:  # final conv keeps its bias (no BN follows)
            out.params[f"{prefix}/Conv_0/{'kernel' if field == 'weight' else 'bias'}"] = (
                _conv(v) if field == "weight" else v)
        elif part == "conv":
            path = f"{prefix}/ConvBNReLU_{i - 1}"
            if field == "weight":
                out.params[f"{path}/Conv_0/kernel"] = _conv(v)
            else:
                out.fold_bias_into_bn(f"{path}/MaskedBatchNorm_0", v)
        else:
            out.bn(f"{prefix}/ConvBNReLU_{i - 1}/MaskedBatchNorm_0", field, v)


def _map_v2vnet_fusion(sub: dict, out: _Tree, prefix: str):
    """ref fusion_in_one.py:173 V2VNetFusion (msg_cnn + 1-layer ConvGRU +
    channel mlp) -> graph_fusion.py V2VNetFusion."""
    for k, v in sub.items():
        if k.startswith("conv_gru.cell_list."):
            m = re.match(r"conv_gru\.cell_list\.(\d+)\.(conv_gates|conv_can)"
                         r"\.(weight|bias)$", k)
            if not m or int(m.group(1)) != 0:
                raise KeyError(f"only 1-layer ConvGRU supported, got {k}")
            part, field = m.group(2), m.group(3)
            out.params[f"{prefix}/conv_gru/{part}/"
                       f"{'kernel' if field == 'weight' else 'bias'}"] = (
                _conv(v) if field == "weight" else v)
        elif k in ("msg_cnn.weight", "msg_cnn.bias"):
            field = k.split(".")[1]
            out.params[f"{prefix}/msg_cnn/"
                       f"{'kernel' if field == 'weight' else 'bias'}"] = (
                _conv(v) if field == "weight" else v)
        elif k in ("mlp.weight", "mlp.bias"):
            field = k.split(".")[1]
            out.params[f"{prefix}/mlp/"
                       f"{'kernel' if field == 'weight' else 'bias'}"] = (
                v.T if field == "weight" else v)
        else:
            raise KeyError(f"unrecognized v2vnet fusion key {k}")


def _map_v2xvit_fusion(sub: dict, out: _Tree, prefix: str):
    """ref fusion_in_one.py:295 V2XViTFusion / v2xvit_basic.py V2XTEncoder
    -> models/fuse/v2xvit.py V2XViTFusion.

    Key facts encoded here (verified against the reference source):
      * ``encoder.prior_feed`` is DEAD CODE — V2XTEncoder.forward strips the
        3 prior channels (``x = x[..., :-3]``) and never calls it
        (v2xvit_basic.py:145,163-166), so its weights are skipped.
      * flax names index modules globally: for depth d, block b (nb blocks
        per depth), the HMSA prenorm is LayerNorm_{d*(2nb+1)+2b}, the
        window prenorm +1, the FF prenorm LayerNorm_{d*(2nb+1)+2nb}; HGT /
        pyramid modules are numbered d*nb+b and the FF Denses 2d, 2d+1.
      * per-type HGT linears (k_linears.0/.1 ...) stack into the
        one-hot-selected (T, in, out) tensors q_w/k_w/v_w/a_w.
    """
    dims = [(int(m.group(1)), int(m.group(2)))
            for k in sub
            for m in [re.match(r"encoder\.layers\.(\d+)\.0\.layers\.(\d+)\.", k)]
            if m]
    if not dims:
        raise KeyError("v2xvit fusion: no encoder.layers.* keys found")
    nb = max(b for _, b in dims) + 1
    typed: dict[tuple, dict] = defaultdict(dict)

    for k, v in sub.items():
        if k.startswith("encoder.prior_feed."):
            continue  # dead code in the reference forward
        m = re.match(r"encoder\.layers\.(\d+)\.1\.(norm|fn\.net)\.?(\d*)"
                     r"\.(weight|bias)$", k)
        if m:  # feed-forward branch
            d, part, j, field = (int(m.group(1)), m.group(2), m.group(3),
                                 m.group(4))
            if part == "norm":
                out.params[f"{prefix}/LayerNorm_{d * (2 * nb + 1) + 2 * nb}/"
                           f"{'scale' if field == 'weight' else 'bias'}"] = v
            else:  # net.0 / net.3
                idx = 2 * d + (0 if int(j) == 0 else 1)
                out.params[f"{prefix}/Dense_{idx}/"
                           f"{'kernel' if field == 'weight' else 'bias'}"] = (
                    v.T if field == "weight" else v)
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.0\.layers\.(\d+)\.([01])\.(.+)$",
                     k)
        if not m:
            raise KeyError(f"unrecognized v2xvit key {k}")
        d, b, slot, rest = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                            m.group(4))
        mod = d * nb + b
        ln_base = d * (2 * nb + 1) + 2 * b
        if rest.startswith("norm."):
            field = rest.split(".")[1]
            out.params[f"{prefix}/LayerNorm_{ln_base + slot}/"
                       f"{'scale' if field == 'weight' else 'bias'}"] = v
        elif slot == 0:  # HGT cav attention
            hgt = f"{prefix}/HGTCavAttention_{mod}"
            m2 = re.match(r"fn\.([kqva])_linears\.(\d+)\.(weight|bias)$", rest)
            if m2:
                letter, t, field = m2.group(1), int(m2.group(2)), m2.group(3)
                typed[(hgt, letter, field)][t] = v
            elif rest in ("fn.relation_att", "fn.relation_msg"):
                out.params[f"{hgt}/{rest[3:]}"] = v
            else:
                raise KeyError(f"unrecognized hmsa key {k}")
        else:  # pyramid window attention
            pwa = f"{prefix}/PyramidWindowAttention_{mod}"
            m2 = re.match(r"fn\.pwmsa\.(\d+)\.(pos_embedding|to_qkv\.weight"
                          r"|to_out\.0\.(?:weight|bias))$", rest)
            if m2:
                s, part = int(m2.group(1)), m2.group(2)
                wa = f"{pwa}/WindowAttention_{s}"
                if part == "pos_embedding":
                    out.params[f"{wa}/pos_embedding"] = v
                elif part == "to_qkv.weight":
                    out.params[f"{wa}/to_qkv/kernel"] = v.T
                elif part == "to_out.0.weight":
                    out.params[f"{wa}/to_out/kernel"] = v.T
                else:
                    out.params[f"{wa}/to_out/bias"] = v
                continue
            m2 = re.match(r"fn\.split_attn\.(fc1|fc2|bn1)\.(weight|bias)$",
                          rest)
            if not m2:
                raise KeyError(f"unrecognized pwindow key {k}")
            part, field = m2.group(1), m2.group(2)
            sa = f"{pwa}/SplitAttn_0"
            if part == "bn1":  # torch LayerNorm despite the name
                out.params[f"{sa}/bn1/"
                           f"{'scale' if field == 'weight' else 'bias'}"] = v
            else:
                out.params[f"{sa}/{part}/kernel"] = v.T

    for (hgt, letter, field), per_type in typed.items():
        stacked = np.stack([per_type[t] for t in sorted(per_type)])
        if field == "weight":  # (T, out, in) -> (T, in, out)
            out.params[f"{hgt}/{letter}_w"] = stacked.transpose(0, 2, 1)
        else:
            out.params[f"{hgt}/{letter}_b"] = stacked


def _map_cbr(sub: dict, out: _Tree, path: str):
    """ref when2com_fuse.py conv2DBatchNormRelu (cbr_unit = [Conv bias=True,
    BN, ReLU]) -> one bias-free ConvBNReLU; conv bias folds into BN mean."""
    for k, v in sub.items():
        m = re.match(r"cbr_unit\.([01])\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized cbr key {k}")
        j, field = int(m.group(1)), m.group(2)
        if j == 0:
            if field == "weight":
                out.params[f"{path}/Conv_0/kernel"] = _conv(v)
            else:
                out.fold_bias_into_bn(f"{path}/MaskedBatchNorm_0", v)
        else:
            out.bn(f"{path}/MaskedBatchNorm_0", field, v)


def _map_when2comm_fusion(sub: dict, out: _Tree, prefix: str):
    """ref fusion_in_one.py:354 When2commFusion (policy_net4 +
    2x km_generator_v2 + AdditiveAttentin) -> graph_fusion.py
    When2commFusion.

    * ``attention_net.linear_out`` is DEAD CODE in the reference
      (AdditiveAttentin.forward computes bmm(k_proj, q_proj^T) and never
      applies it, when2com_fuse.py:350-355) — skipped.
    * the km fc1 consumes the (C,5,7) pooled map flattened CHW in torch but
      HWC here, so its kernel rows are permuted accordingly.
    """
    conv_slots = {f"query_key_net.conv{i + 1}.": f"ConvBNReLU_{i}"
                  for i in range(5)}
    conv_slots["key_net.conv1."] = "ConvBNReLU_5"
    conv_slots["query_net.conv1."] = "ConvBNReLU_6"
    cbr_groups: dict[str, dict] = defaultdict(dict)
    for k, v in sub.items():
        hit = next((p for p in conv_slots if k.startswith(p)), None)
        if hit:
            cbr_groups[conv_slots[hit]][k[len(hit):]] = v
            continue
        m = re.match(r"(key|query)_net\.fc\.([024])\.(weight|bias)$", k)
        if m:
            which, j, field = m.group(1), int(m.group(2)), m.group(3)
            path = f"{prefix}/{which}_fc{j // 2 + 1}"
            if field == "bias":
                out.params[f"{path}/bias"] = v
            elif j == 0:  # CHW-flattened input -> HWC rows
                o, n = v.shape  # (out, 128*5*7)
                w = v.reshape(o, 128, 5, 7).transpose(2, 3, 1, 0)
                out.params[f"{path}/kernel"] = w.reshape(n, o)
            else:
                out.params[f"{path}/kernel"] = v.T
            continue
        m = re.match(r"attention_net\.linear_(feat|context|out)\.(weight|bias)$",
                     k)
        if m:
            which, field = m.group(1), m.group(2)
            if which == "out":
                continue  # dead code in the reference forward
            path = f"{prefix}/att_{which}"
            out.params[f"{path}/{'kernel' if field == 'weight' else 'bias'}"] \
                = v.T if field == "weight" else v
            continue
        raise KeyError(f"unrecognized when2comm key {k}")
    for slot, grp in cbr_groups.items():
        _map_cbr(grp, out, f"{prefix}/{slot}")


def _map_one_fusion(sub: dict, out: _Tree, flax_prefix: str):
    if any(k.startswith("pixel_weight_layer.") for k in sub):
        _map_pixel_weight(
            {k[len("pixel_weight_layer."):]: v for k, v in sub.items()},
            out, f"{flax_prefix}/PixelWeightLayer_0")
    elif any(k.startswith("fusion_net.encoder.") for k in sub):
        # V2XViTFusion wraps V2XTransformer in its own fusion_net attr
        _map_v2xvit_fusion(
            {k[len("fusion_net."):]: v for k, v in sub.items()},
            out, flax_prefix)
    elif any(k.startswith("query_key_net.") for k in sub):
        _map_when2comm_fusion(sub, out, flax_prefix)
    elif any(k.startswith(("msg_cnn.", "conv_gru.", "mlp.")) for k in sub):
        _map_v2vnet_fusion(sub, out, flax_prefix)
    else:
        raise KeyError(
            f"unsupported fusion module (keys {sorted(sub)[:4]}...) — extend "
            "coalign_tpu/utils/ckpt_import.py")


def _map_fusion(sub: dict, out: _Tree):
    """ref model attr fusion_net: either ONE fusion module (baseline models,
    flax path 'fusion') or a ModuleList with one module per backbone scale
    (multiscale models, flax paths 'fusion_nets_{i}'). Max/att fusion is
    parameter-free on both sides, so only learned fusions arrive here."""
    if re.match(r"\d+\.", next(iter(sub))):
        groups = defaultdict(dict)
        for k, v in sub.items():
            i, rest = k.split(".", 1)
            groups[int(i)][rest] = v
        for i, g in groups.items():
            _map_one_fusion(g, out, f"fusion_nets_{i}")
    else:
        _map_one_fusion(sub, out, "fusion")


def _map_torch_up(sub: dict, out: _Tree, prefix: str):
    """ref lss_submodule.py:19 Up: ``conv`` Sequential [Conv, BN, ReLU,
    Conv, BN, ReLU] -> models/camera_trunks.py TorchUp {conv1, bn1,
    conv2, bn2}."""
    slots = {"0": ("conv1", "conv"), "1": ("bn1", "bn"),
             "3": ("conv2", "conv"), "4": ("bn2", "bn")}
    for k, v in sub.items():
        m = re.match(r"conv\.([0134])\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized Up key {k}")
        name, kind = slots[m.group(1)]
        if kind == "conv":
            out.params[f"{prefix}/{name}/kernel"] = _conv(v)
        else:
            out.bn(f"{prefix}/{name}", m.group(2), v)


_TV_BASIC_PARTS = {"conv1": "Conv_0", "bn1": "MaskedBatchNorm_0",
                   "conv2": "Conv_1", "bn2": "MaskedBatchNorm_1",
                   "downsample.0": "Conv_2",
                   "downsample.1": "MaskedBatchNorm_2"}
_TV_BOTTLENECK_PARTS = {"conv1": "conv1", "bn1": "bn1", "conv2": "conv2",
                        "bn2": "bn2", "conv3": "conv3", "bn3": "bn3",
                        "downsample.0": "down_conv",
                        "downsample.1": "down_bn"}


def _map_tv_layer_key(key, value, out: _Tree, prefix: str,
                      bottleneck: bool):
    """One torchvision ``layer{S}.{B}.<part>.<field>`` entry -> our
    per-block named modules ``layer{S}_{B}`` (camera_trunks.py
    ResNet18Layers / ResNet101Trunk / Bottleneck / layers.BasicBlock)."""
    m = re.match(r"layer(\d+)\.(\d+)\.(conv\d|bn\d|downsample\.[01])"
                 r"\.(\w+)$", key)
    if not m:
        raise KeyError(f"unrecognized torchvision layer key {key}")
    parts = _TV_BOTTLENECK_PARTS if bottleneck else _TV_BASIC_PARTS
    path = (f"{prefix}/layer{m.group(1)}_{m.group(2)}"
            f"/{parts[m.group(3)]}")
    if m.group(3).startswith(("conv", "downsample.0")):
        out.params[f"{path}/kernel"] = _conv(value)
    else:
        out.bn(path, m.group(4), value)


_EFF_BLOCK_PARTS = {"_expand_conv": ("expand_conv", "conv"),
                    "_depthwise_conv": ("depthwise_conv", "conv"),
                    "_project_conv": ("project_conv", "conv"),
                    "_se_reduce": ("se_reduce", "biased_conv"),
                    "_se_expand": ("se_expand", "biased_conv"),
                    "_bn0": ("bn0", "bn"), "_bn1": ("bn1", "bn"),
                    "_bn2": ("bn2", "bn")}


def _map_effnet_trunk_key(key, value, out: _Tree, prefix: str):
    """efficientnet_pytorch EfficientNet state-dict entry -> our
    camera_trunks.EfficientNetB0. The classification head (_conv_head /
    top-level _bn1 / _fc) never runs in the reference's get_eff_features
    walk (ref lss_submodule.py:91-115) and has no counterpart — dropped."""
    if key.startswith(("_conv_head.", "_bn1.", "_fc.")):
        return
    if key == "_conv_stem.weight":
        out.params[f"{prefix}/conv_stem/kernel"] = _conv(value)
        return
    m = re.match(r"_bn0\.(\w+)$", key)
    if m:
        out.bn(f"{prefix}/bn0", m.group(1), value)
        return
    m = re.match(r"_blocks\.(\d+)\.(_\w+?)\.(\w+)$", key)
    if not m:
        raise KeyError(f"unrecognized efficientnet key {key}")
    name, kind = _EFF_BLOCK_PARTS[m.group(2)]
    path = f"{prefix}/blocks_{m.group(1)}/{name}"
    if kind == "bn":
        out.bn(path, m.group(3), value)
    elif m.group(3) == "weight":
        out.params[f"{path}/kernel"] = _conv(value)
    else:
        out.params[f"{path}/bias"] = value


_LSS_HEAD_RE = re.compile(
    r"(cls|reg|dir)_head(_before_fusion)?\.(weight|bias)$")


def _map_lss_family(state_dict: dict, out: _Tree):
    """Camera LSS family (ref lift_splat_shoot.py:16 /
    lift_splat_shoot_intermediate.py:18): camencode (EfficientNet-b0 or
    resnet101-slice trunk + Up stack + 1x1 heads), bevencode (resnet18
    trunk + Up decode [+ fusion]), detection heads (+ _before_fusion
    variants -> heads_single), optional shrink_conv."""
    eff = any(k.startswith("camencode.trunk.") for k in state_dict)
    fuse: dict[str, np.ndarray] = {}
    for key, v in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        m = _LSS_HEAD_RE.match(key)
        if m:
            tgt = "heads_single" if m.group(2) else "heads"
            if m.group(3) == "weight":
                out.params[f"{tgt}/{m.group(1)}_head/kernel"] = _conv(v)
            else:
                out.params[f"{tgt}/{m.group(1)}_head/bias"] = v
            continue
        if key.startswith("shrink_conv."):
            _map_shrink({key[len("shrink_conv."):]: v}, out, "shrink")
            continue
        if key.startswith("camencode."):
            k = key[len("camencode."):]
            if re.match(r"(depth|image)_head\.(weight|bias)$", k):
                name, field = k.split(".")
                if field == "weight":
                    out.params[f"camencode/{name}/kernel"] = _conv(v)
                else:
                    out.params[f"camencode/{name}/bias"] = v
            elif eff:
                if k.startswith("trunk."):
                    _map_effnet_trunk_key(k[len("trunk."):], v, out,
                                          "camencode/trunk")
                elif k.startswith(("up1.", "up2.")):
                    _map_torch_up({k[4:]: v}, out, f"camencode/{k[:3]}")
                else:
                    raise KeyError(f"unmapped camencode key {key}")
            else:  # resnet101 slice
                if k.startswith(("up1.", "up2.")):
                    # constructed but never called in the reference's
                    # downsample-8 forward (ref lss_submodule.py:210-216
                    # returns x_8 directly) — dead weights, dropped
                    continue
                if k == "conv1.weight":
                    out.params["camencode/trunk/conv1/kernel"] = _conv(v)
                elif k.startswith("bn1."):
                    out.bn("camencode/trunk/bn1", k.split(".")[1], v)
                elif k.startswith("layer"):
                    _map_tv_layer_key(k, v, out, "camencode/trunk",
                                      bottleneck=True)
                else:
                    raise KeyError(f"unmapped camencode key {key}")
            continue
        if key.startswith("bevencode."):
            k = key[len("bevencode."):]
            if k == "conv1.weight":
                out.params["bevencode/trunk/conv1/kernel"] = _conv(v)
            elif k.startswith("bn1."):
                out.bn("bevencode/trunk/bn1", k.split(".")[1], v)
            elif k.startswith("layer"):
                _map_tv_layer_key(k, v, out, "bevencode/trunk",
                                  bottleneck=False)
            elif k.startswith("up1."):
                _map_torch_up({k[4:]: v}, out, "bevencode/up1")
            elif k.startswith(("up_layer1.", "up_layer2.")):
                name, rest = k.split(".", 1)
                _map_torch_up({rest: v}, out, f"bevencode/{name}")
            elif k.startswith("up2."):
                # single-agent BevEncode tail Sequential
                # [Upsample, Conv, BN, ReLU, Conv] (ref lss_submodule.py:263)
                m = re.match(r"up2\.([124])\.(\w+)$", k)
                if not m:
                    raise KeyError(f"unrecognized bevencode key {key}")
                slot, field = m.groups()
                if slot == "1":
                    out.params["bevencode/up2_conv/kernel"] = _conv(v)
                elif slot == "2":
                    out.bn("bevencode/up2_bn", field, v)
                else:
                    tgt = "kernel" if field == "weight" else "bias"
                    out.params[f"bevencode/up2_out/{tgt}"] = (
                        _conv(v) if field == "weight" else v)
            elif k.startswith("down_layer."):
                m = re.match(r"down_layer\.([02])\.(\w+)$", k)
                if not m:
                    raise KeyError(f"unrecognized bevencode key {key}")
                name = "down1" if m.group(1) == "0" else "down2"
                tgt = "kernel" if m.group(2) == "weight" else "bias"
                out.params[f"bevencode/{name}/{tgt}"] = (
                    _conv(v) if m.group(2) == "weight" else v)
            elif k.startswith("fuse_module."):
                fuse[k[len("fuse_module."):]] = v
            else:
                raise KeyError(f"unmapped bevencode key {key}")
            continue
        raise KeyError(f"unmapped reference key {key!r} — extend "
                       "coalign_tpu/utils/ckpt_import.py")
    if fuse:
        _map_one_fusion(fuse, out, "bevencode/fuse")


def _map_pixor_family(state_dict: dict, out: _Tree):
    """PIXOR family (ref pixor.py:256 / pixor_intermediate.py:38):
    backbone stem + Bottleneck stages + FPN laterals/deconvs, 4-conv
    header with dense cls/reg heads. Both variants share the key space —
    the intermediate's AttFusion (self_attn.py:48) is parameterless.
    Biased conv fields appear exactly when the checkpoint was trained
    with use_bn: false; they map to the same flax modules."""
    for key, v in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        m = re.match(
            r"backbone\.block(\d)\.(\d+)\."
            r"(conv\d|bn\d|downsample\.[01])\.(\w+)$", key)
        if m:
            parts = {"conv1": "conv1", "bn1": "bn1", "conv2": "conv2",
                     "bn2": "bn2", "conv3": "conv3", "bn3": "bn3",
                     "downsample.0": "down_conv", "downsample.1": "down_bn"}
            path = (f"backbone/block{m.group(1)}_{m.group(2)}"
                    f"/{parts[m.group(3)]}")
            if m.group(3).startswith("bn") or m.group(3) == "downsample.1":
                out.bn(path, m.group(4), v)
            elif m.group(4) == "weight":
                out.params[f"{path}/kernel"] = _conv(v)
            else:
                out.params[f"{path}/bias"] = v
            continue
        m = re.match(r"backbone\.(conv[12]|bn[12]|latlayer\d|deconv\d)"
                     r"\.(\w+)$", key)
        if m:
            name, field = m.groups()
            if name.startswith("bn"):
                out.bn(f"backbone/{name}", field, v)
            elif field == "bias":
                out.params[f"backbone/{name}/bias"] = v
            elif name.startswith("deconv"):
                out.params[f"backbone/{name}/kernel"] = _tconv(v)
            else:
                out.params[f"backbone/{name}/kernel"] = _conv(v)
            continue
        m = re.match(r"header\.(conv\d|bn\d|clshead|reghead)\.(\w+)$", key)
        if m:
            name, field = m.groups()
            if name.startswith("bn"):
                out.bn(f"header/{name}", field, v)
            elif field == "weight":
                out.params[f"header/{name}/kernel"] = _conv(v)
            else:
                out.params[f"header/{name}/bias"] = v
            continue
        raise KeyError(f"unmapped reference key {key!r} — extend "
                       "coalign_tpu/utils/ckpt_import.py")


_HEAD_RE = re.compile(r"(cls|reg|dir|iou|unc)_head\.(weight|bias)$")

# ref sparse_backbone_3d.py:33 VoxelBackBone8x block order -> flax
# models/voxel_backbone.py Conv3DBNReLU creation order
_SECOND_3D_SLOTS = {
    "conv_input": 0, "conv1.0": 1,
    "conv2.0": 2, "conv2.1": 3, "conv2.2": 4,
    "conv3.0": 5, "conv3.1": 6, "conv3.2": 7,
    "conv4.0": 8, "conv4.1": 9, "conv4.2": 10,
    "conv_out": 11,
}


def _conv3d_weight(w, target):
    """spconv sparse-conv weight -> flax (kd, kh, kw, in, out).

    spconv 1.x (the version the published reference checkpoints use)
    stores (kd, kh, kw, in, out) — a direct copy; spconv 2.x stores
    (out, kd, kh, kw, in). Disambiguated against the target shape when
    known, else spconv1 is assumed.
    """
    if target is not None and tuple(w.shape) != tuple(target.shape):
        return np.transpose(w, (1, 2, 3, 4, 0))  # spconv2 -> flax
    return w


_SSFA_CONV_SLOTS = {
    # torch Sequential (module, conv index) -> flax SSFA ConvBNReLU index
    # (ZeroPad2d at bottom_up_block_0[0] shifts that block's indices)
    ("bottom_up_block_0", 1): 0, ("bottom_up_block_0", 4): 1,
    ("bottom_up_block_0", 7): 2,
    ("bottom_up_block_1", 0): 3, ("bottom_up_block_1", 3): 4,
    ("bottom_up_block_1", 6): 5,
    ("trans_0", 0): 6, ("trans_1", 0): 7,
    ("conv_0", 0): 8, ("conv_1", 0): 9,
}

_SSFA_HEAD_NAMES = {"conv_cls": "cls_head", "conv_box": "reg_head",
                    "conv_dir": "dir_head", "conv_iou": "iou_head"}


def _map_ssfa(sub: dict, out: _Tree, prefix: str):
    """ref cia_ssd_utils.py:6 SSFA -> voxel_backbone.py SSFA. Deconvs use
    the torch ConvTranspose2d(k3, s2, p1, op1) convention (kernel flip via
    _tconv, flax padding (1, 2)); w_0/w_1 are conv(bias=False)+BN pairs."""
    for k, v in sub.items():
        m = re.match(r"(\w+)\.(\d+)\.(\w+)$", k)
        if not m:
            raise KeyError(f"unrecognized ssfa key {k}")
        mod, j, field = m.group(1), int(m.group(2)), m.group(3)
        if mod.startswith("deconv_block"):
            i = int(mod[-1])
            if j == 0:
                out.params[f"{prefix}/ConvTranspose_{i}/kernel"] = _tconv(v)
            else:
                out.bn(f"{prefix}/MaskedBatchNorm_{i}", field, v)
        elif mod.startswith("w_"):
            i = int(mod[-1])
            if j == 0:
                out.params[f"{prefix}/Conv_{i}/kernel"] = _conv(v)
            else:
                out.bn(f"{prefix}/MaskedBatchNorm_{2 + i}", field, v)
        else:
            # conv at base index, BN at base+1 within each (conv, BN, ReLU)
            base_candidates = [(mod, j), (mod, j - 1)]
            slot = next((_SSFA_CONV_SLOTS[c] for c in base_candidates
                         if c in _SSFA_CONV_SLOTS), None)
            if slot is None:
                raise KeyError(f"unrecognized ssfa key {k}")
            path = f"{prefix}/ConvBNReLU_{slot}"
            if (mod, j) in _SSFA_CONV_SLOTS:  # the conv itself
                out.params[f"{path}/Conv_0/kernel"] = _conv(v)
            else:  # the BN right after it
                out.bn(f"{path}/MaskedBatchNorm_0", field, v)


def _map_second_family(state_dict: dict, out: _Tree, target_params):
    """ref second.py:14 / second_ssfa.py:16 / ciassd.py trunk keys -> the
    @nn.compact-named flax tree (VoxelBackbone8x_0 / BaseBEVBackbone_0 or
    SSFA_0 / DetectionHeads_0). The first 2D conv consumes the
    height-compressed grid, flattened C-major by torch
    (height_compression.py:24 view) but D-major here
    (voxel_backbone.height_compression) — its kernel input rows are
    permuted accordingly."""
    backbone2d = {}
    ssfa = {}
    c3d_out = None
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        # second_ssfa.py names the 3D trunk spconv_block and the heads
        # conv_{cls,box,iou,dir} under head.
        key = key.replace("spconv_block.", "backbone_3d.", 1)
        if key.startswith("backbone_2d."):
            backbone2d[key[len("backbone_2d."):]] = value
            continue
        if key.startswith("ssfa."):
            ssfa[key[len("ssfa."):]] = value
            continue
        m = re.match(r"head\.(conv_cls|conv_box|conv_iou|conv_dir)"
                     r"\.(weight|bias)$", key)
        if m:
            path = f"DetectionHeads_0/{_SSFA_HEAD_NAMES[m.group(1)]}"
            if m.group(2) == "weight":
                out.params[f"{path}/kernel"] = _conv(value)
            else:
                out.params[f"{path}/bias"] = value
            continue
        m = _HEAD_RE.match(key)
        if m:
            name, field = m.groups()
            path = f"DetectionHeads_0/{name}_head"
            if field == "weight":
                out.params[f"{path}/kernel"] = _conv(value)
            else:
                out.params[f"{path}/bias"] = value
            continue
        m = re.match(r"backbone_3d\.(conv_input|conv_out|conv\d\.\d)"
                     r"\.([01])\.(\w+)$", key)
        if not m:
            raise KeyError(f"unmapped second-family key {key!r} — extend "
                           "coalign_tpu/utils/ckpt_import.py")
        slot = _SECOND_3D_SLOTS[m.group(1)]
        path = f"VoxelBackbone8x_0/Conv3DBNReLU_{slot}"
        if int(m.group(2)) == 0:
            tkey = f"{path}/Conv_0/kernel"
            target = None if target_params is None else target_params.get(tkey)
            out.params[tkey] = _conv3d_weight(value, target)
        else:
            out.bn(f"{path}/MaskedBatchNorm_0", m.group(3), value)
            if m.group(1) == "conv_out" and m.group(3) == "weight":
                c3d_out = len(value)
    first = None
    if backbone2d:
        _map_backbone(backbone2d, out, "BaseBEVBackbone_0", target_params)
        first = "BaseBEVBackbone_0/stages_0/ConvBNReLU_0/Conv_0/kernel"
    if ssfa:
        _map_ssfa(ssfa, out, "SSFA_0")
        first = "SSFA_0/ConvBNReLU_0/Conv_0/kernel"
    if first and c3d_out and first in out.params:
        # C-major (torch) -> D-major (here) height-compression row permute
        w = out.params[first]  # (kh, kw, C*D, O)
        kh, kw, cd, o = w.shape
        d = cd // c3d_out
        if d > 1:
            out.params[first] = w.reshape(kh, kw, c3d_out, d, o).transpose(
                0, 1, 3, 2, 4).reshape(kh, kw, cd, o)

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
    if any(k.startswith(("backbone_3d.", "spconv_block."))
           for k in state_dict):
        _map_second_family(state_dict, out, target_params)
        return dict(zip(("params", "batch_stats"), out.finish()))
    if any(k.startswith("camencode.") for k in state_dict):
        _map_lss_family(state_dict, out)
        return dict(zip(("params", "batch_stats"), out.finish()))
    if any(k.startswith("header.") for k in state_dict):
        _map_pixor_family(state_dict, out)
        return dict(zip(("params", "batch_stats"), out.finish()))
    backbone = {}
    fusion = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("backbone."):
            backbone[key[len("backbone."):]] = value
            continue
        if key.startswith("fusion_net."):
            fusion[key[len("fusion_net."):]] = value
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
    if fusion:
        _map_fusion(fusion, out)
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
