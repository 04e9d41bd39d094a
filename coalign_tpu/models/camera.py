"""Lift-Splat-Shoot camera BEV models (single-agent + collaborative).

TPU-first rework of ref opencood/models/lift_splat_shoot.py:16 /
lift_splat_shoot_intermediate.py:18 and opencood/models/sub_modules/
lss_submodule.py. The camera encoders are ARCHITECTURE-EXACT counterparts
of the reference's trunks (EfficientNet-b0 / ResNet-101 slice — see
models/camera_trunks.py), so trained reference checkpoints import through
utils/ckpt_import.py like the lidar families; lift/splat run through
ops/lss.py (one einsum chain + segment_sum splat instead of the CUDA
QuickCumsum); the BEV encoders mirror BevEncode / BevEncodeSSFusion /
BevEncodeMSFusion (ref lss_submodule.py:247/:287/:360) with the fusion
step dispatched through the shared fusion registry.

Camera batch contract (``image_inputs`` subtree, Appendix A of SURVEY.md):
  imgs       (B, L, N, H, W, 3)  normalized images
  rots       (B, L, N, 3, 3)     camera->lidar rotation
  trans      (B, L, N, 3)        camera->lidar translation
  intrins    (B, L, N, 3, 3)
  post_rots  (B, L, N, 3, 3)     image-space aug transform
  post_trans (B, L, N, 3)
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.models import register_model
from coalign_tpu.models.camera_trunks import (EfficientNetB0,
                                              ResNet18Layers,
                                              ResNet101Trunk, TorchUp,
                                              upsample_align_corners)
from coalign_tpu.models.fuse.fusion import build_fusion
from coalign_tpu.models.heads import DetectionHeads
from coalign_tpu.models.layers import DownsampleConv, MaskedBatchNorm
from coalign_tpu.ops.lss import LSSSpec, get_geometry, voxel_pool
from coalign_tpu.utils.transforms import normalize_pairwise_tfm


class CamEncode(nn.Module):
    """EfficientNet-b0 image encoder -> (context C, depth logits D) at
    /8 (ref lss_submodule.py:41 CamEncode): trunk endpoints, up1 fuses
    reduction_5+4 to /16, up2 fuses with reduction_3 to /8 (downsample=8),
    then 1x1 depth/image heads on the shared 512-ch feature."""

    depth_bins: int
    cam_channels: int
    downsample: int = 8
    use_gt_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        r3, r4, r5 = EfficientNetB0(name="trunk")(x, train=train)
        f = TorchUp(512, 2, name="up1")(r5, r4, train=train)
        if self.downsample == 8:
            f = TorchUp(512, 2, name="up2")(f, r3, train=train)
        context = nn.Conv(self.cam_channels, (1, 1), name="image_head")(f)
        if self.use_gt_depth:
            return context, None
        depth_logits = nn.Conv(self.depth_bins, (1, 1),
                               name="depth_head")(f)
        return context, depth_logits


class CamEncodeResnet101(nn.Module):
    """ResNet-101-through-layer2 image encoder (ref lss_submodule.py:142
    CamEncode_Resnet101): 512 ch at /8, then 1x1 depth/image heads.
    (The reference also CONSTRUCTS up1/up2 blocks it never calls in the
    downsample=8 path — those dead keys are dropped on import.)"""

    depth_bins: int
    cam_channels: int
    downsample: int = 8
    use_gt_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ResNet101Trunk(name="trunk")(x, train=train)
        context = nn.Conv(self.cam_channels, (1, 1), name="image_head")(f)
        if self.use_gt_depth:
            return context, None
        depth_logits = nn.Conv(self.depth_bins, (1, 1),
                               name="depth_head")(f)
        return context, depth_logits


class BevEncode(nn.Module):
    """Single-agent BEV encoder (ref lss_submodule.py:247): resnet18
    layers 1-3, Up(64+256 -> 256, x4), then upsample-conv-BN-ReLU-1x1 back
    to full BEV resolution with ``out_ch`` channels."""

    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1, _, x3 = ResNet18Layers(name="trunk")(x, train=train)
        y = TorchUp(256, 4, name="up1")(x3, x1, train=train)
        y = upsample_align_corners(y, 2)
        y = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    name="up2_conv")(y)
        y = MaskedBatchNorm(epsilon=1e-5, name="up2_bn")(y, train=train)
        y = nn.relu(y)
        return nn.Conv(self.out_ch, (1, 1), name="up2_out")(y)


class BevEncodeFusion(nn.Module):
    """Collaborative BEV encoder (ref lss_submodule.py:287
    BevEncodeSSFusion / :360 BevEncodeMSFusion): resnet18 trunk, U-Net
    decode via up_layer2/up_layer1, 128-ch down_layer head. ``ms`` fuses
    each encoder scale (parameterless max/att, matching the reference's
    plain-list fuse modules); SS fuses the decoded 256-ch map once with a
    possibly parameterized fusion (att/max/disconet/v2vnet/v2xvit/
    when2comm). Returns (x_single, x_fuse), both 128 ch at BEV/2."""

    fusion_args: Dict[str, Any]
    ms: bool

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        b, l = agent_mask.shape
        method = self.fusion_args.get("core_method", "att")
        for suf in ("_ms", "_ss"):
            method = method.removesuffix(suf)
        sub_args = self.fusion_args.get("args", self.fusion_args)

        x1, x2, x3 = ResNet18Layers(name="trunk")(x, train=train)
        up2 = TorchUp(256, 2, name="up_layer2")
        up1 = TorchUp(256, 2, name="up_layer1")
        down1 = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, name="down1")
        down2 = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, name="down2")

        def down(y):
            return nn.relu(down2(nn.relu(down1(y))))

        def fuse(feat, name):
            h, w, c = feat.shape[1:]
            net = build_fusion(method, sub_args, c).clone(name=name,
                                                          parent=self)
            return net(feat.reshape(b, l, h, w, c), affine, agent_mask,
                       train=train)

        x_single = down(up1(up2(x3, x2, train=train), x1, train=train))
        if self.ms:
            f1, f2, f3 = (fuse(x1, "fuse_0"), fuse(x2, "fuse_1"),
                          fuse(x3, "fuse_2"))
            x_fuse = down(up1(up2(f3, f2, train=train), f1, train=train))
        else:
            y = up1(up2(x3, x2, train=train), x1, train=train)
            x_fuse = down(fuse(y, "fuse"))
        return x_single, x_fuse


class _LSSBase(nn.Module):
    args: Dict[str, Any]

    @classmethod
    def from_config(cls, args: dict):
        return cls(args=dict(args))

    @property
    def spec(self) -> LSSSpec:
        return LSSSpec.from_config(self.args["grid_conf"],
                                   self.args["data_aug_conf"],
                                   self.args.get("img_downsample", 8))

    @property
    def bev_out(self) -> int:
        # reference knob is ``bevout_feature`` (lift_splat_shoot.py:21);
        # ``bev_out_channels`` kept as an accepted alias
        return int(self.args.get("bevout_feature",
                                 self.args.get("bev_out_channels", 128)))

    def _make_heads(self, name: str = "heads"):
        return DetectionHeads(
            anchor_number=self.args["anchor_number"],
            use_dir="dir_args" in self.args,
            num_bins=self.args.get("dir_args", {}).get("num_bins", 2),
            name=name,
        )

    def _shrink(self, x, train):
        if "shrink_header" in self.args:
            cfg = self.args["shrink_header"]
            x = DownsampleConv(dims=tuple(cfg["dim"]),
                               kernel_sizes=tuple(cfg["kernal_size"]),
                               strides=tuple(cfg["stride"]),
                               paddings=tuple(cfg["padding"]),
                               name="shrink")(x, train=train)
        return x

    def _lift_splat(self, image_inputs, train, freeze=False):
        """(F=B*L agent frames) x N cams -> (F, ny, nx, nz*C) BEV.

        With ``use_gt_depth`` and a ``depth_map`` input, the learned depth
        distribution is replaced by the one-hot of the binned gt depth
        (ref lss_submodule.py:51-69 use_gt_depth / get_gt_depth_dist).
        ``freeze`` stop-gradients the camera encoder, mirroring the
        reference's requires_grad=False on camencode in the intermediate
        model (lift_splat_shoot_intermediate.py:30)."""
        spec = self.spec
        imgs = image_inputs["imgs"]
        lead = imgs.shape[:-3]  # (B, L, N) or (F, N)
        f = int(np.prod(lead[:-1]))
        n = lead[-1]
        imgs = imgs.reshape((f * n,) + imgs.shape[-3:])
        cam_c = self.args.get("img_features", 64)
        enc_cls = (CamEncodeResnet101
                   if "resnet" in self.args.get(
                       "camera_encoder", "EfficientNet").lower()
                   else CamEncode)
        context, depth_logits = enc_cls(
            depth_bins=spec.depth_bins, cam_channels=cam_c,
            downsample=spec.downsample,
            use_gt_depth=bool(self.args.get("use_depth_gt",
                                            self.args.get("use_gt_depth"))),
            name="camencode")(imgs, train=train)
        if freeze:
            context = jax.lax.stop_gradient(context)
            if depth_logits is not None:
                depth_logits = jax.lax.stop_gradient(depth_logits)
        fh, fw = spec.feat_hw
        if depth_logits is None or (
                self.args.get("use_depth_gt", self.args.get("use_gt_depth"))
                and "depth_map" in image_inputs):
            from coalign_tpu.ops.lss import bin_depths

            dm = image_inputs["depth_map"].reshape(
                (f * n,) + image_inputs["depth_map"].shape[-2:])
            ds_ = spec.downsample
            dm = dm[:, ::ds_, ::ds_][:, :fh, :fw]
            idx = bin_depths(dm, spec.mode, spec.ddiscr[0],
                             spec.ddiscr[1], spec.depth_bins)
            depth = jax.nn.one_hot(idx, spec.depth_bins, axis=-1)
        else:
            depth = jax.nn.softmax(depth_logits, axis=-1)
        from coalign_tpu.models.layers import compute_dtype
        if compute_dtype() is not None:
            # bf16 lift + splat under the mixed-precision policy: the
            # (F, N, D, fH, fW, C) lifted tensor and the voxel_pool
            # scatter-add are the LSS step's dominant HBM traffic
            # (64 ms of the 152 ms step was the f32 splat; v5e trace,
            # 2026-08-20). The downstream BEV encoder is bf16 anyway.
            depth = depth.astype(compute_dtype())
            context = context.astype(compute_dtype())
        # outer product: (fH, fW, D) x (fH, fW, C) -> (D, fH, fW, C)
        feats = jnp.moveaxis(depth[..., None] * context[..., None, :],
                             -2, -4)
        d, fh, fw, c = feats.shape[1:]
        feats = feats.reshape(f, n, d, fh, fw, c)

        frustum = jnp.asarray(spec.frustum())
        r = lambda a: a.reshape((f, n) + a.shape[len(lead):])
        geom = jax.vmap(lambda ro, tr, k, pr, pt: get_geometry(
            frustum, ro, tr, k, pr, pt))(
            r(image_inputs["rots"]), r(image_inputs["trans"]),
            r(image_inputs["intrins"]), r(image_inputs["post_rots"]),
            r(image_inputs["post_trans"]))
        bev = jax.vmap(lambda g, x: voxel_pool(g, x, spec))(geom, feats)
        if depth_logits is None:
            return bev, None
        return bev, depth_logits.reshape(f, n, fh, fw, -1)


@register_model("lift_splat_shoot")
class LiftSplatShoot(_LSSBase):
    """Single-agent camera detector (ref lift_splat_shoot.py:16)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        bev, depth_logits = self._lift_splat(batch["image_inputs"], train)
        x = BevEncode(out_ch=self.bev_out, name="bevencode")(
            bev, train=train)
        x = self._shrink(x, train)
        out = self._make_heads()(x)
        if depth_logits is not None:
            out["depth_logits"] = depth_logits
        return out


@register_model("lift_splat_shoot_intermediate")
class LiftSplatShootIntermediate(_LSSBase):
    """Collaborative camera detector with SS/MS BEV fusion
    (ref lift_splat_shoot_intermediate.py:18-68). The camera encoder is
    frozen during training exactly like the reference (:30-31) unless
    ``freeze_camencode: false``."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        spec = self.spec
        freeze = train and self.args.get("freeze_camencode", True)
        bev, depth_logits = self._lift_splat(batch["image_inputs"], train,
                                             freeze=freeze)

        fusion_args = self.args.get("fusion_args", {})
        ms = fusion_args.get("core_method", "att_ms").endswith("ms")
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], spec.ny, spec.nx, spec.xbound[2])
        single_out, fused = BevEncodeFusion(
            fusion_args=fusion_args, ms=ms, name="bevencode")(
            bev, affine=affine, agent_mask=batch["agent_mask"], train=train)

        out = self._make_heads()(fused)
        if depth_logits is not None:
            out["depth_logits"] = depth_logits
        if self.args.get("supervise_single", False):
            for k, v in self._make_heads(name="heads_single")(
                    single_out).items():
                out[k + "_single"] = v
        return out
