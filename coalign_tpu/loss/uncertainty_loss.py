"""Uncertainty-aware PointPillars loss (KL / von-Mises NLL).

TPU-first rework of opencood/loss/point_pillar_uncertainty_loss.py:16 +
KLLoss:195: adds a heteroscedastic regression loss on (x, y) with L1/L2 KL
form and a von-Mises negative log-likelihood on yaw using
``log I0(kappa) = log(i0e(kappa)) + kappa`` (jax.scipy.special.i0e replaces
the reference's external ``d3d.mathh`` CUDA log-Bessel,
ref utils/bessel_utils.py:168).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import i0e

from coalign_tpu.loss.point_pillar_loss import (PointPillarLoss,
                                                PointPillarLossCfg,
                                                build_loss as _build_base)


class UncertaintyCfg(NamedTuple):
    dim: int = 3
    weight: float = 1.0
    angle_weight: float = 1.0
    xy_loss_type: str = "l2"
    angle_loss_type: str = "von-mise"
    lambda_v: float = 0.001
    s0: float = 1.0
    limit_period: bool = True


def kl_loss_xy(diff, s, kind: str):
    """0.5 * exp(-s) * |diff|^p + 0.5*s (ref KLLoss.kl_loss_l1/l2)."""
    if kind == "l2":
        return 0.5 * (jnp.exp(-s) * diff ** 2 + s)
    assert kind == "l1"
    return 0.5 * jnp.exp(-s) * jnp.abs(diff) + s


def kl_loss_angular(diff, s, lambda_v, s0, use_limit_period):
    """von-Mises NLL with kappa = exp(-s) (ref KLLoss.kl_loss_angular:243)."""
    kappa = jnp.exp(-s)
    log_i0 = jnp.log(i0e(kappa)) + kappa
    if use_limit_period:
        # heading is ambiguous mod pi: |cos| treats diff and diff+pi alike
        cos_term = jax.lax.stop_gradient(jnp.abs(jnp.cos(diff)))
    else:
        cos_term = jnp.cos(diff)
    return log_i0 - kappa * cos_term + lambda_v * jax.nn.elu(s - s0)


class PointPillarUncertaintyLoss(PointPillarLoss):
    """PointPillarLoss + KL uncertainty term on (x, y, yaw)."""

    def __init__(self, cfg: PointPillarLossCfg, unc_cfg: UncertaintyCfg):
        super().__init__(cfg)
        self.unc = unc_cfg

    def __call__(self, outputs, targets, sample_mask=None, suffix: str = ""):
        total, metrics = super().__call__(outputs, targets, sample_mask,
                                          suffix)
        u = self.unc
        unc_preds = outputs[f"unc_preds{suffix}"]
        b = unc_preds.shape[0]
        # clamp log sigma^2: unbounded confidence drives kappa = exp(-s)
        # to overflow (NaN loss) once the detector overfits
        sm = jnp.clip(unc_preds.reshape(b, -1, u.dim), -7.0, 7.0)
        reg_p = outputs[f"reg_preds{suffix}"].reshape(b, -1, 7)
        reg_t = targets["targets"].reshape(b, -1, 7)
        pos = targets["pos_equal_one"].reshape(b, -1, 1)
        if sample_mask is not None:
            pos = pos * jnp.asarray(sample_mask).astype(pos.dtype)[:, None, None]
        pos_normalizer = jnp.clip(pos.sum(axis=1, keepdims=True), 1.0, None)
        weights = pos / pos_normalizer

        xy_diff = reg_p[..., :2] - reg_t[..., :2]
        loss_xy = kl_loss_xy(xy_diff, sm[..., :2], u.xy_loss_type)
        theta_diff = reg_p[..., 6:7] - reg_t[..., 6:7]
        if u.angle_loss_type == "von-mise":
            loss_a = kl_loss_angular(theta_diff, sm[..., 2:3], u.lambda_v,
                                     u.s0, u.limit_period)
        else:
            loss_a = kl_loss_xy(theta_diff, sm[..., 2:3], "l2")
        unc_loss = jnp.concatenate([loss_xy, u.angle_weight * loss_a],
                                   axis=-1) * weights
        unc_loss = unc_loss.sum() * u.weight / b
        metrics["unc_loss"] = unc_loss
        total = total + unc_loss
        metrics["total_loss"] = total
        return total, metrics


def build_uncertainty_loss(loss_args: dict) -> PointPillarUncertaintyLoss:
    base = _build_base(loss_args)
    ua = loss_args.get("uncertainty", {})
    unc_cfg = UncertaintyCfg(
        dim=ua.get("dim", 3),
        weight=ua.get("weight", 1.0),
        angle_weight=ua.get("angle_weight", 1.0),
        xy_loss_type=ua.get("xy_loss_type", "l2"),
        angle_loss_type=ua.get("angle_loss_type", "von-mise"),
        lambda_v=ua.get("lambda_V", 0.001),
        s0=ua.get("s0", 1.0),
        limit_period=ua.get("limit_period", True),
    )
    return PointPillarUncertaintyLoss(base.cfg, unc_cfg)
