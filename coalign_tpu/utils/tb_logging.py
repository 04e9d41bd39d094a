"""TensorBoard metrics sink (ref criterion.logging -> tensorboardX).

The reference wires a ``tensorboardX.SummaryWriter`` through every loss's
``logging(epoch, batch_id, batch_len, writer)`` (ref
opencood/loss/point_pillar_loss.py:169-204). Here losses return a metrics
dict from the jitted step; this module turns the train-loop callback
stream into TensorBoard scalars. Gated on import so the package has no
hard dependency (torch's bundled writer is used when present).
"""

from __future__ import annotations


def make_tb_callback(log_dir: str, inner=None):
    """Returns (callback, close): callback(metrics_dict) writes every
    numeric entry as a scalar keyed by ``train/<name>`` (val_loss ->
    ``val/loss``), stepped by the dict's ``step``; chains to ``inner``.

    Returns (inner, no-op) when no TensorBoard implementation is
    available.
    """
    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(log_dir=log_dir)
    except Exception:
        try:
            from tensorboardX import SummaryWriter  # type: ignore
            writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            return inner or (lambda m: None), lambda: None

    def callback(metrics: dict):
        step = int(metrics.get("step", 0))
        for k, v in metrics.items():
            if k in ("step", "epoch"):
                continue
            if isinstance(v, (int, float)):
                tag = "val/loss" if k == "val_loss" else f"train/{k}"
                writer.add_scalar(tag, float(v), global_step=step)
        if inner:
            inner(metrics)

    def close():
        writer.flush()
        writer.close()

    return callback, close
