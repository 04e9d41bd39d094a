import numpy as np
import jax
import jax.numpy as jnp

from coalign_tpu.loss import build_loss

LOSS_ARGS = {
    "pos_cls_weight": 2.0,
    "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
    "reg": {"sigma": 3.0, "weight": 2.0},
    "dir": {"weight": 0.2,
            "args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]}},
}


def _fake_data(rng, b=2, h=8, w=8, a=2):
    pos = np.zeros((b, h, w, a), np.float32)
    pos[:, 2, 3, 0] = 1
    neg = 1 - pos
    targets = rng.normal(size=(b, h, w, a * 7)).astype(np.float32) * 0.1
    outputs = {
        "cls_preds": jnp.asarray(rng.normal(size=(b, h, w, a)), jnp.float32),
        "reg_preds": jnp.asarray(rng.normal(size=(b, h, w, a * 7)), jnp.float32),
        "dir_preds": jnp.asarray(rng.normal(size=(b, h, w, a * 2)), jnp.float32),
    }
    labels = {"pos_equal_one": jnp.asarray(pos),
              "neg_equal_one": jnp.asarray(neg),
              "targets": jnp.asarray(targets)}
    return outputs, labels


def test_loss_finite_and_positive(rng):
    loss_fn = build_loss(LOSS_ARGS)
    outputs, labels = _fake_data(rng)
    total, metrics = loss_fn(outputs, labels)
    assert np.isfinite(float(total)) and float(total) > 0
    assert set(metrics) >= {"cls_loss", "reg_loss", "dir_loss", "total_loss"}


def test_perfect_predictions_minimize_reg(rng):
    loss_fn = build_loss(LOSS_ARGS)
    outputs, labels = _fake_data(rng)
    perfect = dict(outputs, reg_preds=labels["targets"])
    _, m_perfect = loss_fn(perfect, labels)
    _, m_rand = loss_fn(outputs, labels)
    assert float(m_perfect["reg_loss"]) < float(m_rand["reg_loss"])
    assert float(m_perfect["reg_loss"]) < 1e-6


def test_sample_mask_excludes_padded(rng):
    loss_fn = build_loss(LOSS_ARGS)
    outputs, labels = _fake_data(rng, b=4)
    # samples 2,3 padded: loss must equal loss on first two alone
    mask = jnp.asarray([True, True, False, False])
    total_masked, _ = loss_fn(outputs, labels, sample_mask=mask)
    outputs2 = {k: v[:2] for k, v in outputs.items()}
    labels2 = {k: v[:2] for k, v in labels.items()}
    total2, _ = loss_fn(outputs2, labels2)
    np.testing.assert_allclose(float(total_masked), float(total2), rtol=1e-5)


def test_loss_differentiable(rng):
    loss_fn = build_loss(LOSS_ARGS)
    outputs, labels = _fake_data(rng)

    def f(cls_preds):
        total, _ = loss_fn(dict(outputs, cls_preds=cls_preds), labels)
        return total

    g = jax.grad(f)(outputs["cls_preds"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
