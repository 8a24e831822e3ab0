"""Loss parity vs independent numpy derivations of the reference formulas
(train/loss_function.py, utils/utils.py:22-36)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmfusion.train.losses import cross_entropy, kl, l1, make_loss, mse, qua_loss


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_kl_batchmean(log_input, target):
    # torch F.kl_div(input, target, reduction='batchmean') with 0 log 0 = 0
    with np.errstate(divide="ignore", invalid="ignore"):
        lt = np.where(target > 0, np.log(np.where(target > 0, target, 1.0)), 0.0)
    return (target * (lt - log_input)).sum() / log_input.shape[0]


def test_elementwise_losses(rng):
    a = rng.standard_normal((6, 5)).astype(np.float32)
    b = rng.standard_normal((6, 5)).astype(np.float32)
    np.testing.assert_allclose(float(mse(jnp.asarray(a), jnp.asarray(b))),
                               ((a - b) ** 2).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(l1(jnp.asarray(a), jnp.asarray(b))),
                               np.abs(a - b).mean(), rtol=1e-6)


def test_kl_batchmean_matches_torch_semantics(rng):
    target = _np_softmax(rng.standard_normal((4, 7)).astype(np.float64))
    logits = rng.standard_normal((4, 7)).astype(np.float64)
    log_input = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    got = float(kl(jnp.asarray(log_input), jnp.asarray(target)))
    want = _np_kl_batchmean(log_input, target)
    np.testing.assert_allclose(got, want, rtol=1e-5)  # jnp computes in f32


def test_cross_entropy_masked(rng):
    logits = rng.standard_normal((4, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 1])
    mask = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(mask)))
    p = _np_softmax(logits.astype(np.float64))
    per = -np.log(p[np.arange(4), labels])
    np.testing.assert_allclose(got, per[:2].mean(), rtol=1e-5)


def _np_qua_loss(out, bs, t, cfg):
    """Independent numpy derivation of the quadruplet loss
    (train/loss_function.py:15-76 semantics)."""
    d = cfg["dqtl"]
    eps, tao = d["epsilon"], d["tao"]
    alpha, beta, gamma = d["alpha"], d["beta"], d["gamma"]
    data = _np_softmax(out)
    p, q, r, s = data[:bs], data[bs:2*bs], data[2*bs:3*bs], data[3*bs:4*bs]

    def term(x, y):
        return _np_kl_batchmean(np.log(x + eps), y)

    loss = 0.0
    if alpha != 0:
        l1_ = term(q, p) + term(r, p) + abs(term(s, p) - term(r, p) + tao)
        l2_ = term(p, q) + term(r, q) + abs(term(s, q) - term(r, q) + tao)
        loss += alpha * (l1_ + l2_)
    if beta != 0:
        l3 = np.mean(np.exp(-np.abs(term(s, p) / p)) +
                     np.exp(-np.abs(term(s, q) / q)))
        loss += beta * l3
    onehot = np.zeros_like(p)
    onehot[np.arange(bs), t] = 1.0
    soft_label = _np_softmax(onehot)
    pq_log = np.log(_np_softmax(p + q))
    loss += gamma * _np_kl_batchmean(pq_log, soft_label)
    return loss


@pytest.mark.parametrize("alpha,beta", [(0.1, 0.0), (0.1, 0.5), (0.0, 0.0)])
def test_qua_loss_golden(rng, alpha, beta):
    bs, c = 5, 8
    out = rng.standard_normal((4 * bs, c)).astype(np.float64)
    t = rng.integers(1, c, bs)
    cfg = {"dqtl": {"epsilon": 1e-8, "tao": 0.1, "alpha": alpha,
                    "beta": beta, "gamma": 1.0}}
    got = float(qua_loss(jnp.asarray(out), bs, jnp.asarray(t), cfg))
    want = _np_qua_loss(out, bs, t, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("alpha,beta", [(0.1, 0.5), (0.0, 0.0)])
def test_qua_loss_masked_equals_trimmed(rng, alpha, beta):
    """Masked qua_loss over a padded batch == unmasked qua_loss over the
    valid rows only (padding must not pollute the KL batch-means)."""
    bs, valid, c = 8, 5, 6
    out = rng.standard_normal((4 * bs, c)).astype(np.float64)
    t = rng.integers(1, c, bs)
    mask = np.zeros(bs, np.float32)
    mask[:valid] = 1.0
    cfg = {"dqtl": {"epsilon": 1e-8, "tao": 0.1, "alpha": alpha,
                    "beta": beta, "gamma": 1.0}}
    got = float(qua_loss(jnp.asarray(out), bs, jnp.asarray(t), cfg,
                         jnp.asarray(mask)))
    trimmed = np.concatenate([out[i * bs: i * bs + valid]
                              for i in range(4)])
    want = float(qua_loss(jnp.asarray(trimmed), valid,
                          jnp.asarray(t[:valid]), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_make_loss_factory():
    cfg = {"dqtl": {"epsilon": 1e-8, "tao": 0.1, "alpha": 0.1, "beta": 0.0,
                    "gamma": 1.0}}
    assert make_loss("MSE", cfg) is mse
    assert make_loss("L1", cfg) is l1
    assert make_loss("Criterion", cfg) is cross_entropy
    assert make_loss("KL", cfg) is kl
    assert callable(make_loss("qua_loss", cfg))
    with pytest.raises(ValueError):
        make_loss("nope", cfg)
