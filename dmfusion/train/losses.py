"""Loss factory + the quadruplet-KL ("qua") loss.

``make_loss`` mirrors the reference factory (utils/utils.py:22-36):
MSE / L1 / Criterion (cross-entropy) / KL / qua_loss, selected by the
``schedule.loss`` config string.

``qua_loss`` reimplements train/loss_function.py:15-76 in jnp with the
same term structure: after a softmax over the concatenated 4-stream
logits (M, P, GM, GP), six pairwise ``batchmean`` KL terms with epsilon
smoothing plus hinge terms ``|KL(M,GP) - KL(M,GM) + tao|`` form l1/l2, an
exp-balance term forms l3, and a KL between softmax(p+q) and the
softmaxed one-hot labels forms l4; the total is
``alpha * (l1 + l2) + beta * l3 + gamma * l4`` with zero-coefficient
short-circuits.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax


def _kl_batchmean(log_input: jnp.ndarray, target: jnp.ndarray,
                  weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch.nn.functional.kl_div(log_input, target, reduction='batchmean'):
    sum(target * (log target - log_input)) / batch, with 0 log 0 := 0.

    ``weights`` (B,) turns the batch mean into a weighted mean — used to
    exclude padded rows from eval batches (zero weight) while keeping
    static shapes."""
    safe_log_t = jnp.where(target > 0, jnp.log(jnp.where(target > 0, target, 1.0)), 0.0)
    pointwise = target * (safe_log_t - log_input)
    if weights is None:
        return pointwise.sum() / log_input.shape[0]
    w = weights.astype(pointwise.dtype)
    return (pointwise.sum(axis=-1) * w).sum() / jnp.maximum(w.sum(), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean integer-label CE (reference nn.CrossEntropyLoss)."""
    per = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32))
    if mask is None:
        return per.mean()
    m = mask.astype(per.dtype)
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def kl(log_pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return _kl_batchmean(log_pred, target)


def qua_loss(out: jnp.ndarray, bs: int, targets: jnp.ndarray,
             cfg: Mapping[str, Any],
             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Quadruplet KL loss over 4-stream concatenated logits (4*bs, C).

    ``mask`` (bs,) — optional per-sample validity weights; padded rows
    (static-shape eval batches) are excluded from every batch-mean so the
    reported loss is exact for partial batches."""
    d = cfg["dqtl"]
    eps = d["epsilon"]
    tao = d["tao"]
    alpha, beta, gamma = d["alpha"], d["beta"], d["gamma"]

    data = jax.nn.softmax(out, axis=-1)
    p, q, r, s = (data[:bs], data[bs:2 * bs], data[2 * bs:3 * bs],
                  data[3 * bs:4 * bs])

    def term(x, y):
        return _kl_batchmean(jnp.log(x + eps), y, mask)

    loss = jnp.float32(0.0)
    if alpha != 0:
        kl_m_p = term(q, p)
        kl_m_gm = term(r, p)
        kl_m_gp = term(s, p)
        kl_p_m = term(p, q)
        kl_p_gp = term(r, q)
        kl_p_gm = term(s, q)
        l1_ = kl_m_p + kl_m_gm + jnp.abs(kl_m_gp - kl_m_gm + tao)
        l2_ = kl_p_m + kl_p_gp + jnp.abs(kl_p_gm - kl_p_gp + tao)
        loss = loss + alpha * (l1_ + l2_)
    if beta != 0:
        kl_m_gp = term(s, p)
        kl_p_gm = term(s, q)
        bal = (jnp.exp(-jnp.abs(kl_m_gp / p)) +
               jnp.exp(-jnp.abs(kl_p_gm / q)))
        if mask is None:
            l3_ = jnp.mean(bal)
        else:
            w = mask.astype(bal.dtype)[:, None]
            l3_ = (bal * w).sum() / jnp.maximum(w.sum() * bal.shape[-1], 1.0)
        loss = loss + beta * l3_
    # Classification term: KL(softmax(p+q) || softmaxed one-hot labels)
    # (reference loss_class, train/loss_function.py:46-54).
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), out.shape[-1])
    soft_label = jax.nn.softmax(onehot, axis=-1)
    pq = jax.nn.log_softmax(p + q, axis=-1)
    l4_ = _kl_batchmean(pq, soft_label, mask)
    return loss + gamma * l4_


def make_loss(loss_type: str, cfg: Mapping[str, Any]) -> Callable:
    if loss_type == "MSE":
        return mse
    if loss_type == "L1":
        return l1
    if loss_type == "Criterion":
        return cross_entropy
    if loss_type == "KL":
        return kl
    if loss_type == "qua_loss":
        return lambda out, bs, t, c=cfg, mask=None: qua_loss(out, bs, t, c,
                                                             mask)
    raise ValueError(f"unknown loss {loss_type!r}")
