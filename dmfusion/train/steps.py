"""Jitted training/eval/inference programs.

The reference's hot loops are Python ``for`` loops over a DataLoader with
per-batch H2D copies (solver/mainsolver.py:49-55,104-141).  Here one
*epoch* is a single compiled ``lax.scan`` over fixed-shape id batches:
patch gather, forward, backward, optimizer update and metric accumulation
all fuse into one XLA program that never leaves the device.  Batches are
sharded over the mesh 'data' axis via sharding constraints; XLA inserts
the gradient ``psum`` automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from dmfusion.data.patches import gather_dual, gather_quad
from dmfusion.ops.metrics import confusion_matrix
from dmfusion.parallel.mesh import shard_batch
from dmfusion.train.losses import cross_entropy


class DualPrograms:
    """Compiled epoch programs for a dual-branch (ms, pan) classifier.

    Built once per (model, optimizer, scene geometry); reused across
    epochs and experiment repeats — static shapes mean exactly one XLA
    compile per program.
    """

    def __init__(self, model, tx: optax.GradientTransformation,
                 cfg: Mapping[str, Any], width: int, patch: int,
                 mesh: Mesh | None = None,
                 loss_fn: Callable | None = None):
        self.model = model
        self.tx = tx
        self.cfg = cfg
        self.width = width
        self.patch = patch
        self.mesh = mesh
        self.num_classes = cfg["Categories_Number"]
        self.loss_fn = loss_fn or cross_entropy

        self.train_epoch = jax.jit(self._train_epoch, donate_argnums=(0, 1))
        self.eval_epoch = jax.jit(self._eval_epoch)
        self.predict = jax.jit(self._predict)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0, 1))

    # -- initialization ----------------------------------------------------
    def init(self, rng: jax.Array):
        ps = self.patch
        ms = jnp.zeros((1, ps, ps, 4), jnp.float32)
        pan = jnp.zeros((1, 4 * ps, 4 * ps, 1), jnp.float32)
        variables = self.model.init(rng, ms, pan)
        params = variables["params"]
        return params, self.tx.init(params)

    def apply(self, params, ms_b, pan_b):
        return self.model.apply({"params": params}, ms_b, pan_b)

    # -- one optimizer step (exposed for the graft entry / profiling) ------
    def _train_step(self, params, opt_state, ms_b, pan_b, labels_b):
        def lf(p):
            return self.loss_fn(self.apply(p, ms_b, pan_b), labels_b)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # -- whole-epoch programs ----------------------------------------------
    def _gather(self, ms_img, pan_img, ids_b):
        ids_b = shard_batch(self.mesh, ids_b)
        ms_b, pan_b = gather_dual(ms_img, pan_img, ids_b, self.width,
                                  self.patch)
        return shard_batch(self.mesh, ms_b), shard_batch(self.mesh, pan_b)

    def _train_epoch(self, params, opt_state, ms_img, pan_img, ids, labels,
                     mask):
        """ids/labels/mask: (steps, B) -> (params, opt_state, step losses).

        ``mask`` zero-weights the padding tail of the last partial batch so
        sample semantics match the reference DataLoader's drop_last=False.
        """
        def body(carry, batch):
            params, opt_state = carry
            ids_b, labels_b, mask_b = batch
            ms_b, pan_b = self._gather(ms_img, pan_img, ids_b)
            def lf(p):
                return self.loss_fn(self.apply(p, ms_b, pan_b), labels_b,
                                    mask_b)
            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (ids, labels, mask))
        return params, opt_state, losses

    def _eval_epoch(self, params, ms_img, pan_img, ids, labels, mask):
        """Masked eval: returns (sample-weighted loss sum, confusion matrix).

        The loss sum matches the reference's ``val_loss += loss.item() *
        batch_size`` accumulation (solver/mainsolver.py:68-71); the
        confusion matrix is [pred][target] with padding masked out.
        """
        def body(carry, batch):
            loss_sum, conf = carry
            ids_b, labels_b, mask_b = batch
            ms_b, pan_b = self._gather(ms_img, pan_img, ids_b)
            logits = self.apply(params, ms_b, pan_b)
            per = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_b.astype(jnp.int32))
            loss_sum = loss_sum + (per * mask_b).sum()
            pred = jnp.argmax(logits, axis=-1)
            conf = conf + confusion_matrix(pred, labels_b, self.num_classes,
                                           mask_b)
            return (loss_sum, conf), None
        init = (jnp.float32(0.0),
                jnp.zeros((self.num_classes, self.num_classes), jnp.float32))
        (loss_sum, conf), _ = jax.lax.scan(body, init, (ids, labels, mask))
        return loss_sum, conf

    def _predict(self, params, ms_img, pan_img, ids):
        """(steps, B) anchor ids -> (steps, B) argmax class ids."""
        def body(_, ids_b):
            ms_b, pan_b = self._gather(ms_img, pan_img, ids_b)
            logits = self.apply(params, ms_b, pan_b)
            return None, jnp.argmax(logits, axis=-1).astype(jnp.int32)
        _, preds = jax.lax.scan(body, None, ids)
        return preds


class QuadPrograms(DualPrograms):
    """Epoch programs for the two-stage (DQTL) 4-stream classifier.

    The model consumes the 4 streams concatenated along the batch axis
    (reference tostagesolver.py:271: ``torch.concat([d1..d4])``) and the
    prediction rule sums the MS-stream and PAN-stream logits
    (tostagesolver.py:337).
    """

    def __init__(self, model, tx, cfg, width, patch, streams,
                 mesh=None, loss_fn=None):
        self.streams = streams  # (ms, pan_ms, ms_gan, pan_gan) device arrays
        super().__init__(model, tx, cfg, width, patch, mesh, loss_fn)

    def init(self, rng: jax.Array):
        ps = self.patch
        x = jnp.zeros((4, ps, ps, self.streams[0].shape[-1]), jnp.float32)
        params = self.model.init(rng, x)["params"]
        return params, self.tx.init(params)

    def apply(self, params, x):
        return self.model.apply({"params": params}, x)

    def _gather4(self, ids_b):
        ids_b = shard_batch(self.mesh, ids_b)
        parts = gather_quad(*self.streams, ids_b, self.width, self.patch)
        return jnp.concatenate(parts, axis=0)

    def _train_epoch(self, params, opt_state, ids, labels, mask):
        # qua_loss is a batch-level KL composite with no per-sample form,
        # so the solver trims the train set to a batch multiple instead of
        # masking (documented divergence); ``mask`` is accepted for
        # interface uniformity.
        del mask
        bs = ids.shape[1]
        def body(carry, batch):
            params, opt_state = carry
            ids_b, labels_b = batch
            x = self._gather4(ids_b)
            def lf(p):
                return self.loss_fn(self.apply(p, x), bs, labels_b, self.cfg)
            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (ids, labels))
        return params, opt_state, losses

    def _fused_pred(self, params, ids_b):
        bs = ids_b.shape[0]
        logits = self.apply(params, self._gather4(ids_b))
        fused = jax.nn.softmax(logits[:bs] + logits[bs:2 * bs], axis=-1)
        return jnp.argmax(fused, axis=-1).astype(jnp.int32)

    def _eval_epoch(self, params, ids, labels, mask):
        bs = ids.shape[1]
        def body(carry, batch):
            loss_sum, conf = carry
            ids_b, labels_b, mask_b = batch
            x = self._gather4(ids_b)
            loss = self.loss_fn(self.apply(params, x), bs, labels_b, self.cfg)
            loss_sum = loss_sum + loss * mask_b.sum()
            pred = self._fused_pred(params, ids_b)
            conf = conf + confusion_matrix(pred, labels_b, self.num_classes,
                                           mask_b)
            return (loss_sum, conf), None
        init = (jnp.float32(0.0),
                jnp.zeros((self.num_classes, self.num_classes), jnp.float32))
        (loss_sum, conf), _ = jax.lax.scan(body, init, (ids, labels, mask))
        return loss_sum, conf

    def _predict(self, params, ids):
        def body(_, ids_b):
            return None, self._fused_pred(params, ids_b)
        _, preds = jax.lax.scan(body, None, ids)
        return preds
