"""Stage-1 GAN training-step semantics (reference tostagesolver.py:86-178)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmfusion.config import load_config
from dmfusion.models import build_model
from dmfusion.train.gan import GanPrograms


@pytest.fixture(scope="module")
def gan_setup():
    cfg = load_config(overrides={
        "data_city": "synth64", "gan_width": 8,
        "dqtl": {"pic_size": 32, "batch_size": 2, "lr": 1e-3},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    })
    gen_p = build_model(cfg, "generator")
    gen_m = build_model(cfg, "generator")
    disc_p = build_model(cfg, "discriminator")
    disc_m = build_model(cfg, "discriminator")
    prog = GanPrograms(gen_p, gen_m, disc_p, disc_m, cfg)
    # train_epoch donates its state argument, so every test needs a fresh
    # state tree.
    return prog, lambda: prog.init(jax.random.PRNGKey(0), 32, 4)


def test_gan_epoch_updates_all_four_nets(gan_setup):
    prog, make_state = gan_setup
    state = make_state()
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.random((3, 2, 32, 32, 4)), jnp.float32)
    p = jnp.asarray(rng.random((3, 2, 32, 32, 4)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    before = jax.tree.map(np.asarray, state["params"])
    new_state, out = prog.train_epoch(state, m, p, keys)
    after = new_state["params"]
    for net in ("gP", "gM", "dP", "dM"):
        b = jax.tree.leaves(before[net])
        a = jax.tree.leaves(jax.tree.map(np.asarray, after[net]))
        assert any(not np.allclose(x, y) for x, y in zip(b, a)), net
    # Per-step fakes collected with the right shapes + finite losses.
    assert out["fake_pan"].shape == (3, 2, 32, 32, 4)
    assert np.isfinite(np.asarray(out["d_loss"])).all()
    assert np.isfinite(np.asarray(out["g_loss"])).all()


def test_gan_losses_move(gan_setup):
    prog, make_state = gan_setup
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.random((4, 2, 32, 32, 4)), jnp.float32)
    p = jnp.asarray(rng.random((4, 2, 32, 32, 4)), jnp.float32)
    st = make_state()
    g_losses = []
    for e in range(3):
        keys = jax.random.split(jax.random.PRNGKey(10 + e), 4)
        st, out = prog.train_epoch(st, m, p, keys)
        g_losses.append(float(out["g_loss"][-1]))
    # Generator loss should drop as G learns to fool the young D.
    assert g_losses[-1] < g_losses[0]
