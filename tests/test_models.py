"""Model-zoo contract tests: every name the reference config mentions
(config.yml:6-8) resolves, initializes, produces (B, C) logits, and is
differentiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmfusion.config import load_config
from dmfusion.models import available_models, build_model

DUAL_MODELS = ["gmfnet", "resnet18", "cross_net", "vision_transformer",
               "swin_transformer", "swin_t_dual", "ct_lstm"]


def tiny_cfg():
    return load_config(overrides={
        "data_city": "synth64",
        "patch_size": 8,
        "model_width": 8,
        "gan_width": 8,
        "trans": {"embed_dim": 16, "num_head": 2, "depth": 1,
                  "depths": [1, 1], "num_heads": [2, 2], "window_size": 2,
                  "patch_size": 1},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    })


@pytest.mark.parametrize("name", DUAL_MODELS)
def test_dual_model_forward(name):
    cfg = tiny_cfg()
    model = build_model(cfg, name)
    ps = cfg["patch_size"]
    b, c = 2, cfg["Categories_Number"]
    key = jax.random.PRNGKey(0)
    ms = jax.random.normal(key, (b, ps, ps, 4))
    pan = jax.random.normal(key, (b, 4 * ps, 4 * ps, 1))
    params = model.init(key, ms, pan)["params"]
    logits = model.apply({"params": params}, ms, pan)
    assert logits.shape == (b, c)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["gmfnet", "vision_transformer"])
def test_dual_model_grad(name):
    # Backward-pass sanity on one conv and one attention model; the rest
    # share the same building blocks (full-zoo grads are exercised by the
    # solver e2e on the default model and would dominate CI compile time
    # on this single-core box).
    cfg = tiny_cfg()
    model = build_model(cfg, name)
    ps = cfg["patch_size"]
    key = jax.random.PRNGKey(0)
    ms = jax.random.normal(key, (2, ps, ps, 4))
    pan = jax.random.normal(key, (2, 4 * ps, 4 * ps, 1))
    params = model.init(key, ms, pan)["params"]

    def loss(p):
        return model.apply({"params": p}, ms, pan).sum()
    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


def test_dqtl_four_stream():
    cfg = tiny_cfg()
    model = build_model(cfg, "dqtl")
    ps = cfg["patch_size"]
    x = jax.random.normal(jax.random.PRNGKey(0), (8, ps, ps, 4))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (8, cfg["Categories_Number"])


def test_gan_pair_shapes():
    cfg = tiny_cfg()
    gen = build_model(cfg, "generator")
    disc = build_model(cfg, "discriminator")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 4))
    gp = gen.init(jax.random.PRNGKey(1), x)["params"]
    fake = gen.apply({"params": gp}, x)
    assert fake.shape == x.shape
    assert float(fake.min()) >= 0.0 and float(fake.max()) <= 1.0
    dp = disc.init(jax.random.PRNGKey(2), x)["params"]
    score = disc.apply({"params": dp}, fake)
    assert score.shape == (2, 4, 4, 1)


def test_registry_covers_reference_names():
    names = available_models()
    for want in ("gmfnet", "ct_lstm", "resnet18", "dqtl", "cross_net",
                 "swin_transformer", "vision_transformer", "swin_t_dual",
                 "generator", "discriminator"):
        assert want in names


def test_tri_net_forward():
    import jax
    cfg = tiny_cfg()
    model = build_model(cfg, "tri_net")
    ps = cfg["patch_size"]
    key = jax.random.PRNGKey(0)
    ms = jax.random.normal(key, (2, ps, ps, 4))
    pan = jax.random.normal(key, (2, 4 * ps, 4 * ps, 1))
    mspan = jax.random.normal(key, (2, 4 * ps, 4 * ps, 1))
    params = model.init(key, ms, pan, mspan)["params"]
    out = model.apply({"params": params}, ms, pan, mspan)
    assert out.shape == (2, cfg["Categories_Number"])


def test_model_arity_metadata():
    from dmfusion.models.registry import model_arity
    assert model_arity("gmfnet") == "dual"
    assert model_arity("tri_net") == "tri"
    assert model_arity("dqtl") == "quad"
    assert model_arity("generator") == "image"


def test_swin_shift_mask_and_bias():
    """Shifted windows must mask cross-region attention; the relative
    bias table must have the right geometry."""
    import numpy as np
    from dmfusion.models.swin import _relative_index, _shift_mask
    ws = 2
    idx = _relative_index(ws)
    assert idx.shape == (4, 4)
    assert idx.max() < (2 * ws - 1) ** 2
    # Same relative displacement -> same table entry.
    assert idx[0, 1] == idx[2, 3]  # both are (0, +1) neighbors
    mask = _shift_mask(8, 8, ws, 1)
    assert mask.shape == (16, 4, 4)
    # Interior windows are unmasked; wrap-around windows have -100 pairs.
    assert (mask == 0).any() and (mask == -100).any()
    # Mask is symmetric per window.
    np.testing.assert_array_equal(mask, mask.transpose(0, 2, 1))


def test_gmfnet_pan_variants_oa_parity(tmp_path):
    """The s2d PAN branch (new default, +8% measured on TPU) must match
    the legacy strided pyramid's classification quality on the synthetic
    pipeline (VERDICT r1 next-round item 4)."""
    from dmfusion.solvers import build_solver
    oa = {}
    for variant in ("s2d", "pyramid"):
        cfg = load_config(overrides={
            "data_city": "synth64", "patch_size": 8, "model_width": 16,
            "batchsize": 64, "test_batchsize": 64, "epoch": 4, "time": 1,
            "train_rate": 0.1, "verify_rate": 0.05, "seed": 0,
            "gmfnet_pan": variant,
            "expo_result": str(tmp_path) + f"/{variant}/",
            "precision": {"compute_dtype": "float32",
                          "param_dtype": "float32"},
        }, prepare=True)
        s = build_solver(cfg)
        s.run()
        oa[variant] = s.last_result[1]
    assert oa["s2d"] >= oa["pyramid"] - 0.05, oa


def test_scene_dtype_bf16_knob():
    """precision.scene_dtype=bfloat16 stores the HBM scene in bf16."""
    from dmfusion.data import synthetic_scene
    cfg = load_config(overrides={
        "data_city": "synth64", "patch_size": 8,
        "precision": {"scene_dtype": "bfloat16"}})
    sc = synthetic_scene(cfg)
    assert sc.ms.dtype == jnp.bfloat16 and sc.pan.dtype == jnp.bfloat16
    cfg2 = load_config(overrides={"data_city": "synth64", "patch_size": 8})
    sc2 = synthetic_scene(cfg2)
    assert sc2.ms.dtype == jnp.float32
