import os

import pytest

from dmfusion.config import load_config, prepare_run, render_config
from dmfusion.config.schema import DATA_DICT


def test_defaults_roundtrip():
    cfg = load_config()
    assert cfg["model_name"] == "gmfnet"
    assert cfg["patch_size"] == 16
    # The dqtl section the reference forgot to ship must exist with the
    # full key set its code dereferences.
    for key in ("num_epochs", "pic_size", "lr", "tao", "epsilon", "alpha",
                "beta", "gamma", "epochs", "batch_size", "loss1", "loss2",
                "l_cy", "l_id", "l_ad", "encoder_name", "decoder_name",
                "WEIGHTS", "check_gH", "check_gZ", "check_dH", "check_dZ",
                "load_model", "save_model", "pre_trained"):
        assert key in cfg["dqtl"], key


def test_categories_derived_from_palette():
    cfg = load_config(overrides={"data_city": "image6"})
    assert cfg["Categories_Number"] == len(DATA_DICT["image6"]["color"]) == 12


def test_placeholder_interpolation():
    cfg = render_config({
        "data_city": "image4",
        "RESULT": "out/{{dc}}_tr{{tr}}_ep{{ep}}_bs{{bs}}/",
        "RESULT_excel": "{{RESULT}}/{{mn}}__{{FN}}_result.xlsx",
    })
    assert cfg["RESULT"] == "out/image4_tr0.02_ep50_bs256/"
    # Second pass resolves placeholders referencing templated values.
    assert cfg["RESULT_excel"] == \
        "out/image4_tr0.02_ep50_bs256//gmfnet__0_result.xlsx"
    assert cfg["Categories_Number"] == 8  # {{num}} source


def test_numeric_coercion():
    cfg = render_config({"schedule": {"lr": "1e-3"}, "dqtl": {"tao": "0.1"}})
    assert isinstance(cfg["schedule"]["lr"], float)
    assert isinstance(cfg["dqtl"]["tao"], float)


def test_unknown_city_rejected():
    with pytest.raises(ValueError):
        render_config({"data_city": "atlantis"})


def test_prepare_run_slot_numbering(tmp_path):
    cfg = load_config(overrides={
        "data_city": "synth64",
        "expo_result": str(tmp_path) + "/",
    })
    c0 = prepare_run(cfg)
    assert c0["FILE_NUM"] == 0
    assert os.path.isdir(c0["RESULT_output"])
    # Occupy slot 0 with a workbook -> next run gets slot 1.
    open(c0["RESULT_excel"], "w").close()
    c1 = prepare_run(cfg)
    assert c1["FILE_NUM"] == 1
    # Orphan output dir (no workbook) is GC'd and its slot reused.
    os.remove(c0["RESULT_excel"])
    c2 = prepare_run(cfg)
    assert c2["FILE_NUM"] == 0


def test_prepare_run_resume_reuses_unfinished_slot(tmp_path):
    """train.resume must land in the newest UNFINISHED slot (output dir
    without a result workbook) so a fresh process can continue an
    interrupted run's checkpoints — and must NOT GC that dir even with
    the delete flag set.  Finished runs (workbook present) are never
    resumed into."""
    cfg = load_config(overrides={
        "data_city": "synth64",
        "expo_result": str(tmp_path) + "/",
    })
    c0 = prepare_run(cfg)                      # slot 0: interrupted run
    marker = os.path.join(c0["RESULT_output"], "0_curweights.msgpack")
    open(marker, "w").close()
    resume_cfg = dict(cfg, train=dict(cfg["train"], resume=1))
    c1 = prepare_run(resume_cfg)
    assert c1["FILE_NUM"] == 0                 # reused, not advanced
    assert os.path.exists(marker)              # and NOT GC'd
    # Finish slot 0 (workbook written): resume now gets a fresh slot.
    open(c0["RESULT_excel"], "w").close()
    c2 = prepare_run(resume_cfg)
    assert c2["FILE_NUM"] == 1


def test_root_config_yaml_loads():
    """The shipped config.yml (the user-facing surface) must load,
    interpolate its {{...}} placeholders, and validate."""
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "config.yml")
    cfg = load_config(root)
    assert cfg["model_name"] == "gmfnet"
    assert cfg["Categories_Number"] == 12          # {{num}} for image6
    assert "{{" not in cfg["RESULT"]               # placeholders resolved
    assert cfg["RESULT"] == "Export_result/image6_tr0.02_ep50_bs256/"
    assert cfg["dqtl"]["pic_size"] == 128
    assert cfg["mesh"]["data"] == -1


def test_reference_shaped_yaml_loads(tmp_path):
    """A config written in the reference's own style (Jinja placeholders,
    string numerics, missing dqtl section) must render cleanly."""
    p = tmp_path / "ref.yml"
    p.write_text("""
model_name: cross_net
data_city: image7
patch_size: 16
Categories_Number: '{{num}}'
train_rate: 0.05
RESULT: 'out/{{dc}}_tr{{tr}}_ep{{ep}}_bs{{bs}}/'
RESULT_excel: '{{RESULT}}/{{mn}}__{{FN}}_result.xlsx'
schedule:
  lr: 1e-4
""")
    cfg = load_config(str(p))
    assert cfg["Categories_Number"] == 12
    assert cfg["RESULT"] == "out/image7_tr0.05_ep50_bs256/"
    assert "cross_net__0_result.xlsx" in cfg["RESULT_excel"]
    assert cfg["schedule"]["lr"] == 1e-4
    assert "dqtl" in cfg  # defaults injected


def test_parse_switch():
    """One parser for every on/off/auto knob: YAML booleans, 0/1,
    yes/no and on/off normalize consistently; unknown spellings fail at
    config time instead of silently meaning 'on' (ADVICE r2)."""
    import pytest
    from dmfusion.utils import parse_switch
    for v in ("off", "OFF", 0, "0", False, "false", "no"):
        assert parse_switch(v) == "off", v
    for v in ("on", 1, "1", True, "true", "yes"):
        assert parse_switch(v) == "on", v
    assert parse_switch("auto") == "auto"
    with pytest.raises(ValueError, match="train.dense_remat"):
        parse_switch("maybe", "train.dense_remat")


def test_dense_remat_yaml_false_is_off():
    """A YAML boolean `dense_remat: false` must actually disable remat
    (it used to parse as 'false' -> ON silently)."""
    import jax
    import jax.numpy as jnp
    from dmfusion.config import load_config
    from dmfusion.models import build_model

    def stem_cls(remat_value):
        cfg = load_config(overrides={
            "data_city": "synth64", "model_name": "dense_fusion",
            "model_width": 8, "train": {"dense_remat": remat_value}})
        m = build_model(cfg)
        ms = jnp.zeros((16, 16, 4), jnp.float32)
        pan = jnp.zeros((64, 64, 1), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), ms, pan, 8)["params"]
        # flax nn.remat wraps the module class; with remat off the plain
        # classes are bound in setup.
        return type(m.bind({"params": params}).ms_stem).__name__

    assert stem_cls(False) == "LocalConvBlock"
    assert stem_cls("on") != "LocalConvBlock"
