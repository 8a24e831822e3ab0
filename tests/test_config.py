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
