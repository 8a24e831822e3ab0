"""CLI surface smoke tests (subprocess, CPU) — the `python test.py`
equivalent entry (reference test.py:7-14)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU from tests
    # The subprocess runs from a tmpdir: make the repo importable even when
    # the editable install is absent (fresh clone / reset environment).
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "dmfusion.cli"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=400)


@pytest.fixture(scope="module")
def quick_args(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli")
    return out, [
        "--city", "synth64",
        "--set", "device=cpu", "patch_size=8", "model_width=8",
        "batchsize=64", "test_batchsize=64", "color_batchsize=64",
        "epoch=1", "time=1", "train_rate=0.1", "verify_rate=0.05",
        "seed=0", f"expo_result={out}/",
        "precision.compute_dtype=float32",
    ]


def test_cli_end_to_end(quick_args):
    out, args = quick_args
    proc = run_cli(args, cwd=str(out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[repeat 0] epoch 0" in proc.stdout
    run_dir = os.path.join(out, "synth64_tr0.1_ep1_bs64")
    assert os.path.exists(os.path.join(run_dir, "gmfnet__0_result.xlsx"))
    assert os.path.exists(os.path.join(run_dir, "gmfnet__0_output",
                                       "0_matrix.npy"))


def test_cli_unknown_city(tmp_path):
    proc = run_cli(["--city", "atlantis"], cwd=str(tmp_path))
    assert proc.returncode != 0
    assert "unknown data_city" in proc.stderr


def test_cli_unknown_model(quick_args, tmp_path):
    _, args = quick_args
    proc = run_cli(args[:2] + ["--model", "nope"] + args[2:],
                   cwd=str(tmp_path))
    assert proc.returncode != 0
    assert "unknown model" in proc.stderr
    assert "gmfnet" in proc.stderr  # lists available models
