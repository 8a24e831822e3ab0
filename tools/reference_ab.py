"""Execute the ACTUAL reference code (/root/reference, torch) and
dmfusion on the SAME generated scene and compare OA/AA/kappa
distributions — the living-code parity A/B VERDICT r4 missing #2 asked
for (until now parity was proven against numpy goldens of the
reference's formulas, never against the running reference).

What runs on the reference side, unmodified:
  * utils/config.py::get_render_config (its own Jinja2 self-templating
    renderer, fed a config.yml this harness writes WITH the dqtl
    section the shipped one forgot — SURVEY.md §0),
  * solver/basesolver.py ctor (libtiff scene read via a PIL-backed
    shim, data_padding, split_data_old, dataset_dual),
  * solver/mainsolver.py::Solver.dataloader + train (the full torch
    epoch/val/best-checkpoint loop),
  * indicators/kappa.py::aa_oa for the metrics.
Supplied pieces the reference repo lacks: ``model/gmfnet.py`` (a torch
twin of dmfusion's gmfnet — the reference ships NO model code at all)
and libtiff/openpyxl shims (tools/ref_shims/) for packages absent from
this image.  The reference's test() is NOT driven because of its
leftover debug ``break`` after the first batch + per-batch t-SNE dump
(solver/mainsolver.py:110-142, documented in SURVEY.md §2.1 #5); the
harness instead evaluates the trained model over the FULL test set
with the reference's own [pred][target] confusion orientation
(mainsolver.py:139-141) — the comparison dmfusion's full-test eval is
defined against.

Parity bar (SURVEY.md §7 "RNG parity"): distribution-level — the two
stacks cannot share torch's seed-3407 random_split, so each side runs
N seeded repeats and the mean OA/AA/kappa are compared.

Usage:  python tools/reference_ab.py [--repeats 5] [--epochs 15]
        [--size 96 104] [--classes 9] [--out Export_result/reference_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def make_scene(scene_dir: str, h: int, w: int, ncls: int, seed: int = 0):
    """Seeded synthetic scene in the reference's on-disk format:
    ms4.tif (H, W, 4 uint8), pan.tif (4H, 4W uint8), label.npy (H, W).
    Same construction as dmfusion's synthetic_scene (blobby class
    regions, PAN = upsampled MS luminance + noise) so the classes are
    genuinely learnable by both stacks."""
    import numpy as np
    from PIL import Image
    os.makedirs(scene_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    gh, gw = max(h // 16, 8), max(w // 16, 8)
    fields = rng.standard_normal((ncls - 1, gh, gw)).astype(np.float32)
    reps = (-(-h // gh), -(-w // gw))
    up = np.repeat(np.repeat(fields, reps[0], 1), reps[1], 2)[:, :h, :w]
    cls = np.argmax(up, axis=0) + 1
    label = cls.astype(np.uint8)
    label[rng.random((h, w)) < 0.3] = 0

    base = rng.uniform(40, 215, (ncls, 4)).astype(np.float32)
    ms = base[cls] + 12.0 * rng.standard_normal((h, w, 4)).astype(np.float32)
    ms = np.clip(ms, 0, 255).astype(np.uint8)
    lum = ms.astype(np.float32).mean(-1)
    pan = np.repeat(np.repeat(lum, 4, 0), 4, 1)
    pan = pan + 12.0 * rng.standard_normal(pan.shape).astype(np.float32)
    pan = np.clip(pan, 0, 255).astype(np.uint8)

    Image.fromarray(ms, "RGBA").save(os.path.join(scene_dir, "ms4.tif"))
    Image.fromarray(pan, "L").save(os.path.join(scene_dir, "pan.tif"))
    np.save(os.path.join(scene_dir, "label.npy"), label)


def _palette(ncls: int):
    import numpy as np
    rng = np.random.default_rng(7)
    return [[int(v) for v in rng.integers(0, 256, 3)] for _ in range(ncls)]


def reference_config(scene_dir: str, workdir: str, args) -> str:
    """Write the config.yml the reference renderer consumes — full key
    surface of its live path (SURVEY.md §2.1 #2/#3) including the dqtl
    section utils/config.py:34-35 requires but config.yml omits."""
    import yaml
    cfg = {
        "task": "dual",
        "model_name": "gmfnet",
        "model_width": args.width,
        "data_city": "refab",
        "data_address": scene_dir.rstrip("/") + "/",
        "data_new": 0,
        "use_h5": 0,
        # nohup MUST be 0: the reference's own validation loop calls
        # ``valid_loader.close() if self.cfg['nohup'] else None``
        # (solver/mainsolver.py:76) — the condition is inverted, so
        # under nohup the raw DataLoader (no .close) crashes the epoch.
        # Executing the living code surfaced this; dmfusion's nohup
        # mode intentionally does not reproduce the crash.
        "nohup": 0,
        "gpu_mode": False,
        "seed": 3407,
        "threads": 0,
        "device": "cpu",
        "parameters": "",
        "FILE_NUM": 0,
        "delete": 0,
        "index": 0,
        "patch_size": 16,
        "Categories_Number": args.classes,
        "batchsize": 64,
        "test_batchsize": 256,
        "color_batchsize": 256,
        "train_rate": args.train_rate,
        "verify_rate": args.verify_rate,
        "epoch": args.epochs,
        "time": 1,
        "RESULT": os.path.join(workdir, "ref_out") + "/",
        "expo_result": os.path.join(workdir, "ref_out") + "/",
        "schedule": {
            "loss": "Criterion", "optimizer": "ADAM", "scheduler": "StepLR",
            "if_scheduler": 0, "lr": 1e-3, "base_lr": 1e-4, "alpha": 0.9,
            "epsilon": 1e-8, "momentum": 0.9, "activate": "Relu",
        },
        "train": {"index": 1, "save_best": 1, "pretrained": 0},
        "test": {"index": 0, "save_matrix": 1},
        "color": {"index": 0, "supervised": 1, "unsupervised": 1},
        "dqtl": {
            "num_epochs": 1, "pic_size": 32, "lr": 1e-3, "tao": 0.5,
            "epsilon": 1e-6, "alpha": 1.0, "beta": 1.0, "gamma": 1.0,
            "epochs": 1, "batch_size": 2, "num_workers": 0,
            "loss1": "MSE", "loss2": "L1", "l_cy": 1.0, "l_id": 1.0,
            "l_ad": 1.0, "encoder_name": "generator",
            "decoder_name": "discriminator", "WEIGHTS": "dqtl/",
            "check_gH": "gH.pth", "check_gZ": "gZ.pth",
            "check_dH": "dH.pth", "check_dZ": "dZ.pth",
            "load_model": 0, "save_model": 0, "pre_trained": 0,
        },
        "DATA_DICT": {"refab": {"size": [args.size[0], args.size[1], 4],
                                "color": _palette(args.classes)}},
    }
    path = os.path.join(workdir, "config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run_reference(scene_dir: str, workdir: str, args):
    """N seeded repeats of the reference's dataloader+train, then a
    full-test-set confusion with its orientation; returns
    [(oa, aa, kappa), ...] and the mean train wall."""
    import numpy as np
    import torch
    torch.set_num_threads(1)
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
    sys.path.insert(1, REFERENCE)
    reference_config(scene_dir, workdir, args)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        from utils.config import get_render_config
        from solver.mainsolver import Solver
        from indicators.kappa import aa_oa
        results, walls = [], []
        for r in range(args.repeats):
            torch.manual_seed(3407 + r)
            cfg = get_render_config("config.yml")
            solver = Solver(cfg)
            solver.dataloader()
            t0 = time.time()
            solver.train()
            walls.append(time.time() - t0)
            # Full-test-set eval with the reference's confusion
            # orientation (mainsolver.py:139-141), minus the debug
            # break/t-SNE (mainsolver.py:110-142).
            best = torch.load(cfg["RESULT_output"] + "0_weights.pth")
            solver.cur_model.load_state_dict(best)
            solver.cur_model.eval()
            ncls = cfg["Categories_Number"]
            conf = np.zeros((ncls, ncls))
            with torch.no_grad():
                for d1, d2, tgt, _, _ in solver.test_loader:
                    out = solver.cur_model(d1, d2)
                    pred = out.data.max(1, keepdim=True)[1]
                    for i in range(len(tgt)):
                        conf[int(pred[i].item())][int(tgt[i].item())] += 1
            aa, oa, k, _ = aa_oa(conf)
            results.append((float(oa), float(aa), float(k)))
            print(f"[reference] repeat {r}: OA={oa:.4f} AA={aa:.4f} "
                  f"kappa={k:.4f} train={walls[-1]:.1f}s", flush=True)
        return results, float(np.mean(walls))
    finally:
        os.chdir(cwd)
        sys.path.remove(os.path.join(REPO, "tools", "ref_shims"))
        sys.path.remove(REFERENCE)


def run_dmfusion(scene_dir: str, workdir: str, args, device: str):
    """Same experiment through dmfusion's CLI-equivalent Solver:
    time=N repeats, full-test eval, per-repeat confusion .npy."""
    import numpy as np
    from dmfusion.config import load_config
    from dmfusion.solvers import build_solver
    from dmfusion.ops.metrics import aa_oa
    out = os.path.join(workdir, "dmf_out") + "/"
    cfg = load_config(overrides={
        "model_name": "gmfnet",
        "model_width": args.width,
        "data_city": "refab",
        "data_address": scene_dir.rstrip("/") + "/",
        "patch_size": 16,
        "batchsize": 64,
        "test_batchsize": 256,
        "color_batchsize": 256,
        "train_rate": args.train_rate,
        "verify_rate": args.verify_rate,
        "epoch": args.epochs,
        "time": args.repeats,
        "seed": 3407,
        "device": device,
        "nohup": 1,
        "expo_result": out,
        "train": {"index": 1, "save_best": 1},
        "test": {"index": 1, "save_matrix": 1},
        "color": {"index": 0},
        # Apples-to-apples with the torch side: f32 compute (the
        # reference trains f32; dmfusion's bf16 default is the TPU
        # precision model — on CPU it is emulated anyway, slower AND
        # lower-OA at this scale).
        "precision": {"compute_dtype": "float32",
                      "param_dtype": "float32"},
        "DATA_DICT": {"refab": {"size": [args.size[0], args.size[1], 4],
                                "color": _palette(args.classes)}},
    }, prepare=True)
    solver = build_solver(cfg)
    t0 = time.time()
    solver.run()
    wall = time.time() - t0
    results = []
    for r in range(args.repeats):
        conf = np.load(os.path.join(cfg["RESULT_output"],
                                    f"{r}_matrix.npy"))
        aa, oa, k, _ = aa_oa(conf)
        results.append((float(oa), float(aa), float(k)))
        print(f"[dmfusion] repeat {r}: OA={oa:.4f} AA={aa:.4f} "
              f"kappa={k:.4f}", flush=True)
    return results, wall / args.repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--size", type=int, nargs=2, default=(96, 104))
    ap.add_argument("--classes", type=int, default=9)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--train-rate", type=float, default=0.05)
    ap.add_argument("--verify-rate", type=float, default=0.02)
    ap.add_argument("--device", default="cpu",
                    help="dmfusion device (cpu keeps the A/B "
                         "single-machine-fair; torch side is cpu-only)")
    ap.add_argument("--out", default="Export_result/reference_ab")
    args = ap.parse_args()

    if args.device == "cpu":
        # Must run before anything touches jax arrays (CLAUDE.md: env
        # vars are too late under the axon sitecustomize).
        import jax
        jax.config.update("jax_platforms", "cpu")

    workdir = os.path.abspath(args.out)
    os.makedirs(workdir, exist_ok=True)
    scene_dir = os.path.join(workdir, "scene")
    make_scene(scene_dir, args.size[0], args.size[1], args.classes)

    ref, ref_wall = run_reference(scene_dir, workdir, args)
    dmf, dmf_wall = run_dmfusion(scene_dir, workdir, args, args.device)

    import numpy as np
    summary = {}
    for name, rows in (("reference", ref), ("dmfusion", dmf)):
        arr = np.asarray(rows)
        summary[name] = {
            "oa_mean": float(arr[:, 0].mean()), "oa_std": float(arr[:, 0].std()),
            "aa_mean": float(arr[:, 1].mean()), "aa_std": float(arr[:, 1].std()),
            "kappa_mean": float(arr[:, 2].mean()),
            "kappa_std": float(arr[:, 2].std()),
            "repeats": rows,
        }
    summary["reference"]["train_wall_s"] = ref_wall
    summary["dmfusion"]["train_wall_s"] = dmf_wall
    d_oa = summary["dmfusion"]["oa_mean"] - summary["reference"]["oa_mean"]
    spread = max(summary["reference"]["oa_std"],
                 summary["dmfusion"]["oa_std"], 1e-3)
    summary["delta_oa"] = d_oa
    summary["parity"] = bool(abs(d_oa) <= max(3 * spread, 0.02))
    summary["config"] = {"repeats": args.repeats, "epochs": args.epochs,
                         "size": list(args.size), "classes": args.classes,
                         "width": args.width,
                         "train_rate": args.train_rate}
    path = os.path.join(workdir, "reference_ab.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("reference", "dmfusion")}))
    for name in ("reference", "dmfusion"):
        s = summary[name]
        print(f"{name:10s} OA {s['oa_mean']:.4f}±{s['oa_std']:.4f}  "
              f"AA {s['aa_mean']:.4f}±{s['aa_std']:.4f}  "
              f"kappa {s['kappa_mean']:.4f}±{s['kappa_std']:.4f}  "
              f"train {s['train_wall_s']:.1f}s/repeat")
    print(f"ΔOA = {d_oa:+.4f}  parity={'YES' if summary['parity'] else 'NO'}"
          f"  -> {path}")


if __name__ == "__main__":
    main()
