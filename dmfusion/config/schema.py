"""Config schema and defaults.

The reference drives everything from a single ``config.yml``
(reference: config.yml:1-110) but ships it *out of sync* with the code:
the ``dqtl`` section that ``utils/config.py:34-35,85-87`` dereferences is
missing, so rendering the stock file raises ``KeyError``.  Here the full
schema is made explicit: :data:`DEFAULTS` contains every key any code
path reads, including the reconstructed ``dqtl`` section (key set
recovered from solver/tostagesolver.py:30-231, train/loss_function.py:21-64
and function/function.py:138), and :func:`validate` checks types and
fills defaults up front instead of failing mid-run.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

# Per-city scene registry: geometry + class palette (palette length == number
# of classes incl. background).  Mirrors reference config.yml:75-108.
DATA_DICT: dict[str, dict[str, Any]] = {
    "image4": {
        "size": [800, 830, 4],
        "color": [[0, 0, 0], [255, 192, 203], [255, 165, 0], [0, 255, 255],
                  [255, 0, 0], [160, 80, 43], [123, 255, 0], [0, 0, 255]],
    },
    "image5": {
        "size": [4541, 4548, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [0, 255, 127],
                  [237, 145, 33], [189, 252, 201], [255, 0, 0], [139, 58, 58],
                  [160, 32, 240], [221, 160, 221], [240, 230, 140],
                  [255, 0, 255], [255, 255, 0]],
    },
    "image6": {
        "size": [2001, 2101, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [237, 145, 33],
                  [0, 255, 0], [160, 32, 240], [221, 160, 221],
                  [240, 230, 140], [255, 0, 0], [255, 255, 0],
                  [0, 255, 127], [255, 0, 255]],
    },
    "image7": {
        "size": [2000, 2500, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [237, 145, 33],
                  [0, 255, 0], [240, 230, 140], [255, 0, 0], [160, 32, 240],
                  [255, 255, 0], [221, 160, 221], [0, 255, 127],
                  [255, 0, 255]],
    },
    "image8": {
        "size": [3408, 4000, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [0, 255, 0],
                  [255, 0, 0], [221, 160, 221], [240, 230, 140],
                  [237, 145, 33], [0, 128, 0]],
    },
    "image9": {
        "size": [6905, 7300, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [237, 145, 33],
                  [189, 252, 201], [230, 0, 0], [0, 255, 0], [160, 32, 240],
                  [221, 160, 221], [240, 230, 140], [255, 255, 0]],
    },
    "image10": {
        "size": [6905, 7300, 4],
        "color": [[0, 0, 0], [0, 255, 255], [0, 0, 255], [237, 145, 33],
                  [189, 252, 201], [230, 0, 0], [0, 255, 0], [160, 32, 240],
                  [221, 160, 221], [240, 230, 140], [255, 255, 0]],
    },
    # Small synthetic city for tests/benchmarks (not in the reference; it has
    # no test fixtures at all — SURVEY.md §4).
    "synth64": {
        "size": [64, 72, 4],
        "color": [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                  [255, 255, 0]],
    },
}

DQTL_DEFAULTS: dict[str, Any] = {
    # Stage-1 (GAN) schedule.
    "num_epochs": 10,       # used for artifact directory naming
    "epochs": 10,           # GAN epochs actually run
    "pic_size": 128,        # scene tile edge for stage 1
    "lr": 1e-4,
    "batch_size": 4,
    "num_workers": 0,
    # Loss selection and weights (reference tostagesolver.py:30-31,144-155).
    "loss1": "MSE",         # adversarial loss
    "loss2": "L1",          # cycle/identity/cross-reconstruction loss
    "l_cy": 10.0,
    "l_id": 0.5,
    "l_ad": 1.0,
    # Stage-2 quadruplet-KL loss hyperparams (train/loss_function.py:21-76).
    "tao": 0.1,
    "epsilon": 1e-8,
    "alpha": 0.1,
    "beta": 0.0,
    "gamma": 1.0,
    # Encoder/decoder model names for the GAN quartet.
    "encoder_name": "discriminator",
    "decoder_name": "generator",
    # Checkpoint artifact names (reference tostagesolver.py:216-224).
    "WEIGHTS": "dqtl_weights/",
    "check_gH": "gen_p.ckpt",
    "check_gZ": "gen_m.ckpt",
    "check_dH": "disc_p.ckpt",
    "check_dZ": "disc_m.ckpt",
    "load_model": 0,
    "save_model": 0,
    "pre_trained": 0,
}

DEFAULTS: dict[str, Any] = {
    "task": "classification",
    "remark": "none",
    "nohup": 0,
    "data_new": 0,
    "model_name": "gmfnet",
    "solver": "main",          # "main" | "twostage"
    "data_address": "",        # scene directory; empty => synthetic scene
    "delete": 1,
    "gpu_mode": False,         # kept for config-surface compat; unused on TPU
    "seed": 3407,              # reference seeds torch with 3407 (test.py:8)
    "expo_result": "Export_result/",
    "FILE_NUM": 0,
    "index": 0,
    "data_city": "image6",
    "gmfnet_pan": "s2d",       # gmfnet PAN branch: "s2d" | "pyramid"
    "use_h5": False,
    "patch_size": 16,
    "Categories_Number": 0,    # derived from palette length when 0
    "device": "tpu",
    "threads": 0,
    "batchsize": 256,
    "test_batchsize": 300,
    "color_batchsize": 300,
    "train_rate": 0.02,
    "verify_rate": 0.02,
    "epoch": 50,
    "time": 5,
    "schedule": {
        "loss": "Criterion",
        "optimizer": "ADAM",
        "if_scheduler": 0,
        "scheduler": "ExponentialLR",
        "activate": "Relu",
        "lr": 1e-3,
        "base_lr": 5e-4,
        "momentum": 0.9,       # SGD (reference utils/utils.py:14)
        "alpha": 0.99,         # RMSprop (reference utils/utils.py:16)
    },
    "train": {"index": 1, "pretrained": 0, "save_best": True,
              # Accept checkpoints whose model-name/width stamp does not
              # match this run (load what matches leniently); default
              # refuses — a mismatched file would otherwise mix stored
              # and freshly-initialized leaves.
              "pretrained_lenient": 0,
              # dmfusion extension (off by default): stop training at the
              # first val-loss regression.  The reference's break
              # (mainsolver.py:74-75) only truncates its validation batch
              # loop — it never stops training — so there is no reference
              # behavior to reproduce; see ARCHITECTURE.md divergence #7.
              "early_stop": 0,
              # dense-family gradient rematerialization: "auto" turns it
              # OFF when the whole-scene activations fit one chip
              # (image6-class at w<=32: 373 -> 222 ms/step measured) and
              # ON for band-sharded / larger-than-HBM cases; "on"/"off"
              # force it.
              "dense_remat": "auto",
              # device-memory budget (bytes) for the dense_remat AOT
              # probe; 0 = auto-detect (device bytes_limit, else one
              # v5e's 15.75 GiB).
              "dense_hbm_budget": 0,
              # dense-family epoch mode: "minibatch" (reference-style
              # SGD; recomputes the dense pass per step), "full" (ONE
              # dense pass + ONE full-batch update per epoch — ~30x
              # less device work per image6 epoch; different
              # optimization semantics), or "auto" (full exactly when
              # the run streams the dense pass in sequential bands —
              # city-scale scenes on one device, where minibatch would
              # replay every band pass per step — else minibatch).
              "dense_epoch": "auto",
              # dmfusion extension: per-epoch checkpoint saves run on a
              # background writer thread (device-side snapshot first, so
              # donation-safe), overlapping fetch+serialize+write with
              # the next epoch's device work — saves were the dominant
              # host cost of the fused epoch loop (BENCH_NOTES.md).
              # "off" restores synchronous saves.
              "async_save": "auto"},
    "test": {"index": 1, "save_matrix": 1},
    "color": {"index": 0, "supervised": 1, "unsupervised": 1},
    # Contourlet band diagnostics (reference proof()/visualize_channels,
    # mainsolver.py:245-431 — never wired into run() there).
    "proof": {"index": 0, "samples": 4},
    # t-SNE embedding diagnostics (reference inlines these in its test
    # loop, solver/mainsolver.py:110-136, and the two-stage 4-stream
    # analysis, tostagesolver.py:416-489): scatter of the classifier
    # logits, colored by target class (main) / input stream (twostage).
    "visualize": {"index": 0, "samples": 2000},
    "trans": {
        "patch_size": 1,
        "window_size": 2,
        "embed_dim": 96,
        "depth": 2,
        "num_head": 3,
        "depths": [2, 4],
        "num_heads": [3, 3],
    },
    "dqtl": DQTL_DEFAULTS,
    "DATA_DICT": DATA_DICT,
    # TPU-native additions (absent from the reference, which is single-device):
    "mesh": {
        "data": -1,            # -1 => all available devices
        "model": 1,
        "distributed": 0,      # 1 => jax.distributed.initialize() for
                               # multi-host (env-driven coordinator)
    },
    "precision": {
        "compute_dtype": "bfloat16",   # forward/backward compute
        "param_dtype": "float32",      # master params + optimizer state
        "scene_dtype": "float32",      # HBM-resident scene storage; set
                                       # "bfloat16" for ~5% faster gathers
                                       # (BENCH_NOTES.md) at the cost of
                                       # bit-exact gather parity
        "pallas_pool": "auto",         # fused Pallas window-pool kernel on
                                       # TPU for the dense map path (-21 ms
                                       # per single-shot image6 map).
                                       # "auto" = on for single-device TPU,
                                       # off under a mesh (Pallas inside
                                       # shard_map on a real multi-chip
                                       # mesh is unvalidated here); 1/0
                                       # force it.  0 also wins for
                                       # back-to-back scanned maps
                                       # (BENCH_NOTES.md)
    },
    # Single-chip streaming for dense full-scene inference: the scene is
    # processed as N sequential clamped row bands (the same exact band
    # geometry as the multi-chip band-sharded path) inside one lax.scan,
    # so no scene-scale dense intermediate ever materializes — this is
    # what lets image9/image10-class scenes (50M px) render on ONE chip
    # (their whole-scene s2d intermediates tile-pad to ~26 GB, an OOM).
    # "auto" = off for scenes that fit (image6-class and below), sized
    # from the scene area otherwise; 0/off forces the whole-scene pass;
    # an integer forces that band count.  Ignored under a mesh (bands
    # run spatially in parallel there instead).
    "dense_streams": "auto",
    # Streamed-INFERENCE band count (map/eval/predict); the training
    # band count above is sized for the fwd+bwd live set, which the
    # inference map does not carry — fewer/wider bands cut halo
    # recompute.  "auto" = AOT-probe the map program at 2-6 bands and
    # pick the fewest that fits the device budget (decision
    # disk-cached); an integer forces that count; "off" forces the
    # whole-scene inference pass even when training streams.  Only
    # consulted when dense_streams resolves to streaming at all.
    "dense_streams_infer": "auto",
    # Unroll factor for the streamed band loop (map path): >1 lets XLA
    # pipeline adjacent bands (custom calls in a rolled scan body are
    # scheduling barriers), at the cost of ~unroll x one band's live
    # intermediates.  1 = fully sequential (the memory-bound default).
    "dense_stream_unroll": 1,
    # Band count for the shift-and-stitch convolutional map route of
    # MAP_PROGRAMS models (gmfnet_conv).  "auto" = whole-scene pass for
    # image6-class scenes and below, ~6.5M anchors per band beyond;
    # 0/off forces the whole-scene pass; an integer forces that count.
    "conv_streams": "auto",
    # Max anchors per eval/predict DEVICE CALL for the per-anchor
    # program families (dual/one/tri/quad).  City-scale test sets
    # (~35M anchors at image9) as ONE multi-minute device execution
    # crashed the remote TPU worker; the chunked front door
    # (train/steps.py::DualPrograms.eval_epoch) slices the scan axis
    # host-side into bounded calls sharing ONE jit signature, summing
    # loss/confusion partials on host.  "auto" = ~2M anchors/call;
    # an integer forces that bound; "off" = one monolithic call.
    # Dense programs ignore this (their eval is map-render bound).
    "eval_scan_anchors": "auto",
    "profile": {"enabled": 0, "dir": "profile/"},
    "debug": {"nans": 0},              # jax_debug_nans sanitizer (SURVEY §5)
}

_NUMERIC_COERCIONS = (
    # (path, cast) — mirrors reference get_dump_config's ad-hoc coercions
    # (utils/config.py:82-87) but applied uniformly.
    (("schedule", "lr"), float),
    (("schedule", "base_lr"), float),
    (("Categories_Number",), int),
    (("dqtl", "lr"), float),
    (("dqtl", "tao"), float),
    (("dqtl", "epsilon"), float),
    (("train_rate",), float),
    (("verify_rate",), float),
    (("epoch",), int),
    (("time",), int),
    (("batchsize",), int),
    (("test_batchsize",), int),
    (("color_batchsize",), int),
    (("patch_size",), int),
    (("seed",), int),
)


def _deep_merge(base: dict, override: Mapping) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def validate(cfg: Mapping[str, Any]) -> dict[str, Any]:
    """Merge ``cfg`` over the defaults, coerce numerics, derive class count.

    Unlike the reference (which crashes with ``KeyError`` on its own shipped
    YAML), unknown keys are kept and missing ones are defaulted.
    """
    out = _deep_merge(DEFAULTS, cfg)
    for path, cast in _NUMERIC_COERCIONS:
        node = out
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = cast(node[path[-1]])
    city = out["data_city"]
    if city not in out["DATA_DICT"]:
        raise ValueError(f"unknown data_city {city!r}; known: "
                         f"{sorted(out['DATA_DICT'])}")
    palette = out["DATA_DICT"][city]["color"]
    if not out["Categories_Number"]:
        out["Categories_Number"] = len(palette)
    if out["Categories_Number"] != len(palette):
        raise ValueError(
            f"Categories_Number={out['Categories_Number']} does not match "
            f"palette length {len(palette)} for {city}")
    if out["patch_size"] <= 0:
        raise ValueError("patch_size must be positive")
    if not 0.0 <= out["train_rate"] <= 1.0 or not 0.0 <= out["verify_rate"] <= 1.0:
        raise ValueError("train_rate/verify_rate must lie in [0, 1]")
    return out
