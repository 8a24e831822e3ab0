"""Measure SINGLE-CHIP streamed dense TRAINING at city scale.

The training twin of tools/stream_map_bench.py: image9/image10-class
scenes cannot run the whole-scene dense train step on one chip (the s2d
intermediate tile-pads ~16x past HBM, BENCH_NOTES.md "image9
single-chip"), so the anchor-pooling pass streams the clamped bands
sequentially (train/steps.py::_anchor_pooled_streamed) with each band
checkpointed — the reverse scan recomputes one band at a time.

Times, in ONE process (every process pays full remote compiles):
  * a full-batch streamed train epoch (train.dense_epoch: full — ONE
    update per epoch from every train anchor; the sane mode at this
    scale, minibatch would pay n_bands feature passes PER STEP),
  * a streamed masked eval epoch (train/steps.py::_eval_epoch_streamed),
  * optionally several epochs to show the loss moving.

Run on the TPU:  python tools/stream_train_bench.py [city] [anchors]
                     [epochs] [streams]   (streams 0 = auto resolution)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmfusion.config import load_config
from dmfusion.models import build_model
from dmfusion.train.optim import make_optimizer
from dmfusion.train.steps import DensePrograms


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    streams = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    over = {
        "data_city": city, "model_name": "dense_fusion",
        "model_width": 32, "batchsize": n_anchors,
        "train": {"index": 1, "pretrained": 0, "save_best": True,
                  "dense_epoch": "full"},
        "precision": {"compute_dtype": "bfloat16",
                      "param_dtype": "float32", "pallas_pool": 0},
    }
    if streams:
        over["dense_streams"] = streams
    cfg = load_config(overrides=over)
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ncls = cfg["Categories_Number"]
    ps = cfg["patch_size"]

    key = jax.random.PRNGKey(0)
    ms = jax.random.uniform(key, (h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.random.uniform(jax.random.fold_in(key, 1),
                             (4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                             jnp.float32)
    float(ms.sum())

    model = build_model(cfg)
    prog = DensePrograms(model, make_optimizer(cfg, 1), cfg, w, ps, None)
    params, opt_state = prog.init(jax.random.PRNGKey(1))
    n_bands = prog._stream_bands(ms.shape[0], ms.shape[1])
    print(f"{city}: {h}x{w} = {h * w / 1e6:.1f}M px, streams={n_bands}, "
          f"full-batch anchors={n_anchors}", flush=True)
    assert n_bands > 1, "scene resolved unstreamed; nothing to measure"

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, h * w, (1, n_anchors)), jnp.int32)
    # Synthetic labels correlated with the MS scene so the loss can move.
    labels = jnp.asarray(rng.integers(1, ncls, (1, n_anchors)), jnp.int32)
    mask = jnp.ones((1, n_anchors), jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, losses = prog.train_epoch(
        params, opt_state, (ms, pan), ids, labels, mask)
    l0 = float(losses.sum())
    print(f"train compile+first epoch: {time.perf_counter() - t0:.1f}s "
          f"(loss {l0:.4f})", flush=True)
    times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, losses = prog.train_epoch(
            params, opt_state, (ms, pan), ids, labels, mask)
        le = float(losses.sum())   # host fence (tunnel-safe)
        times.append(time.perf_counter() - t0)
        print(f"  epoch {e}: {times[-1]:.2f}s  loss {le:.4f}", flush=True)
    best = min(times)
    print(f"best streamed full-batch epoch: {best:.2f}s "
          f"({n_anchors / best / 1e3:.1f}k anchors/s incl. "
          f"{n_bands}-band fwd+bwd)", flush=True)

    # Streamed eval: (steps, B) batches, every anchor scored once by its
    # owning band; no scene-scale logits map.  Ids are SORTED like the
    # solver's real splits (flatnonzero is ascending): consecutive
    # batches then span 1-2 bands, so the band scan's lax.cond skips the
    # batches a band owns nothing of (steps.py::_band_anchor_scan).
    vids = jnp.asarray(np.sort(rng.integers(0, h * w, 8 * 4096))
                       .reshape(8, 4096), jnp.int32)
    vlabels = jnp.asarray(rng.integers(1, ncls, (8, 4096)), jnp.int32)
    vmask = jnp.ones((8, 4096), jnp.float32)
    t0 = time.perf_counter()
    loss_sum, conf = prog.eval_epoch(params, (ms, pan), vids, vlabels,
                                     vmask)
    float(loss_sum)
    print(f"eval compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    loss_sum, conf = prog.eval_epoch(params, (ms, pan), vids, vlabels,
                                     vmask)
    ls = float(loss_sum)
    dt = time.perf_counter() - t0
    n_eval = int(np.asarray(conf).sum())
    print(f"streamed eval epoch ({8 * 4096} anchors): {dt:.2f}s "
          f"(loss_sum {ls:.1f}, conf n={n_eval})")


if __name__ == "__main__":
    main()
