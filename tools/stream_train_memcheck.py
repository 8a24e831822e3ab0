"""AOT memory check: single-chip STREAMED dense training at city scale.

Compiles the sequential clamped-band dense train epoch (DensePrograms
with NO mesh and ``dense_streams`` resolving to n > 1 bands — the
image9/image10 single-chip training route) ahead-of-time for ONE v5e
chip — no TPUs needed — and prints XLA's memory analysis.  This is the
training-side counterpart of tools/dense_aot_memcheck.py (which proves
the 8-chip band-SHARDED path): the whole-scene image9 program tile-pads
an s2d intermediate past HBM (~26 GB, BENCH_NOTES.md), while the
streamed program's reverse scan recomputes one checkpointed band at a
time, bounding live memory to a band's intermediates.

Run:  JAX_PLATFORMS=cpu python tools/stream_train_memcheck.py \
          [city] [width] [batch] [steps] [minibatch|full]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    mode = sys.argv[5] if len(sys.argv) > 5 else "full"

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import DensePrograms, resolve_dense_streams

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dense_fusion",
        "model_width": width, "batchsize": batch,
        "train": {"index": 1, "pretrained": 0, "save_best": True,
                  "dense_epoch": mode},
    })
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]
    n_bands = resolve_dense_streams(cfg.get("dense_streams", "auto"),
                                    h + ps - 1, w + ps - 1)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])

    model = build_model(cfg)
    prog = DensePrograms(model, make_optimizer(cfg, 1), cfg, w, ps, None)

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    ms = sds((h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = sds((4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1), jnp.float32)
    params, opt_state = jax.eval_shape(
        lambda: prog.init(jax.random.PRNGKey(0)))
    params = jax.tree.map(lambda x: sds(x.shape, x.dtype), params)
    opt_state = jax.tree.map(lambda x: sds(x.shape, x.dtype), opt_state)
    ids = sds((steps, batch), jnp.int32)
    labels = sds((steps, batch), jnp.int32)
    mask = sds((steps, batch), jnp.float32)

    fn = prog._train_epoch_full if mode == "full" else prog._train_epoch
    lowered = jax.jit(fn, donate_argnums=(0, 1)).lower(
        params, opt_state, (ms, pan), ids, labels, mask)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
             ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"city={city} width={width} batch={batch} steps={steps} "
          f"mode={mode} streams={n_bands} single v5e chip")
    print(f"  temp      : {ma.temp_size_in_bytes / gib:.3f} GiB")
    print(f"  arguments : {ma.argument_size_in_bytes / gib:.3f} GiB")
    print(f"  output    : {ma.output_size_in_bytes / gib:.3f} GiB")
    print(f"  aliased   : {ma.alias_size_in_bytes / gib:.3f} GiB")
    print(f"  live peak ~ {total / gib:.3f} GiB (v5e HBM 15.75 GiB)")


if __name__ == "__main__":
    main()
