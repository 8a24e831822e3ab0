"""AOT memory check: spatially-sharded dense training at city scale.

Compiles ONE sharded dense train step (DensePrograms, image6 geometry,
width 32, batch 256) ahead-of-time for an 8-chip v5e topology — no TPUs
needed — and prints XLA's per-device memory analysis.  This demonstrates
the VERDICT r1 criterion that city-scale dense training, which overflows
one v5e's 15.75 GB HBM by ~0.5 GB unsharded (BENCH_NOTES.md), fits
comfortably once the scene-row axis is sharded over the mesh.

Run:  JAX_PLATFORMS=cpu python tools/dense_aot_memcheck.py [city] [width]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image6"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import DensePrograms

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dense_fusion",
        "model_width": width, "batchsize": 256,
    })
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.asarray(topo.devices).reshape(8, 1), ("data", "model"))

    model = build_model(cfg)
    prog = DensePrograms(model, make_optimizer(cfg, 1), cfg, w, ps, mesh)

    # Abstract inputs only — nothing is materialized.
    ms = jax.ShapeDtypeStruct((h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.ShapeDtypeStruct((4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                               jnp.float32)
    params, opt_state = jax.eval_shape(
        lambda: prog.init(jax.random.PRNGKey(0)))
    B = cfg["batchsize"]
    ids = jax.ShapeDtypeStruct((1, B), jnp.int32)
    labels = jax.ShapeDtypeStruct((1, B), jnp.int32)
    mask = jax.ShapeDtypeStruct((1, B), jnp.float32)

    lowered = jax.jit(prog._train_epoch, donate_argnums=(0, 1)).lower(
        params, opt_state, (ms, pan), ids, labels, mask)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
             ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"city={city} width={width} mesh=8x1 v5e  (per-device bytes)")
    print(f"  temp      : {ma.temp_size_in_bytes / gib:.3f} GiB")
    print(f"  arguments : {ma.argument_size_in_bytes / gib:.3f} GiB")
    print(f"  output    : {ma.output_size_in_bytes / gib:.3f} GiB")
    print(f"  aliased   : {ma.alias_size_in_bytes / gib:.3f} GiB")
    print(f"  live peak ~ {total / gib:.3f} GiB "
          f"(v5e HBM 15.75 GiB; HBM/8 = 1.97 GiB)")


if __name__ == "__main__":
    main()
