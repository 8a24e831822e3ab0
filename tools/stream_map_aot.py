"""AOT memory census: the streamed dense MAP at candidate band counts.

The streamed-band divisor (~6.5M px/band, steps.py::resolve_dense_streams)
was sized for TRAINING, whose fwd+bwd live set per band is far larger
than the inference map's (VERDICT r3 weak #2).  Fewer/wider inference
bands shrink the halo recompute and the scan overhead — this tool asks
XLA what each candidate actually costs on one v5e so the inference band
policy can be measured-and-probed instead of inherited from training.

Run:  JAX_PLATFORMS=cpu python tools/stream_map_aot.py [city] [width] \
          [bands ...]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    bands = [int(b) for b in sys.argv[3:]] or [2, 3, 4, 6, 8]

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import DensePrograms

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    mesh1 = Mesh(np.asarray(topo.devices[:1]).reshape(1, 1),
                 ("data", "model"))
    rep = NamedSharding(mesh1, P())
    gib = 1024 ** 3

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dense_fusion",
        "model_width": width,
        "precision": {"compute_dtype": "bfloat16",
                      "param_dtype": "float32", "pallas_pool": 0}})
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]
    model = build_model(cfg)
    prog = DensePrograms(model, make_optimizer(cfg, 1), cfg, w, ps, None)
    params = jax.eval_shape(lambda: prog.init(jax.random.PRNGKey(0)))[0]
    ms = jax.ShapeDtypeStruct((h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.ShapeDtypeStruct((4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                               jnp.float32)

    print(f"{city}: {h}x{w} = {h * w / 1e6:.1f}M px, w{width} streamed "
          f"class map on one v5e (HBM 15.75 GiB)", flush=True)
    for n in bands:
        def fn(p, a, b, n=n):
            return prog.class_map_streamed(p, (a, b), n)
        try:
            compiled = jax.jit(fn, in_shardings=(rep, rep, rep)) \
                .lower(params, ms, pan).compile()
        except Exception as e:  # compiler-enforced OOM etc.
            print(f"  bands={n}: compile failed: {str(e)[:140]}",
                  flush=True)
            continue
        ma = compiled.memory_analysis()
        peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                ma.output_size_in_bytes - ma.alias_size_in_bytes)
        print(f"  bands={n}: temp {ma.temp_size_in_bytes / gib:6.3f} GiB, "
              f"args {ma.argument_size_in_bytes / gib:6.3f} GiB, "
              f"out {ma.output_size_in_bytes / gib:6.3f} GiB, "
              f"live peak ~ {peak / gib:6.3f} GiB", flush=True)


if __name__ == "__main__":
    main()
