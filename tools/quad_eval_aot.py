"""AOT memory census: the two-stage stage-2 (QuadPrograms) TEST eval
scan at city scale.

VERDICT r3 missing #1's likely blocker: the per-anchor 4-stream test
eval at image9 runs over ~35.3M anchors (8.6k scan iterations of 4096
windows x 4 streams) and once crashed the TPU worker mid-scan before
the stage-1 dual-scene residents were freed (solvers/twostage.py::
train_stage2_setup).  This tool asks XLA what the eval program actually
costs on one v5e — scan live set + the four MS-geometry stream
residents + the batched id/label/mask arrays — so the image9/image10
two-stage runs launch with a measured bound instead of hope.

Run:  JAX_PLATFORMS=cpu python tools/quad_eval_aot.py [city] [batch]
(batch defaults to the production eval rounding, 4096.)
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.losses import make_loss
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import QuadPrograms

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    mesh1 = Mesh(np.asarray(topo.devices[:1]).reshape(1, 1),
                 ("data", "model"))
    rep = NamedSharding(mesh1, P())
    gib = 1024 ** 3

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dqtl",
        "precision": {"compute_dtype": "bfloat16",
                      "param_dtype": "float32"}})
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = int(cfg["patch_size"])
    model = build_model(cfg)
    prog = QuadPrograms(model, make_optimizer(cfg, 1), cfg, w, ps, None,
                        make_loss("qua_loss", cfg))
    params = jax.eval_shape(lambda: prog.init(jax.random.PRNGKey(0)))[0]

    # Production test-eval geometry: ~70% of labeled pixels; size the
    # scan for ALL pixels (upper bound — the real split is smaller).
    n_anchors = h * w
    steps = -(-n_anchors // batch)
    stream = jax.ShapeDtypeStruct((h + ps - 1, w + ps - 1, c), jnp.float32)
    scene_args = (stream,) * 4
    ids = jax.ShapeDtypeStruct((steps, batch), jnp.int32)
    labels = jax.ShapeDtypeStruct((steps, batch), jnp.int32)
    mask = jax.ShapeDtypeStruct((steps, batch), jnp.float32)

    print(f"{city}: {h}x{w}, eval scan {steps} x {batch} anchors "
          f"(= {steps * batch / 1e6:.1f}M) x 4 streams, patch {ps}",
          flush=True)
    compiled = jax.jit(prog._eval_epoch,
                       in_shardings=(rep,) * 5) \
        .lower(params, scene_args, ids, labels, mask).compile()
    ma = compiled.memory_analysis()
    peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
            ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"  temp {ma.temp_size_in_bytes / gib:6.3f} GiB, "
          f"args {ma.argument_size_in_bytes / gib:6.3f} GiB, "
          f"out {ma.output_size_in_bytes / gib:6.3f} GiB, "
          f"live peak ~ {peak / gib:6.3f} GiB "
          f"(one v5e = 15.75 GiB)", flush=True)


if __name__ == "__main__":
    main()
