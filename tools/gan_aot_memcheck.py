"""AOT memory check: stage-1 GAN training at city-scale tile counts.

Compiles ONE stage-1 epoch (GanPrograms, image9 tile counts: 54x58 =
3132 pic_size-128 tiles, batch 4 -> 783 steps) ahead-of-time for a v5e
and prints XLA's memory analysis, for each fake-collection mode.  This
bounds VERDICT r2 weak #4: with collect='none' (every epoch except
samples and the last) the epoch output is O(batch); 'all' (the last
epoch only) adds the stacked fake tiles (~0.8 GB per modality at this
scale) — and both must fit the 15.75 GiB HBM.

Run:  JAX_PLATFORMS=cpu python tools/gan_aot_memcheck.py [city] [pic]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    pic = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.gan import GanPrograms

    cfg = load_config(overrides={"data_city": city,
                                 "dqtl": {"pic_size": pic}})
    h, w, c = cfg["DATA_DICT"][city]["size"]
    bs = int(cfg["dqtl"]["batch_size"])
    tiles = -(-h // pic) * (-(-w // pic))
    steps = -(-tiles // bs)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh1 = Mesh(np.asarray(topo.devices[:1]).reshape(1, 1),
                 ("data", "model"))
    rep = NamedSharding(mesh1, P())

    gen_p = build_model(cfg, cfg["dqtl"]["decoder_name"])
    gen_m = build_model(cfg, cfg["dqtl"]["decoder_name"])
    disc_p = build_model(cfg, cfg["dqtl"]["encoder_name"])
    disc_m = build_model(cfg, cfg["dqtl"]["encoder_name"])
    prog = GanPrograms(gen_p, gen_m, disc_p, disc_m, cfg)

    state = jax.eval_shape(lambda: prog.init(jax.random.PRNGKey(0), pic, c))
    m = jax.ShapeDtypeStruct((steps, bs, pic, pic, c), jnp.float32)
    keys = jax.ShapeDtypeStruct((steps, 2), jnp.uint32)

    gib = 1024 ** 3
    print(f"{city}: {tiles} tiles of {pic}^2x{c}, batch {bs} -> "
          f"{steps} steps/epoch (v5e HBM 15.75 GiB)")
    for collect in ("none", "first", "all"):
        compiled = jax.jit(
            prog._train_epoch, donate_argnums=(0,), static_argnums=(4,),
            in_shardings=(rep, rep, rep, rep),
        ).lower(state, m, m, keys, collect).compile()
        ma = compiled.memory_analysis()
        peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                ma.output_size_in_bytes - ma.alias_size_in_bytes)
        print(f"  collect={collect:5s}: temp {ma.temp_size_in_bytes / gib:6.3f} "
              f"GiB, args {ma.argument_size_in_bytes / gib:6.3f} GiB, "
              f"out {ma.output_size_in_bytes / gib:6.3f} GiB, "
              f"live peak ~ {peak / gib:6.3f} GiB")


if __name__ == "__main__":
    main()
