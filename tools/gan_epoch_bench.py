"""Measure ONE stage-1 GAN training epoch at city-scale tile counts on
the real chip.

`tools/gan_aot_memcheck.py` bounds the epoch's memory ahead-of-time
(image9, collect='none': ~3.9 GiB live peak on a v5e); this actually
RUNS the epoch on the TPU, converting the AOT claim into a measured
one: the stage-1 CycleGAN quartet trains at image9 tile counts (54x58 =
3132 pic-128 tiles -> 783 steps of batch 4) on the one available chip.

Run on the TPU:  python tools/gan_epoch_bench.py [city] [pic] [epochs]
(tiles are synthetic — geometry/counts are what matters, exactly like
stream_map_bench).
"""

import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    pic = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.gan import GanPrograms

    cfg = load_config(overrides={"data_city": city,
                                 "dqtl": {"pic_size": pic}})
    h, w, c = cfg["DATA_DICT"][city]["size"]
    bs = int(cfg["dqtl"]["batch_size"])
    tiles = -(-h // pic) * (-(-w // pic))
    steps = -(-tiles // bs)
    print(f"{city}: {tiles} tiles of {pic}^2x{c}, batch {bs} -> "
          f"{steps} steps/epoch", flush=True)

    gen_p = build_model(cfg, cfg["dqtl"]["decoder_name"])
    gen_m = build_model(cfg, cfg["dqtl"]["decoder_name"])
    disc_p = build_model(cfg, cfg["dqtl"]["encoder_name"])
    disc_m = build_model(cfg, cfg["dqtl"]["encoder_name"])
    prog = GanPrograms(gen_p, gen_m, disc_p, disc_m, cfg)
    state = prog.init(jax.random.PRNGKey(0), pic, c)

    key = jax.random.PRNGKey(1)
    m_tiles = jax.random.uniform(key, (steps, bs, pic, pic, c),
                                 jnp.float32)
    p_tiles = jax.random.uniform(jax.random.fold_in(key, 1),
                                 (steps, bs, pic, pic, c), jnp.float32)
    float(m_tiles.sum())

    # The programs class already jits this with the production
    # donation/static config — reuse it so the bench measures exactly
    # what the solver runs.
    epoch = prog.train_epoch

    def run(i: int) -> tuple[float, float, float]:
        nonlocal state
        keys = jax.random.split(jax.random.fold_in(key, 100 + i), steps)
        t0 = time.perf_counter()
        state, ys = epoch(state, m_tiles, p_tiles, keys, "none")
        d = float(ys["d_loss"].mean())   # host fence (tunnel-safe)
        g = float(ys["g_loss"].mean())
        return time.perf_counter() - t0, d, g

    t0 = time.perf_counter()
    dt, d, g = run(0)
    print(f"compile + first epoch: {time.perf_counter() - t0:.1f}s "
          f"(d {d:.3f}, g {g:.3f})", flush=True)
    for i in range(1, epochs):
        dt, d, g = run(i)
        print(f"epoch {i}: {dt:.2f}s = {steps / dt:.0f} steps/s "
              f"({steps * bs / dt:.0f} tiles/s; d {d:.3f}, g {g:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
