"""Where does the trunk lose 2x vs conv peak?  Optimized-HLO inspection.

`tools/conv_kernel_probe.py` showed a bare 3x3 128->128 conv at the
image6 trunk shape runs at 193 TF/s (MXU peak); summing the trunk's
convs at that rate predicts ~8 ms, yet the measured trunk section is
~20 ms (`tools/features_probe.py`).  The suspect is unfused elementwise
passes between convs (~130 GB/s VPU rate -> ~4 ms per whole-tensor
pass at 273 MB).

This tool AOT-compiles `features_s2d` for a v5e topology (no TPU
needed) and lists every non-trivial kernel in the optimized HLO with
its output bytes, separating conv custom-calls from standalone
(loop/input) fusions — i.e. the elementwise passes XLA did NOT fold
into a conv.

Run:  JAX_PLATFORMS=cpu python tools/trunk_hlo_probe.py [city] [width]
"""

import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402


DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
            "pred": 1, "f16": 2}


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result shape string like 'bf16[1,504,529,128]'
    or a tuple '(bf16[...], f32[...])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image6"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from dmfusion.config import load_config
    from dmfusion.models import build_model

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dense_fusion",
        "model_width": width,
    })
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    dev = np.asarray(topo.devices).reshape(-1)[0]

    model = build_model(cfg)
    ms = jax.ShapeDtypeStruct((h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.ShapeDtypeStruct((4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                               jnp.float32)
    params = jax.eval_shape(
        lambda s0, s1: model.init(jax.random.PRNGKey(0), s0, s1,
                                  method="features_s2d"), ms, pan)

    def feats(p, s0, s1):
        return model.apply(p, s0, s1, method="features_s2d")

    lowered = jax.jit(feats, device=dev).lower(params, ms, pan)
    txt = lowered.compile().as_text()

    # Every HLO op at the entry-computation level that produces >=32 MB.
    # Only lines after the ENTRY marker count: fused-computation bodies
    # are printed BEFORE it, and their interior ops' bytes are already
    # accounted by the enclosing fusion's output at entry level.
    entry = txt[txt.index("ENTRY "):] if "ENTRY " in txt else txt
    rows = []
    for line in entry.splitlines():
        m = re.match(r"\s+(?:ROOT )?%?([\w.-]+) = (.*?) "
                     r"(fusion|convolution|custom-call|copy|transpose|"
                     r"dynamic-slice|dynamic-update-slice|concatenate|"
                     r"reduce|dot|scatter|gather|pad|slice)\(", line)
        if not m:
            continue
        name, shape_str, op = m.groups()
        nbytes = shape_bytes(shape_str)
        if nbytes < 32 * 1024 * 1024:
            continue
        kind = op
        if op == "fusion":
            km = re.search(r"kind=(\w+)", line)
            kind = f"fusion/{km.group(1) if km else '?'}"
        elif op == "custom-call":
            km = re.search(r'custom_call_target="([^"]+)"', line)
            kind = f"cc/{km.group(1) if km else '?'}"
        rows.append((nbytes, kind, name, shape_str[:44]))

    rows.sort(reverse=True)
    conv_b = sum(b for b, k, _, _ in rows if "conv" in k.lower())
    fus_b = sum(b for b, k, _, _ in rows if k.startswith("fusion"))
    print(f"city={city} width={width}  big kernels (>=32MB output):")
    for nbytes, kind, name, shape_str in rows:
        print(f"  {nbytes / 2**20:8.1f} MB  {kind:22s} {name:40s} "
              f"{shape_str[:60]}")
    print(f"totals: conv-output {conv_b / 2**20:.0f} MB, "
          f"standalone-fusion-output {fus_b / 2**20:.0f} MB")
    print(f"standalone fusion passes >=32MB: "
          f"{sum(1 for _, k, _, _ in rows if k.startswith('fusion'))}")


if __name__ == "__main__":
    main()
