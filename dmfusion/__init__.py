"""dmfusion — a TPU-native dual-modal remote-sensing fusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
salalalala23/Dual-modal-fusion (config-driven supervised per-pixel
classification of paired MS+PAN scenes, dual-branch fusion model zoo,
two-stage GAN ("DQTL") training, confusion-matrix metrics and Excel
reports, full-scene classification-map rendering).

Design tenets (see ARCHITECTURE.md):
  * Scenes live in HBM as whole arrays; patch extraction is a vectorized
    gather, never a Python loop (reference: train/dataset.py __getitem__).
  * Every hot loop (train epoch, eval, full-scene inference) is a single
    jitted ``lax.scan`` over fixed-shape batches.
  * Parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding:
    the batch axis shards over the ``data`` mesh axis, the scene pixel
    grid shards over ``data`` for full-scene inference, and classifier
    weights can shard over ``model``.
  * Metrics (confusion matrix -> OA/AA/kappa) accumulate on device.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: first-compile latency (especially via
# remote-TPU tunnels) dominates short runs; subsequent processes reuse
# compiled executables.  Override location with DMFUSION_XLA_CACHE, or
# set it empty to disable.
_cache_dir = _os.environ.get("DMFUSION_XLA_CACHE",
                             _os.path.expanduser("~/.cache/dmfusion_xla"))
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from dmfusion.config import load_config, render_config  # noqa: F401
