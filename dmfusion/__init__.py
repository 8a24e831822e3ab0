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

from dmfusion.config import load_config, render_config  # noqa: F401
