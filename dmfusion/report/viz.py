"""Research visualization utilities.

Covers the reference's diagnostic plotting capabilities once, in the live
layer (SURVEY.md §0 directive), instead of the scattered debug snippets:

  * :func:`channel_grid` — per-channel heatmap grid of a BHWC/BCHW tensor
    (reference ``visualize_channels``, function/function.py:275-313 and
    solver/mainsolver.py:651-674),
  * :func:`embedding_scatter` — 2-D t-SNE (or PCA fallback) scatter of
    logits/embeddings colored by class, the diagnostic the reference
    inlined in its test loop (solver/mainsolver.py:110-136) and in the
    two-stage solver's 4-stream analysis (tostagesolver.py:449-489),
  * :func:`save_image_grid` — tile a batch of images (the GAN sample
    dumps, tostagesolver.py:160-166).

Everything is file-output only (headless-safe) and entirely optional —
nothing in the training path imports this module.
"""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def channel_grid(tensor: np.ndarray, path: str, num_channels: int = 8,
                 cols: int = 4, title: str = "") -> None:
    """First batch element's channels as a heatmap grid (NHWC or NCHW)."""
    plt = _mpl()
    x = np.asarray(tensor)
    if x.ndim == 4:
        x = x[0]
    if x.shape[-1] < x.shape[0]:          # HWC -> CHW
        x = np.moveaxis(x, -1, 0)
    n = min(num_channels, x.shape[0])
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i, ax in enumerate(axes.flat):
        ax.axis("off")
        if i < n:
            ax.imshow(x[i], cmap="viridis")
            ax.set_title(f"ch {i} {title}", fontsize=8)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def embedding_scatter(embeddings: np.ndarray, labels: np.ndarray, path: str,
                      max_points: int = 2000, seed: int = 0,
                      names: list[str] | None = None) -> None:
    """2-D projection scatter colored by integer label; ``names`` maps
    label value -> legend text (the two-stage 4-stream scatter labels
    streams M/PAN/GM/GP, reference tostagesolver.py:470-478)."""
    plt = _mpl()
    emb = np.asarray(embeddings)
    lab = np.asarray(labels).astype(int)
    if len(emb) > max_points:
        rng = np.random.default_rng(seed)
        keep = rng.choice(len(emb), max_points, replace=False)
        emb, lab = emb[keep], lab[keep]
    try:
        from sklearn.manifold import TSNE
        xy = TSNE(n_components=2, random_state=seed,
                  init="pca").fit_transform(emb)
    except Exception:
        centered = emb - emb.mean(0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        xy = centered @ vt[:2].T
    fig, ax = plt.subplots(figsize=(8, 6))
    classes = np.unique(lab)
    cmap = plt.get_cmap("tab20", len(classes))
    for i, c in enumerate(classes):
        m = lab == c
        ax.scatter(xy[m, 0], xy[m, 1], s=6, color=cmap(i), alpha=0.6,
                   label=names[c] if names is not None else f"class {c}")
    ax.legend(fontsize=7, markerscale=2, ncol=2)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.savefig(path, dpi=120)
    plt.close(fig)


def save_image_grid(images: np.ndarray, path: str, cols: int = 4) -> None:
    """Tile a (B, H, W, C) float [0,1] batch into one PNG."""
    from PIL import Image
    x = np.asarray(images)
    b, h, w = x.shape[:3]
    cols = min(cols, b)
    rows = -(-b // cols)
    c = x.shape[3] if x.ndim == 4 else 1
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(b):
        r, col = divmod(i, cols)
        img = x[i]
        if img.ndim == 2:
            img = img[..., None]
        img = img[..., :3] if img.shape[-1] >= 3 else np.repeat(
            img[..., :1], 3, axis=-1)
        canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = np.clip(
            img * 255, 0, 255).astype(np.uint8)
    Image.fromarray(canvas).save(path)
