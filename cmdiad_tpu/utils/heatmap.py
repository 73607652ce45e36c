"""Segmentation-map heatmap rendering.

Replaces ``utils/heatmap.py`` of the reference (a scratch script with
hardcoded Windows paths rendering seaborn heatmaps of dumped ``.pt`` score
maps) with a reusable function + CLI over the framework's ``.npz``/image
outputs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np


def render_heatmap(score_map: np.ndarray, out_path: str,
                   rgb: Optional[np.ndarray] = None,
                   gt: Optional[np.ndarray] = None,
                   title: str = "") -> str:
    """Render an anomaly score map (optionally next to rgb/gt) to a PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [(score_map, "anomaly score", "jet")]
    if gt is not None:
        panels.insert(0, (gt, "ground truth", "gray"))
    if rgb is not None:
        panels.insert(0, (rgb, "input", None))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (img, label, cmap) in zip(axes, panels):
        if cmap is None:
            ax.imshow(np.asarray(img))
        else:
            im = ax.imshow(np.asarray(img), cmap=cmap)
            fig.colorbar(im, ax=ax, fraction=0.046)
        ax.set_title(label)
        ax.axis("off")
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def render_run(seg_dir: str, out_dir: str, limit: int = 0) -> int:
    """Render every saved .npz segmentation map under ``seg_dir``.

    Output names embed the relative path (class dirs etc.) so same-numbered
    samples from different classes don't overwrite each other.
    """
    root = Path(seg_dir)
    paths = sorted(root.rglob("*.npz"))
    if limit:
        paths = paths[:limit]
    for p in paths:
        name = "_".join(p.relative_to(root).with_suffix("").parts)
        with np.load(p) as z:
            render_heatmap(z["s_map"], str(Path(out_dir) / (name + ".png")),
                           gt=z.get("gt"), title=name)
    return len(paths)
