"""Point-cloud visualization (matplotlib; the reference uses an
interactive Open3D window, reference: utils/visualization.py:7-54)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def show_pcd(pcds: Sequence[np.ndarray],
             colors: Optional[Sequence] = None,
             save_path: Optional[str] = None,
             point_size: float = 0.5,
             max_points: int = 200_000):
    """Render one or more (N, 3) clouds as a top-down scatter. Writes to
    `save_path` when given, otherwise shows interactively."""
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 12), facecolor="black")
    ax = plt.axes()
    ax.set_facecolor("black")
    ax.axis("equal")
    cmap = plt.get_cmap("tab10")
    for i, pcd in enumerate(pcds):
        pts = np.asarray(pcd)
        if pts.shape[0] > max_points:
            pts = pts[np.random.default_rng(0).choice(
                pts.shape[0], max_points, replace=False)]
        c = colors[i] if colors is not None else cmap(i % 10)
        ax.scatter(pts[:, 0], pts[:, 1], s=point_size, color=c, alpha=0.5)
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path)
        plt.close(fig)
    else:  # pragma: no cover - interactive
        plt.show()
