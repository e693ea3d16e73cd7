"""Training-curve plotting.

Reference parity: percivaltts's trainers accumulate training/validation cost
curves and save a matplotlib plot alongside pickled values (SURVEY.md §5
"Metrics/logging"). Here the single source of truth is the JSONL metrics log
(crash-safe, machine-readable); this module renders it to a PNG on demand
(``percivaltts-tpu plot`` or ``Trainer.plot_curves``).
"""

from __future__ import annotations

import os
from typing import Optional

from percivaltts_tpu.utils.logging import read_metrics


def plot_curves(metrics_path: str, out_path: Optional[str] = None) -> str:
    """Render epoch loss/validation curves from a metrics.jsonl file."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = read_metrics(metrics_path, kind="epoch")
    if not epochs:
        raise ValueError(f"{metrics_path}: no epoch records to plot")
    out_path = out_path or os.path.join(
        os.path.dirname(metrics_path) or ".", "curves.png"
    )

    xs = [e["epoch"] for e in epochs]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))

    ax = axes[0]
    for key, label in (("loss", "train loss"), ("valid", "validation cost")):
        ys = [e.get(key) for e in epochs]
        if any(y is not None and y == y for y in ys):
            ax.plot(xs, ys, label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel("cost")
    ax.legend()
    ax.grid(alpha=0.3)

    ax = axes[1]
    plotted = False
    for key in ("w_dist", "gp", "lse", "gen_adv"):
        ys = [e.get(key) for e in epochs]
        if any(y is not None for y in ys):
            ax.plot(xs, ys, label=key)
            plotted = True
    if plotted:
        ax.set_xlabel("epoch")
        ax.set_ylabel("WGAN terms")
        ax.legend()
        ax.grid(alpha=0.3)
    else:
        ax.axis("off")

    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
