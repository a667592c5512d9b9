"""Shared plotting helpers for the documentation figure scripts.

Every `fig_*.py` script in this directory regenerates one committed figure
under `docs/examples/assets/`. They run on the CPU backend (small ensembles,
~a minute each) so the figures are reproducible anywhere:

    python docs/examples/scripts/fig_rosenbrock.py

Counterpart of the reference's docs/examples/scripts/ generation scripts
(/root/reference/docs/examples/scripts/), redesigned around the TPU build's
weighted-posterior output (no `corner` dependency; the pair grid below
handles importance weights natively).
"""

import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, ROOT)
ASSETS = os.path.join(ROOT, "docs", "examples", "assets")
os.makedirs(ASSETS, exist_ok=True)


def force_cpu():
    """Run figure scripts on the (deterministic, always-present) CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def savefig(fig, name, dpi=130):
    path = os.path.join(ASSETS, name)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    print(f"wrote {path}")


def pair_grid(samples, weights, labels, truths=None, color="#2563eb", bins=40):
    """Weighted corner-style grid: 1-D histograms on the diagonal, 2-D
    weighted histograms below it. Accepts importance weights directly, so
    no resampling step is needed before plotting."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    samples = np.asarray(samples)
    weights = np.asarray(weights, dtype=float)
    weights = weights / weights.sum()
    d = samples.shape[1]
    fig, axes = plt.subplots(d, d, figsize=(2.1 * d, 2.1 * d))
    if d == 1:
        axes = np.array([[axes]])
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            if j > i:
                ax.set_axis_off()
                continue
            if i == j:
                ax.hist(
                    samples[:, i], bins=bins, weights=weights,
                    color=color, alpha=0.85, density=True,
                )
                if truths is not None:
                    ax.axvline(truths[i], color="#dc2626", lw=1.2)
                ax.set_yticks([])
            else:
                h, xe, ye = np.histogram2d(
                    samples[:, j], samples[:, i], bins=bins, weights=weights
                )
                ax.pcolormesh(xe, ye, h.T, cmap="Blues", rasterized=True)
                if truths is not None:
                    ax.axvline(truths[j], color="#dc2626", lw=0.8)
                    ax.axhline(truths[i], color="#dc2626", lw=0.8)
            if i == d - 1:
                ax.set_xlabel(labels[j])
            else:
                ax.set_xticklabels([])
            if j == 0 and i > 0:
                ax.set_ylabel(labels[i])
            elif j > 0:
                ax.set_yticklabels([])
    fig.tight_layout(h_pad=0.15, w_pad=0.15)
    return fig
