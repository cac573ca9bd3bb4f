"""Attention-alignment and feature-trajectory plots.

Rebuilds the reference generate.py's saved plots (SURVEY.md §3.2/§5
"attention plots saved at generation"). Uses matplotlib's Agg backend —
no display needed.
"""

from __future__ import annotations

import numpy as np


def save_attention_plot(path: str, phi: np.ndarray, length: int,
                        text_len: int):
    """phi: (T, U) attention weights; plot the (length, text_len) region."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.imshow(phi[:length, :text_len].T, aspect="auto", origin="lower",
              interpolation="nearest")
    ax.set_xlabel("frame")
    ax.set_ylabel("text position")
    ax.set_title("window attention alignment")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_feature_plot(path: str, frames: np.ndarray, length: int):
    """frames: (T, D) raw feature trajectories."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = frames[:length]
    fig, axes = plt.subplots(2, 1, figsize=(8, 6))
    axes[0].imshow(f.T, aspect="auto", origin="lower",
                   interpolation="nearest")
    axes[0].set_title("generated vocoder features")
    axes[1].plot(f[:, -2])  # conventionally log-f0 next to vuv flag
    axes[1].set_title("feature dim -2 trajectory (log-f0 slot)")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
