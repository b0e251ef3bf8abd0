"""Debug plotting (utils.visual / mesh / pmesh parity).

Oracle: beamformer/utils.py:20-80.  Matplotlib is optional: every function
degrades to a no-op returning None when it is unavailable or when
``show=False`` and no path is given (CI-safe).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover - matplotlib is present in this image
        return None


def mesh(data: np.ndarray, title: str = "", save: Optional[str] = None):
    """3-D surface of a [F, T] matrix (utils.mesh, utils.py:20-39)."""
    plt = _plt()
    if plt is None:
        return None
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    F, T = data.shape
    X, Y = np.meshgrid(np.arange(T), np.arange(F))
    ax.plot_surface(X, Y, data, cmap="viridis")
    ax.set_title(title)
    if save:
        fig.savefig(save)
    plt.close(fig)
    return fig


def pmesh(data: np.ndarray, title: str = "", save: Optional[str] = None):
    """Pseudocolour image of a [F, T] matrix (utils.pmesh, utils.py:42-57)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots()
    im = ax.pcolormesh(data, shading="auto")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    if save:
        fig.savefig(save)
    plt.close(fig)
    return fig


def visual(x: np.ndarray, y: Optional[np.ndarray] = None, fs: int = 16000, save: Optional[str] = None):
    """Waveform(+enhanced) and spectrogram panel (utils.visual, utils.py:60-80)."""
    plt = _plt()
    if plt is None:
        return None
    n = 2 if y is None else 3
    fig, axes = plt.subplots(n, 1, figsize=(10, 2.5 * n))
    t = np.arange(len(x)) / fs
    axes[0].plot(t, x)
    axes[0].set_title("input")
    if y is not None:
        axes[1].plot(np.arange(len(y)) / fs, y)
        axes[1].set_title("output")
    spec_ax = axes[-1]
    spec_ax.specgram(np.asarray(y if y is not None else x), Fs=fs, NFFT=256, noverlap=128)
    spec_ax.set_title("spectrogram")
    fig.tight_layout()
    if save:
        fig.savefig(save)
    plt.close(fig)
    return fig
