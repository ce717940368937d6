"""Posterior / prior plotting (reference ``DataHandling/Illustration.py``).

``plot_posterior`` reproduces the reference plot (``Illustration.py:33-90``):
posterior mean with ±2σ band, train/test scatter overlays, optional
change-point vlines, SVG export. ``plot_prior_samples`` mirrors ``:18-30``.
Matplotlib is imported lazily so headless/TPU jobs don't pay for it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_posterior(
    x_test, mean, sd,
    x_train=None, y_train=None, y_test=None,
    changepoints: Optional[Sequence[float]] = None,
    path: Optional[str] = None,
    title: str = "GP posterior",
):
    plt = _plt()
    x_test = np.asarray(x_test).reshape(-1)
    order = np.argsort(x_test)
    xt, mu, s = x_test[order], np.asarray(mean)[order], np.asarray(sd)[order]
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.fill_between(xt, mu - 2 * s, mu + 2 * s, alpha=0.25, label="±2σ")
    ax.plot(xt, mu, lw=1.5, label="posterior mean")
    if x_train is not None:
        ax.scatter(np.asarray(x_train).reshape(-1), np.asarray(y_train), s=6,
                   alpha=0.5, label="train")
    if y_test is not None:
        ax.scatter(xt, np.asarray(y_test)[order], s=6, alpha=0.5, marker="x",
                   label="test")
    for cp in changepoints or []:
        ax.axvline(float(cp), ls="--", lw=0.8, color="grey")
    ax.set_title(title)
    ax.legend()
    if path:
        fig.savefig(path, bbox_inches="tight")  # .svg supported as in reference
        plt.close(fig)
        return path
    return fig


def plot_prior_samples(x, samples, path: Optional[str] = None,
                       title: str = "GP prior samples"):
    plt = _plt()
    x = np.asarray(x).reshape(-1)
    order = np.argsort(x)
    fig, ax = plt.subplots(figsize=(10, 5))
    for s in np.atleast_2d(np.asarray(samples)):
        ax.plot(x[order], s[order], lw=1.0, alpha=0.8)
    ax.set_title(title)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
