"""Validation diagnostics: sample grids, power spectra, histograms.

Reference-parity plotting surface (utils/validation_plotting.py:10-193) built
on the in-repo P(k) estimator instead of the external cosmotools package.
matplotlib imports are lazy and Agg-forced so metrics never require a display
(decoupling flagged in SURVEY §2 quirk 5).

Array convention here: fields are (N, C, H, W) like the reference's plotting
inputs (the painter/trainer emit NHWC; use np.moveaxis(a, -1, 1) to adapt).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d

__all__ = ["plot_samples", "plot_power_spectra", "plot_histogram",
           "power_spectrum_fractional_error"]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_samples(output_true, output_pred, input, output_pred_var=None,
                 n_sample: int = 4, input_label: str = "",
                 output_labels: Sequence[str] = (), tile_size: float = 2.5):
    """Grid of truth/prediction(/variance) tiles per sample."""
    plt = _plt()
    n = min(output_true.shape[0], n_sample)
    rows_per = 2 if output_pred_var is None else 3
    n_row = rows_per * n
    n_col = output_true.shape[1] + 1
    fig, ax = plt.subplots(n_row, n_col, sharex=True, sharey=True,
                           figsize=(n_col * tile_size, n_row * tile_size),
                           squeeze=False)
    cmaps = ["viridis", "magma", "plasma", "inferno"]
    for i in range(n):
        ax[rows_per * i, 0].imshow(np.squeeze(input[i]), cmap=cmaps[0],
                                   vmin=-1, vmax=1)
        for j in range(output_true.shape[1]):
            kw = {"cmap": cmaps[(j + 1) % 4], "vmin": -1, "vmax": 1}
            ax[rows_per * i, j + 1].imshow(np.squeeze(output_true[i, j]), **kw)
            ax[rows_per * i + 1, j + 1].imshow(np.squeeze(output_pred[i, j]), **kw)
            if output_pred_var is not None:
                ax[rows_per * i + 2, j + 1].imshow(
                    np.log(np.squeeze(output_pred_var[i, j])),
                    cmap=kw["cmap"])
    for p in ax.flat:
        p.set_axis_off()
    ax[0, 0].set_title(input_label)
    for j, lab in enumerate(output_labels):
        ax[0, j + 1].set_title(lab)
    return fig, ax


def power_spectrum_fractional_error(output_true, output_pred, input, L,
                                    mode: str = "auto",
                                    output_inverse_transforms=None,
                                    input_inverse_transforms=None,
                                    n_k_bin: int = 20):
    """The metric behind the plots: per-sample Pk_pred/Pk_true - 1.

    Fields are (N, C, H, W); transforms (if given) are lists of per-sample
    callables applied before the FFT (the reference inverse-transforms tiles
    back to physical units first, painter.py:321,345-346). Returns
    (k, frac_dev (N, C, n_k)).
    """
    n, c = output_true.shape[:2]
    frac = np.zeros((n, c, n_k_bin))
    k_out = None
    for j in range(n):
        for i in range(c):
            inv = (output_inverse_transforms[j][i]
                   if output_inverse_transforms else (lambda x: x))
            a_true = np.squeeze(inv(output_true[j, i]))
            a_pred = np.squeeze(inv(output_pred[j, i]))
            if mode == "auto":
                b_true, b_pred = a_true, a_pred
            elif mode == "cross":
                inv_in = (input_inverse_transforms[j]
                          if input_inverse_transforms else (lambda x: x))
                b_true = b_pred = np.squeeze(inv_in(input[j, 0]))
            else:
                raise ValueError(f"Invalid mode: {mode}.")
            pk_t, k, _, _ = pseudo_pofk_2d(a_true, b_true, L, n_k_bin=n_k_bin)
            pk_p, _, _, _ = pseudo_pofk_2d(a_pred, b_pred, L, n_k_bin=n_k_bin)
            pk_t, pk_p = np.asarray(pk_t), np.asarray(pk_p)
            # empty log-bins (no modes) carry no signal -> 0 deviation
            frac[j, i] = np.where(pk_t != 0, pk_p / np.where(pk_t != 0, pk_t, 1) - 1, 0.0)
            k_out = np.asarray(k)
    return k_out, frac


def plot_power_spectra(output_true, output_pred, input, L,
                       mode: str = "auto", output_labels: Sequence[str] = (),
                       plot_size=(4, 2),
                       input_transform=None, output_transforms=None,
                       n_k_bin: int = 20, plot_mean_deviation: bool = True):
    """Auto/cross P(k) with a fractional-deviation panel (+-0.5 band)."""
    plt = _plt()
    n, c = output_true.shape[:2]
    fig, ax = plt.subplots(2, c, sharex=True,
                           figsize=(plot_size[0] * c, plot_size[1] * 2),
                           squeeze=False)
    k = None
    frac_all = np.zeros((n, c, n_k_bin))
    for j in range(n):
        for i in range(c):
            inv = (output_transforms[j][i] if output_transforms
                   else (lambda x: x))
            a_true = np.squeeze(inv(output_true[j, i]))
            a_pred = np.squeeze(inv(output_pred[j, i]))
            if mode == "auto":
                b_true, b_pred = a_true, a_pred
            else:
                inv_in = (input_transform[j] if input_transform
                          else (lambda x: x))
                b_true = b_pred = np.squeeze(inv_in(input[j, 0]))
            pk_t, k, _, _ = pseudo_pofk_2d(a_true, b_true, L, n_k_bin=n_k_bin)
            pk_p, _, _, _ = pseudo_pofk_2d(a_pred, b_pred, L, n_k_bin=n_k_bin)
            pk_t, pk_p, k = map(np.asarray, (pk_t, pk_p, k))
            frac_all[j, i] = np.where(
                pk_t != 0, pk_p / np.where(pk_t != 0, pk_t, 1) - 1, 0.0)
            ax[0, i].loglog(k, k ** 2 * pk_t, alpha=0.2, c="C0")
            ax[0, i].loglog(k, k ** 2 * pk_p, alpha=0.2, c="C1")
            ax[1, i].semilogx(k, frac_all[j, i], alpha=0.2, c="C0")
    for i in range(c):
        if plot_mean_deviation:
            ax[1, i].semilogx(k, frac_all[:, i].mean(axis=0), lw=2, c="C0")
        if i < len(output_labels):
            ax[0, i].set_title(output_labels[i])
    for p in ax[0]:
        p.set_ylabel(r"$k^2 P(k)$")
        p.plot([], [], c="C0", label="Truth")
        p.plot([], [], c="C1", label="Predicted")
        p.legend(frameon=False)
    for p in ax[1]:
        p.set_ylim(-0.5, 0.5)
        p.axhline(0)
        p.set_ylabel("Fractional\ndifference")
        p.set_xlabel(r"$k$ [Mpc$^{-1}$ h]")
    fig.suptitle(f"{mode.capitalize()} power spectrum")
    return fig, ax


def plot_histogram(output_true, output_pred, n_sample: int = 1,
                   labels: Sequence[str] = (), plot_size=(4, 2),
                   n_bin: int = 100, x_logscale: bool = False,
                   y_logscale: bool = False, **plot_kwargs):
    """Pixel-value histograms, truth vs prediction."""
    plt = _plt()
    c = output_true.shape[1]
    fig, ax = plt.subplots(1, c, sharex=True,
                           figsize=(plot_size[0] * c, plot_size[1]),
                           squeeze=False)
    ax = ax[0]
    for i in range(c):
        d_true = output_true[:n_sample, i].ravel()
        d_pred = output_pred[:n_sample, i].ravel()
        lo = min(d_true.min(), d_pred.min())
        hi = max(d_true.max(), d_pred.max())
        if x_logscale:
            bins = np.logspace(np.log10(max(lo, 1e-12)), np.log10(hi), n_bin)
        else:
            bins = np.linspace(lo, hi, n_bin)
        ax[i].hist(d_true, bins=bins, density=True, alpha=0.5,
                   facecolor="C0", label="Truth", **plot_kwargs)
        ax[i].hist(d_pred, bins=bins, density=True, alpha=0.5,
                   facecolor="C1", label="Predicted", **plot_kwargs)
        ax[i].legend()
        if x_logscale:
            ax[i].set_xscale("log")
        if y_logscale:
            ax[i].set_yscale("log")
        if i < len(labels):
            ax[i].set_xlabel(labels[i])
    return fig, ax
