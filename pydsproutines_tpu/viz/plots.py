"""Matplotlib plotting helpers.

Reference semantics: /root/reference/plotRoutines.py (plotAmpTime-style
amplitude/time traces :329, plotSpectra :544, plotConstellation :636,
plotXcorrResults1D :785, specgram/heatmaps, filter freqz). The reference
keeps matplotlib and pyqtgraph twins of everything; here only the matplotlib
backend is kept (SURVEY.md §7.8: plotting minimal, matplotlib only).

All functions accept numpy or jax arrays, convert to numpy, and return
(fig, ax).
"""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib.pyplot as plt
    return plt


def _np(x):
    return np.asarray(x)


def plot_amp_time(signals, fs_list=None, labels=None, ax=None):
    """|x| against time for one or more signals (reference pgPlotAmpTime)."""
    plt = _mpl()
    if not isinstance(signals, (list, tuple)):
        signals = [signals]
    if fs_list is None:
        fs_list = [1.0] * len(signals)
    if np.isscalar(fs_list):
        fs_list = [fs_list] * len(signals)
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    for i, (sig, fs) in enumerate(zip(signals, fs_list)):
        sig = _np(sig)
        t = np.arange(sig.size) / fs
        label = labels[i] if labels else None
        ax.plot(t, np.abs(sig), label=label)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("|x|")
    if labels:
        ax.legend()
    return fig, ax


def plot_spectra(signals, fs_list=None, labels=None, ax=None, db: bool = True):
    """Magnitude spectra on the wrapped FFT frequency axis (reference
    plotSpectra, plotRoutines.py:544)."""
    from pydsproutines_tpu.utils.freq import make_freq

    plt = _mpl()
    if not isinstance(signals, (list, tuple)):
        signals = [signals]
    if fs_list is None:
        fs_list = [1.0] * len(signals)
    if np.isscalar(fs_list):
        fs_list = [fs_list] * len(signals)
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    for i, (sig, fs) in enumerate(zip(signals, fs_list)):
        sig = _np(sig)
        spec = np.fft.fftshift(np.abs(np.fft.fft(sig)))
        f = np.fft.fftshift(np.asarray(make_freq(sig.size, fs)))
        y = 20 * np.log10(spec + 1e-30) if db else spec
        ax.plot(f, y, label=labels[i] if labels else None)
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("Magnitude (dB)" if db else "Magnitude")
    if labels:
        ax.legend()
    return fig, ax


def plot_constellation(syms, ax=None, **scatter_kwargs):
    """Scatter of complex symbols (reference plotConstellation,
    plotRoutines.py:636)."""
    plt = _mpl()
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    syms = _np(syms)
    scatter_kwargs.setdefault("s", 4)
    ax.scatter(syms.real, syms.imag, **scatter_kwargs)
    ax.set_aspect("equal")
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    return fig, ax


def plot_xcorr_results_1d(shifts, qf2, freqs=None, ax=None):
    """QF^2 against shift, optionally with the peak-frequency track
    (reference plotXcorrResults1D, plotRoutines.py:785)."""
    plt = _mpl()
    shifts = _np(shifts)
    qf2 = _np(qf2)
    if freqs is not None:
        fig, axs = plt.subplots(2, 1, sharex=True)
        axs[0].plot(shifts, qf2)
        axs[0].set_ylabel("QF$^2$")
        axs[1].plot(shifts, _np(freqs))
        axs[1].set_ylabel("Peak freq")
        axs[1].set_xlabel("Shift (samples)")
        return fig, axs
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    ax.plot(shifts, qf2)
    ax.set_xlabel("Shift (samples)")
    ax.set_ylabel("QF$^2$")
    return fig, ax


def plot_caf_heatmap(caf, shifts=None, freqs=None, ax=None):
    """2-D CAF heatmap (shift x frequency)."""
    plt = _mpl()
    caf = _np(caf)
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    extent = None
    if shifts is not None and freqs is not None:
        shifts, freqs = _np(shifts), _np(freqs)
        extent = [freqs[0], freqs[-1], shifts[-1], shifts[0]]
    im = ax.imshow(caf, aspect="auto", extent=extent)
    ax.set_xlabel("Frequency")
    ax.set_ylabel("Shift")
    ax.figure.colorbar(im, ax=ax, label="QF$^2$")
    return fig, ax


def plot_specgram(x, fs: float = 1.0, nfft: int = 1024, ax=None):
    """Spectrogram convenience wrapper."""
    plt = _mpl()
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    ax.specgram(_np(x), NFFT=nfft, Fs=fs)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Frequency (Hz)")
    return fig, ax


def plot_filter_response(taps, fs: float = 1.0, worN: int = 4096, ax=None):
    """Filter magnitude response (reference freqz plots)."""
    import scipy.signal as sps

    plt = _mpl()
    w, h = sps.freqz(_np(taps), worN=worN, fs=fs)
    fig, ax = (None, ax) if ax is not None else plt.subplots()
    if fig is None:
        fig = ax.figure
    ax.plot(w, 20 * np.log10(np.abs(h) + 1e-30))
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("Magnitude (dB)")
    return fig, ax
