"""Cyclostationary / blind modulation estimation.

Reference semantics: /root/reference/cyclostationaryRoutines.py
(PSKOrderDetector :16, estimateBaud :126, estimateOffsetViaCM :172).

All three are spectral-moment tricks: raise the signal to a power m (PSK order
collapses to a tone), FFT, look at the peaks. Batched rows go through one
batched FFT (jit/vmap friendly); the baud estimator's prominence-based peak
sort stays host-side (scipy.find_peaks is inherently dynamic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from pydsproutines_tpu.utils.freq import make_freq


@functools.partial(jax.jit, static_argnames=("num_iter",))
def cm_peak_scan(x: jnp.ndarray, num_iter: int):
    """Repeatedly square the rows of ``x`` and record the spectral peak
    (index, value) at each power 2, 4, ... (reference
    PSKOrderDetector._computeCmMaxes, cyclostationaryRoutines.py:102).

    Returns (mi (num_iter, N) uint32, peaks (num_iter, N) float)."""
    x2 = jnp.atleast_2d(x)

    def step(carry, _):
        xc = carry * carry
        xf = jnp.abs(jnp.fft.fft(xc, axis=-1))
        mi = jnp.argmax(xf, axis=-1)
        pk = jnp.max(xf, axis=-1)
        return xc, (mi.astype(jnp.uint32), pk)

    _, (mi, peaks) = jax.lax.scan(step, x2, None, length=num_iter)
    return mi, peaks


class PSKOrderDetector:
    """PSK order detection by iterated squaring + spectral peak ratios
    (reference PSKOrderDetector, cyclostationaryRoutines.py:16)."""

    m_p = [2, 4, 8]

    def __init__(self, max_m: int):
        if max_m not in (4, 8):
            raise ValueError("Max order 'm' must be 4 or 8.")
        self.max_m = max_m
        self.mi = None
        self.peaks = None
        self.ratios = None

    def estimate_order(self, x: jnp.ndarray, threshold: float = 0.2):
        x2 = jnp.atleast_2d(jnp.asarray(x))
        num_iter = self.m_p.index(self.max_m) + 1
        n, length = x2.shape
        self.mi, self.peaks = cm_peak_scan(x2, num_iter)
        peaks = np.asarray(self.peaks)

        order = np.zeros(n, dtype=np.uint8)
        self.ratios = np.zeros((num_iter - 1, n))
        for i in range(1, num_iter):
            prediction = (peaks[i - 1] / length) ** 2 * length
            self.ratios[i - 1] = prediction / peaks[i]
            order[self.ratios[i - 1] > threshold] = self.m_p[i - 1]
        order[order == 0] = self.max_m
        return order


def estimate_baud(x, fs: float):
    """Baud estimation from the cyclic peaks of FFT(|x|) (reference
    estimateBaud, cyclostationaryRoutines.py:126). Returns
    (est_baud, idx1, idx2, Xf, freq)."""
    x = np.asarray(x)
    xf = np.fft.fftshift(np.fft.fft(np.abs(x)))
    xfabs = np.abs(xf)
    freq = np.fft.fftshift(np.asarray(make_freq(x.size, fs, dtype=jnp.float64)))
    peaks, _ = sps.find_peaks(xfabs)
    prominences = sps.peak_prominences(xfabs, peaks)[0]
    si = np.argsort(prominences)
    peaks = peaks[si]
    b1 = freq[peaks[-2]]
    b2 = freq[peaks[-3]]
    est_baud = (abs(b1) + abs(b2)) / 2
    return est_baud, peaks[-2], peaks[-3], xf, freq


@functools.partial(jax.jit, static_argnames=("fs", "order"))
def estimate_offset_via_cm(x: jnp.ndarray, fs: float, order: int):
    """CMx0 carrier offset estimate: peak of FFT(x^order)/order (reference
    estimateOffsetViaCM, cyclostationaryRoutines.py:172)."""
    xp = x ** order
    xpf = jnp.fft.fft(xp)
    mi = jnp.argmax(jnp.abs(xpf))
    freqvec = make_freq(x.shape[-1], fs)
    return freqvec[mi] / order
