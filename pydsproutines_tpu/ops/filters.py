"""FIR filtering, rational resampling (upfirdn), moving sums/averages, and
median filtering.

Reference semantics: /root/reference/filterRoutines.py (cp_lfilter :24,
CupyFilter :57, CupyKernelFilter.getUpfirdnSize :130 / upfirdn kernels,
cupyMultiMovingAverage :1129, cupyMovingAverage :1167, cupyComplexMovingSum
:1206, resampleFactorWizard :1090) and custom_kernels/filter.cu / upfirdn.cu.

TPU-first design: one jax implementation per op. Short-tap FIR runs as a
direct correlation (XLA lowers to MXU-friendly convolution); long signals can
use FFT overlap multiplication. Streaming state (the reference's ``delay``
members) is an explicit carry array so block processing works under jit with
static shapes and no recompiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.utils.dtypes import real_dtype_for
from pydsproutines_tpu.utils.fftlen import next_fast_len


# ---------------------------------------------------------------------------
# FIR filtering
# ---------------------------------------------------------------------------

def _conv_full(taps: jnp.ndarray, x: jnp.ndarray, method: str) -> jnp.ndarray:
    """Full linear convolution of 1-D ``taps`` with 1-D ``x``."""
    if method == "fft":
        n = x.shape[-1] + taps.shape[-1] - 1
        nfft = next_fast_len(n)
        cdt = jnp.result_type(taps.dtype, x.dtype, jnp.complex64)
        X = jnp.fft.fft(x.astype(cdt), nfft)
        H = jnp.fft.fft(taps.astype(cdt), nfft)
        y = jnp.fft.ifft(X * H)[:n]
        if not jnp.issubdtype(jnp.result_type(taps.dtype, x.dtype), jnp.complexfloating):
            y = y.real
        return y.astype(jnp.result_type(taps.dtype, x.dtype))
    return jnp.convolve(x, taps, mode="full")


@functools.partial(jax.jit, static_argnames=("method",))
def lfilter_fir(taps: jnp.ndarray, x: jnp.ndarray, method: str = "direct") -> jnp.ndarray:
    """FIR filter: y[n] = sum_k taps[k] * x[n-k], output length == len(x)
    (reference cp_lfilter, filterRoutines.py:24: convolve(ftap, x)[:x.size]).

    ``method``: "direct" (short taps) or "fft" (overlap in frequency domain,
    better for long taps)."""
    return _conv_full(taps, x, method)[: x.shape[-1]]


class StreamFilter:
    """Streaming FIR filter with explicit delay-line carry (reference
    CupyFilter, filterRoutines.py:57).

    Successive calls to :meth:`lfilter` on contiguous blocks produce the same
    output as one call on the concatenated signal. The carry is a pytree leaf
    (a jnp array), so the step stays jittable with static shapes.
    """

    def __init__(self, taps: jnp.ndarray, dtype=jnp.complex64):
        self.taps = jnp.asarray(taps)
        self.dtype = jnp.dtype(dtype)
        self.delay = jnp.zeros(self.taps.shape[-1], dtype=self.dtype)

    def reset(self):
        self.delay = jnp.zeros_like(self.delay)

    def lfilter(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=self.dtype)
        y, self.delay = stream_lfilter_step(self.taps, x, self.delay)
        return y


@jax.jit
def stream_lfilter_step(taps, x, delay):
    """One streaming FIR block step. Returns (filtered block, new delay).

    ``delay`` holds the last len(taps) input samples of the previous block.
    """
    t = taps.shape[-1]
    xp = jnp.concatenate([delay, x])
    c = jnp.convolve(xp, taps, mode="full")
    y = c[t: t + x.shape[-1]]
    new_delay = xp[-t:]
    return y, new_delay


# ---------------------------------------------------------------------------
# upfirdn — scipy-size-compatible rational resampling
# ---------------------------------------------------------------------------

def get_upfirdn_size(original_size: int, taps_size: int, up: int, down: int) -> int:
    """Output size matching scipy.signal.upfirdn (reference getUpfirdnSize,
    filterRoutines.py:130): ceil((n*up - (up-1) + T - 1)/down)."""
    return int(np.ceil((original_size * up - (up - 1) + taps_size - 1) / down))


@functools.partial(jax.jit, static_argnames=("up", "down"))
def upfirdn(taps: jnp.ndarray, x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Upsample-filter-downsample identical to scipy.signal.upfirdn
    (reference upfirdn kernels, custom_kernels/upfirdn.cu).

    Works on 1-D input or row-wise on 2-D input (the reference's upfirdn_sm
    batch kernel).
    """
    squeeze = x.ndim == 1
    x2 = jnp.atleast_2d(x)
    n = x2.shape[-1]
    # zero-stuff: length (n-1)*up + 1
    up_len = (n - 1) * up + 1
    xup = jnp.zeros((x2.shape[0], n * up), dtype=x2.dtype)
    xup = xup.at[:, ::up].set(x2)
    xup = xup[:, :up_len]
    y = jax.vmap(lambda row: jnp.convolve(row, taps.astype(x2.dtype), mode="full"))(xup)
    out = y[:, ::down]
    expected = get_upfirdn_size(n, taps.shape[-1], up, down)
    out = out[:, :expected]
    # full conv length (n-1)*up + T; ceil div by down can exceed slices — pad
    if out.shape[-1] < expected:
        out = jnp.pad(out, ((0, 0), (0, expected - out.shape[-1])))
    return out[0] if squeeze else out


class StreamUpfirdn:
    """Streaming upfirdn with delay memory (reference
    CupyKernelFilter.run_upfirdn, filterRoutines.py:382): each block is
    prepended with the previous block's tail; the warm-up region is skipped so
    contiguous blocks concatenate seamlessly."""

    def __init__(self, taps, up: int, down: int, memory: int,
                 dtype=jnp.complex64):
        self.taps = jnp.asarray(taps)
        self.up = int(up)
        self.down = int(down)
        self.memory = int(memory)
        self.dtype = jnp.dtype(dtype)
        self.delay = jnp.zeros(self.memory, dtype=self.dtype)

    def reset(self):
        self.delay = jnp.zeros_like(self.delay)

    def resample(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=self.dtype)
        xext = jnp.concatenate([self.delay, x])
        out = upfirdn(self.taps, xext, self.up, self.down)
        self.delay = x[-self.memory:]
        skip = self.memory * self.up // self.down
        length = x.shape[-1] * self.up // self.down
        return out[skip: skip + length]


def resample_factor_wizard(fs: int, rsfs: int) -> tuple[int, int]:
    """Smallest integer (up, down) factors taking sample rate ``fs`` to
    ``rsfs`` (reference resampleFactorWizard, filterRoutines.py:1090)."""
    g = math.gcd(int(fs), int(rsfs))
    return int(rsfs) // g, int(fs) // g


# ---------------------------------------------------------------------------
# Moving sums / averages
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("length", "sum_instead"))
def moving_average(x: jnp.ndarray, length: int, sum_instead: bool = False) -> jnp.ndarray:
    """Causal moving average (or sum) with output length == input length,
    zero-padded at the front — lfilter(ones(L)/L, 1, x) semantics (reference
    cupyMovingAverage, filterRoutines.py:1167; movingAverage kernel,
    custom_kernels/filter.cu:291). Works row-wise on 2-D input (the
    multiMovingAverage variant, filterRoutines.py:1129)."""
    ones = jnp.ones(length, dtype=real_dtype_for(x.dtype))
    squeeze = x.ndim == 1
    x2 = jnp.atleast_2d(x)
    window = jax.vmap(lambda r: jnp.convolve(r, ones.astype(r.dtype),
                                             mode="full"))(x2)[:, : x2.shape[-1]]
    out = window if sum_instead else window / length
    out = out.astype(x.dtype)
    return out[0] if squeeze else out


multi_moving_average = moving_average  # row-wise by construction


@functools.partial(jax.jit, static_argnames=("length", "sum_instead"))
def complex_moving_sum(x: jnp.ndarray, length: int, sum_instead: bool = True) -> jnp.ndarray:
    """|moving window sum|^2 of a complex signal over forward windows,
    output length n - L + 1, float32 (reference cupyComplexMovingSum,
    filterRoutines.py:1206; movingComplexSum kernel writes |sum|^2,
    custom_kernels/filter.cu:436)."""
    ones = jnp.ones(length, dtype=x.dtype)
    window = jnp.convolve(x, ones, mode="valid")  # sum over x[i:i+L]
    if not sum_instead:
        window = window / length
    mag_sq = window.real * window.real + window.imag * window.imag
    return mag_sq.astype(real_dtype_for(x.dtype))


# ---------------------------------------------------------------------------
# Median filter
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("kernel_size",))
def medfilt(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """1-D median filter with zero padding, scipy.signal.medfilt semantics
    (the reference burst detector's GPU medfilt: cupyx medfilt at
    filterRoutines.py:805).

    Static-shape implementation: gather the (n, k) sliding-window matrix and
    take the median along the window axis — XLA fuses the gather + sort.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    half = kernel_size // 2
    n = x.shape[-1]
    xp = jnp.pad(x, (half, half))
    idx = jnp.arange(n)[:, None] + jnp.arange(kernel_size)[None, :]
    windows = xp[idx]
    return jnp.median(windows, axis=-1).astype(x.dtype)
