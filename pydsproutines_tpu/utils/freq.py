"""Frequency-axis helpers and tone generation.

Semantics follow the reference (/root/reference/signalCreationRoutines.py:380
``makeFreq``, :398 ``freqshiftSignal``): the frequency axis is the natural FFT
bin ordering i/length*fs, wrapped to [-fs/2, fs/2) by subtracting fs from any
bin >= fs/2.
"""

from __future__ import annotations

import jax.numpy as jnp

from pydsproutines_tpu.utils.dtypes import FLOAT_DTYPE, complex_dtype_for


def make_freq(length: int, fs: float = 1.0, dtype=FLOAT_DTYPE) -> jnp.ndarray:
    """FFT bin frequencies wrapped to [-fs/2, fs/2).

    Equivalent to the reference's makeFreq loop, vectorized.
    """
    f = jnp.arange(length, dtype=dtype) * (fs / length)
    return jnp.where(f >= fs / 2, f - fs, f)


def tone(length: int, freq: float, fs: float = 1.0, phase: float = 0.0,
         dtype=jnp.complex64) -> jnp.ndarray:
    """exp(1j*(2*pi*freq*n/fs + phase)) for n in [0, length)."""
    rdt = jnp.dtype(dtype).type(0).real.dtype
    n = jnp.arange(length, dtype=rdt)
    theta = 2 * jnp.pi * freq / fs * n + phase
    return jnp.exp(1j * theta).astype(dtype)


def freqshift_signal(x: jnp.ndarray, freq: float, fs: float = 1.0) -> jnp.ndarray:
    """x * exp(1j*2*pi*freq*t) — convenience frequency shift
    (reference signalCreationRoutines.py:398)."""
    cdt = complex_dtype_for(x.dtype)
    return x.astype(cdt) * tone(x.shape[-1], freq, fs, dtype=cdt)
