"""Per-channel min-max scaling of channelizer output.

Reference semantics: /root/reference/minMaxScaler.py:12
(cpu_threaded_multichannel_minMaxScaler_32fc, backed by the threaded C DLL
multiChannel_minMaxScaler_32fc.c): per channel, scale the complex samples so
the amplitude range maps to [0, 1].

The reference C code normalizes each channel's |x| to [0, 1] preserving phase.
Here it's one fused jit over the whole (time, channels) matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pydsproutines_tpu.utils.dtypes import real_dtype_for


@functools.partial(jax.jit, static_argnames=("preserve_phase",))
def multichannel_minmax_scale(channels: jnp.ndarray,
                              preserve_phase: bool = False) -> jnp.ndarray:
    """Scale each channel of a (channels, time) complex matrix so its
    amplitude spans [0, 1].

    Default (matching the reference C routine, which emits scaled
    magnitudes): returns the real scaled-magnitude matrix. With
    ``preserve_phase`` the complex samples are rescaled instead.
    """
    rdt = real_dtype_for(channels.dtype)
    amp = jnp.abs(channels).astype(rdt)
    amin = jnp.min(amp, axis=-1, keepdims=True)
    amax = jnp.max(amp, axis=-1, keepdims=True)
    span = jnp.where(amax > amin, amax - amin, 1.0)
    scaled_amp = (amp - amin) / span
    if not preserve_phase:
        return scaled_amp
    phase = jnp.where(amp > 0, channels / amp.astype(channels.dtype), 0)
    return (phase * scaled_amp.astype(channels.dtype)).astype(channels.dtype)
