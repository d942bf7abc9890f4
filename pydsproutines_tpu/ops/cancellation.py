"""Signal cancellation: LS complex-amplitude estimate and subtraction.

Reference semantics: /root/reference/cancellationRoutines.py:12
(cancelSignalAtIdx).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("siglen",))
def _cancel_impl(sig, rx, idx, siglen):
    seg = jax.lax.dynamic_slice(rx, (idx,), (siglen,))
    pdt = jnp.vdot(sig, seg)
    amp = pdt / jnp.sum(sig.real * sig.real + sig.imag * sig.imag)
    cancelled = jax.lax.dynamic_update_slice(rx, seg - amp * sig, (idx,))
    return cancelled, amp


def cancel_signal_at_idx(sig: jnp.ndarray, rx: jnp.ndarray, idx: int):
    """Estimate the complex amplitude of ``sig`` inside ``rx`` at ``idx`` by
    least squares and subtract it (reference cancelSignalAtIdx).

    Returns (cancelled rx copy, estimated amplitude)."""
    return _cancel_impl(jnp.asarray(sig), jnp.asarray(rx), idx,
                        sig.shape[-1])
