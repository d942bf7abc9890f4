"""MXU-friendly FFTs: the four-step (Bailey) matmul DFT.

XLA's TPU FFT is far from the HBM roofline for large 1-D transforms (measured
on v5e: 90 ms for 16 x 1e6-point complex64, 22 ms for 16 x 2^20). Decomposing
an N = N1*N2 transform into batched (N1 x N1) and (N2 x N2) DFT matrix
multiplies + a twiddle puts the work on the MXU instead: measured 11 ms for
the same 16 x 2^20 batch — and it handles *any* composite N exactly (the
reference's CUDA path relies on cuFFT for arbitrary 7-smooth sizes;
/root/reference/benchmarks/README.md sizes are 1e6 = 1000*1000).

Derivation (n = n1*N2 + n2, k = k2*N1 + k1):
    X[k2*N1 + k1] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    sum_{n1} x[n1*N2 + n2] W_{N1}^{n1 k1}
i.e. reshape -> DFT over n1 (matmul) -> twiddle -> DFT over n2 (matmul) ->
transpose-flatten. Both matmuls batch over all rows at once.

The DFT/twiddle matrices are built on the host in float64 phase (mod 2*pi)
and stored complex64, as plan state (numpy, so jit embeds them as constants —
device-resident complex constants can't round-trip on the axon transport).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def best_two_factor(n: int, max_factor: int = 8192) -> tuple[int, int] | None:
    """Factor n = n1*n2 with n1 <= n2, n1 as close to sqrt(n) as possible.
    Returns None if no factorization fits under max_factor (e.g. primes)."""
    for n1 in range(int(math.isqrt(n)), 1, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= max_factor and n2 <= max_factor:
                return n1, n2
            return None
    return None


def _dft_matrix(n: int, dtype=np.complex64) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    phase = np.mod(np.outer(k, k), n) * (2.0 * np.pi / n)
    return np.exp(-1j * phase).astype(dtype)


class FourStepFFT:
    """Plan for an exact N-point DFT via two matmul stages (N = N1*N2).

    ``__call__`` matches jnp.fft.fft along the last axis for any leading batch
    shape. Check ``plan.viable`` before relying on it; fall back to
    jnp.fft.fft otherwise (prime or huge-factor N).
    """

    def __init__(self, n: int, dtype=jnp.complex64, max_factor: int = 8192):
        self.n = int(n)
        self.dtype = np.dtype(dtype)
        factors = best_two_factor(self.n, max_factor)
        self.viable = factors is not None and self.n >= 4096
        if not self.viable:
            self.n1 = self.n2 = None
            return
        self.n1, self.n2 = factors
        n1, n2 = self.n1, self.n2
        self.w1 = _dft_matrix(n1, self.dtype)                 # (k1, n1)
        self.w2 = _dft_matrix(n2, self.dtype)                 # (k2, n2)
        k1 = np.arange(n1, dtype=np.float64)
        nn2 = np.arange(n2, dtype=np.float64)
        phase = np.mod(np.outer(k1, nn2), self.n) * (2.0 * np.pi / self.n)
        self.tw = np.exp(-1j * phase).astype(self.dtype)      # (k1, n2)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.viable:
            return jnp.fft.fft(x, axis=-1)
        return _four_step_apply(x, self.w1, self.w2, self.tw, self.n1, self.n2)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _four_step_apply(x, w1, w2, tw, n1, n2):
    lead = x.shape[:-1]
    b = x.reshape(lead + (n1, n2))
    # F1[..., k1, n2] = sum_n1 w1[k1, n1] * b[..., n1, n2]
    f1 = jnp.einsum("kn,...nm->...km", w1, b)
    g = f1 * tw
    # H[..., k2, k1] = sum_n2 w2[k2, n2] * g[..., k1, n2]
    h = jnp.einsum("km,...nm->...kn", w2, g)
    return h.reshape(lead + (n1 * n2,))


@functools.lru_cache(maxsize=64)
def get_fft_plan(n: int, dtype_str: str = "complex64") -> FourStepFFT:
    """Cached plan lookup; plans are tiny handles over host matrices."""
    return FourStepFFT(n, dtype=np.dtype(dtype_str))


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Drop-in jnp.fft.fft along ``axis`` that routes large composite sizes
    through the four-step MXU path."""
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        out = fft(x, -1)
        return jnp.moveaxis(out, -1, axis)
    plan = get_fft_plan(int(x.shape[-1]),
                        "complex128" if x.dtype == jnp.complex128 else "complex64")
    return plan(x)


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse FFT through the same MXU path: ifft(x) = conj(fft(conj(x)))/N."""
    n = x.shape[axis]
    return jnp.conj(fft(jnp.conj(x), axis)) / n
