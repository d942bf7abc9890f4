#!/usr/bin/env python
"""Real-chip parity + A/B throughput for the fused WOLA Pallas kernel
(interpret-mode tests can't catch Mosaic-only bugs; A/B in ONE process per
the round-2 measurement trap)."""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.wola import wola, _wola_fold_matmul  # noqa: E402
from pydsproutines_tpu.ops.pallas.wola_fused import wola_fused  # noqa: E402

N = 8_388_608
DEC = NCH = 64
TAPS = 2048

rng = np.random.default_rng(2)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h = rng.standard_normal(TAPS).astype(np.float32)
d_x = jax.device_put(jnp.asarray(x_ri))
d_h = jax.device_put(jnp.asarray(h))


def wola_xla(f_tap, x, dec, n):
    """The round-2 banded-matmul + IDFT-matmul path, forced (bypasses the
    fused dispatch)."""
    nprime = x.shape[-1] // dec
    g = _wola_fold_matmul(f_tap, x, n, nprime)
    k = np.arange(n, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), n) / n)
    perm = (-np.arange(n)) % n
    return (g @ jnp.asarray(wconj[perm].astype(x.dtype))).astype(x.dtype)


# ---- parity on the chip vs f64 numpy truth (plane outputs; axon can't
# move complex) -------------------------------------------------------------
NP_CHECK = 1 << 20


@jax.jit
def parity_pair(xri):
    x = jax.lax.complex(xri[0, :NP_CHECK], xri[1, :NP_CHECK])
    a = wola_fused(d_h, x, DEC, NCH)
    b = wola_xla(d_h, x, DEC, NCH)
    return (jnp.stack([a.real, a.imag]), jnp.stack([b.real, b.imag]))


def np_wola64(h64, x64, dec, n):
    nprime = len(x64) // dec
    L = len(h64)
    idx = np.arange(nprime)[:, None] * dec - np.arange(L)[None, :]
    win = np.where(idx >= 0, x64[np.clip(idx, 0, len(x64) - 1)], 0)
    folded = (win * h64[None, :]).reshape(nprime, L // n, n).sum(axis=1)
    return np.fft.ifft(folded, axis=-1) * n


a_ri, b_ri = (np.asarray(v) for v in parity_pair(d_x))
x64 = x_ri[0, :NP_CHECK].astype(np.float64) \
    + 1j * x_ri[1, :NP_CHECK].astype(np.float64)
ref = np_wola64(h.astype(np.float64), x64, DEC, NCH)
scale = np.max(np.abs(ref))
for name, o in (("fused", a_ri), ("xla", b_ri)):
    err = np.max(np.abs((o[0] + 1j * o[1]) - ref)) / scale
    print(f"{name:6s} vs f64 numpy: rel maxerr {err:.3e}", flush=True)
    if name == "fused":
        assert err < 1e-4, "PARITY FAIL"


def measure(name, body):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            outs.append(jnp.sum(jnp.abs(body(x))))
        return jnp.stack(outs)
    dt = rep_differenced(step, d_x)
    print(f"{name:40s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)
    return dt


sel = sys.argv[1:] or ["fused", "public"]
if "fused" in sel:
    measure("wola FUSED pallas", lambda x: wola_fused(d_h, x, DEC, NCH))
if "xla" in sel:
    measure("wola XLA banded-matmul", lambda x: wola_xla(d_h, x, DEC, NCH))
if "public" in sel:
    measure("wola public (dispatches fused)", lambda x: wola(d_h, x, DEC, NCH))
