#!/usr/bin/env python
"""FIR+upfirdn chain breakdown on the real chip (VERDICT round-3 lead #2).

Timing uses bench.rep_differenced (identical axon dispatches are memoized and
there is a ~25 ms dispatch floor; naive per-call timing reads the floor, not
the kernel — measured exactly that on the first attempt). Every step returns
a scalar and perturbs its input with the salt.

Accuracy findings from the first (naive-timed) run, which remain valid:
  shipped chain (HIGHEST)      maxerr 5.5e-05 vs f64 scipy
  plane-split FIR (HIGHEST)    maxerr 8.7e-06
  plane-split FIR (HIGH)       maxerr 9.2e-04   <- 100x worse: HIGH rejected
  fused comb-taps (HIGHEST)    maxerr 4.0e-05   <- matches shipped accuracy
  fused comb-taps (DEFAULT)    maxerr 0.61      <- bf16: rejected
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.filters import (
    lfilter_fir, upfirdn, get_upfirdn_size, _upfirdn_poly_planes)

N = 4_194_304
FIR_TAPS = 128
RS_TAPS = 95
UP, DOWN = 5, 4

rng = np.random.default_rng(1)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h_fir = rng.standard_normal(FIR_TAPS).astype(np.float32)
h_rs = rng.standard_normal(RS_TAPS).astype(np.float32)

d_x = jax.device_put(jnp.asarray(x_ri))
d_hf = jax.device_put(jnp.asarray(h_fir))
d_hr = jax.device_put(jnp.asarray(h_rs))

h_up = np.zeros(FIR_TAPS * UP - (UP - 1), dtype=np.float64)
h_up[::UP] = h_fir
h_comb = np.convolve(h_up, h_rs.astype(np.float64)).astype(np.float32)
d_hc = jax.device_put(jnp.asarray(h_comb))
n_out = get_upfirdn_size(N, RS_TAPS, UP, DOWN)
n_out_f = get_upfirdn_size(N, len(h_comb), UP, DOWN)


def measure(name, body, nsamp=N):
    """body(x_complex) -> array; timed with perturbed unrolled reps."""
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            outs.append(jnp.sum(jnp.abs(body(x))))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {nsamp / dt / 1e9:7.2f} GS/s",
          flush=True)
    return dt


def measure_planes(name, body, nsamp=N):
    """body(planes (2,n) real) -> array; same harness without complex form."""
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            xp = xri * (1.0 + 1e-7 * (salt + i))
            outs.append(jnp.sum(jnp.abs(body(xp))))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {nsamp / dt / 1e9:7.2f} GS/s",
          flush=True)
    return dt


# 1. the shipped two-op chain, and each op alone
measure("chain shipped (lfilter+upfirdn)",
        lambda x: upfirdn(d_hr, lfilter_fir(d_hf, x), UP, DOWN))
measure("lfilter shipped alone", lambda x: lfilter_fir(d_hf, x))
measure("upfirdn alone (on same-length input)",
        lambda x: upfirdn(d_hr, x, UP, DOWN))

# 2. plane-split FIR: 2 real matmuls instead of 4 (taps stay real)
def conv_planes(taps, xri, block=256):
    T = taps.shape[-1]
    n = xri.shape[-1]
    C = block
    rows = -(-n // C)
    W = C + T - 1
    xp = jnp.pad(xri, ((0, 0), (T - 1, rows * C - n + C)))
    r = -(-W // C)
    parts = [jax.lax.slice(xp, (0, i * C), (2, i * C + rows * C))
             .reshape(2, rows, C) for i in range(r)]
    win = jnp.concatenate(parts, axis=2)[:, :, :W]
    t_idx = np.arange(W)[:, None]
    c_idx = np.arange(C)[None, :]
    k = c_idx + T - 1 - t_idx
    mask = jnp.asarray((k >= 0) & (k < T))
    K = jnp.where(mask, taps[np.clip(k, 0, T - 1)], 0)
    y = jnp.einsum("prc,cw->prw", win, K,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(2, -1)[:, :n]


for blk in (128, 256, 512):
    measure_planes(f"lfilter plane-split HIGHEST block={blk}",
                   lambda xp, b=blk: conv_planes(d_hf, xp, b))

# 3. fused combined-taps chain (HIGHEST — accuracy-equivalent to shipped)
measure_planes("chain fused comb-taps (HIGHEST)",
               lambda xp: _upfirdn_poly_planes(xp, d_hc, UP, DOWN, n_out_f))
