#!/usr/bin/env python
"""Real-chip parity + throughput for the fused Pallas upfirdn kernel and the
fir_upfirdn fused chain (interpret-mode tests can't catch Mosaic-only bugs).
"""

import functools
import sys

import numpy as np
import scipy.signal as sps

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.filters import (upfirdn, fir_upfirdn, lfilter_fir,
                                           get_upfirdn_size)

N = 4_194_304
FIR_TAPS, RS_TAPS, UP, DOWN = 128, 95, 5, 4

rng = np.random.default_rng(1)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h_fir = rng.standard_normal(FIR_TAPS).astype(np.float32)
h_rs = rng.standard_normal(RS_TAPS).astype(np.float32)
d_x = jax.device_put(jnp.asarray(x_ri))
d_hf = jax.device_put(jnp.asarray(h_fir))
d_hr = jax.device_put(jnp.asarray(h_rs))

# ---- parity on the chip (plane outputs; axon can't move complex) ----------
@jax.jit
def run_upfirdn(xri):
    z = upfirdn(d_hr, jax.lax.complex(xri[0], xri[1]), UP, DOWN)
    return jnp.stack([z.real, z.imag])

@jax.jit
def run_fused(xri):
    z = fir_upfirdn(d_hf, d_hr, jax.lax.complex(xri[0], xri[1]), UP, DOWN)
    return jnp.stack([z.real, z.imag])

x64 = x_ri[0].astype(np.float64) + 1j * x_ri[1].astype(np.float64)
z_up = sps.upfirdn(h_rs.astype(np.float64), x64, UP, DOWN)
y64 = sps.lfilter(h_fir.astype(np.float64), 1.0, x64)
z_ch = sps.upfirdn(h_rs.astype(np.float64), y64, UP, DOWN)

o = np.asarray(run_upfirdn(d_x))
err = np.max(np.abs((o[0] + 1j * o[1]) - z_up))
print(f"upfirdn pallas-on-chip maxerr vs f64: {err:.3e}", flush=True)
assert err < 1e-3, "PARITY FAIL"

o = np.asarray(run_fused(d_x))
got = o[0] + 1j * o[1]
m = len(got) - -(-(RS_TAPS - 1) // DOWN)
err = np.max(np.abs(got[:m] - z_ch[:m]))
print(f"fir_upfirdn fused-on-chip maxerr vs f64 chain: {err:.3e}",
      flush=True)
assert err < 1e-3, "PARITY FAIL"

# ---- throughput ------------------------------------------------------------
def measure(name, body):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            outs.append(jnp.sum(jnp.abs(body(x))))
        return jnp.stack(outs)
    dt = rep_differenced(step, d_x)
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)

measure("upfirdn PALLAS", lambda x: upfirdn(d_hr, x, UP, DOWN))
measure("chain fused fir_upfirdn PALLAS",
        lambda x: fir_upfirdn(d_hf, d_hr, x, UP, DOWN))
measure("chain two-op (lfilter + pallas upfirdn)",
        lambda x: upfirdn(d_hr, lfilter_fir(d_hf, x), UP, DOWN))
