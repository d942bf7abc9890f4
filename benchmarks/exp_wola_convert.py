#!/usr/bin/env python
"""Cost of plane<->interleaved-f32 conversions around the fused WOLA kernel.

a) stack-interleave (current wola_fused prologue) on its own
b) lax.complex -> bitcast_convert_type -> reshape on its own
c) full fused WOLA with a bitcast prologue/epilogue (candidate rewrite)
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced

N = 8_388_608
NCH = 64
ROWS = N // NCH
rng = np.random.default_rng(2)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
d_x = jax.device_put(jnp.asarray(x_ri))


@functools.partial(jax.jit, static_argnames=("n_reps",))
def conv_stack(xri, salt, n_reps):
    outs = []
    for i in range(n_reps):
        x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
        xq = x.reshape(ROWS, NCH)
        xi = jnp.stack([jnp.real(xq), jnp.imag(xq)],
                       axis=-1).reshape(ROWS, 2 * NCH)
        outs.append(jnp.sum(xi))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def conv_bitcast(xri, salt, n_reps):
    outs = []
    for i in range(n_reps):
        x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
        xq = x.reshape(ROWS, NCH)
        xi = jax.lax.bitcast_convert_type(xq, jnp.float32)
        xi = xi.reshape(ROWS, 2 * NCH)
        outs.append(jnp.sum(xi))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def conv_bitcast_roundtrip(xri, salt, n_reps):
    outs = []
    for i in range(n_reps):
        x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
        xq = x.reshape(ROWS, NCH)
        xi = jax.lax.bitcast_convert_type(xq, jnp.float32)
        y = jax.lax.bitcast_convert_type(xi * 2.0, jnp.complex64)
        outs.append(jnp.sum(jnp.abs(y)))
    return jnp.stack(outs)


def run(name, fn):
    dt = rep_differenced(fn, d_x, max_r_hi=64)
    print(f"{name:34s} {dt * 1e3:8.3f} ms", flush=True)


run("stack interleave", conv_stack)
run("bitcast interleave", conv_bitcast)
run("bitcast roundtrip + abs", conv_bitcast_roundtrip)
