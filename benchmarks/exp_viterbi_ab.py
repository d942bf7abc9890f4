#!/usr/bin/env python
"""Same-process A/B: table-driven Viterbi fast path vs general scan on the
bench geometry (64 bursts x 512 syms, 2-state CP2FSK)."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.viterbi import (_viterbi_run_fast,
                                           _viterbi_run_scan)

B, nsyms, up = 64, 512, 8
alphabet = np.array([1.0, -1.0], dtype=np.complex64)
pretransitions = np.array([[0, 1], [0, 1]], dtype=np.int32)
pulse = np.ones((1, up), dtype=np.complex64)
omegas = np.zeros(1, dtype=np.float32)
start_mask = np.array([True, True])
L = nsyms * up
rng = np.random.default_rng(5)
y_ri = rng.standard_normal((2, B, L), dtype=np.float32)
d_y = jax.device_put(jnp.asarray(y_ri))


def make_step(impl):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(yri, salt, n_reps):
        def one(yrow):
            paths, metrics = impl(
                yrow, jnp.asarray(alphabet), jnp.asarray(pretransitions),
                jnp.asarray(pulse), jnp.asarray(omegas),
                jnp.asarray(start_mask), up=up, pulselen=up, k_syms=1,
                pathlen=nsyms)
            return metrics[jnp.argmin(metrics)]

        def body(acc, i):
            yb = jax.lax.complex(
                yri[0] * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i)),
                yri[1])
            return acc + jnp.sum(jax.vmap(one)(yb)), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(n_reps, dtype=jnp.float32))
        return acc
    return step


for name in (sys.argv[1:] or ["fast", "scan"]):
    impl = {"fast": _viterbi_run_fast, "scan": _viterbi_run_scan}[name]
    dt = rep_differenced(make_step(impl), d_y)
    print(f"{name:6s} {dt * 1e3:8.3f} ms  {B * nsyms / dt / 1e6:7.2f} Msym/s",
          flush=True)
