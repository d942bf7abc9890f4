#!/usr/bin/env python
"""Memoryless-Viterbi ACS scan anatomy at the official bench geometry
(64 bursts x 512 syms, A=2, up=8): where do the ~3 ms go, and what does
the unroll buy?

  bm-only  — branch-table build + trivial reduction (no scan)
  acs-N    — full run at scan unroll=N (backtrack DCE'd: metrics consumed)
  paths-8  — unroll 8, consuming PATHS too (backtrack alive)
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.viterbi import _viterbi_run_memoryless

B, NSYMS, UP = 64, 512, 8
alphabet = np.array([1.0, -1.0], dtype=np.complex64)
pret = np.array([[0, 1], [0, 1]], dtype=np.int32)
pulse = np.ones((1, UP), dtype=np.complex64)
omegas = np.zeros(1, dtype=np.float32)
start = np.array([True, True])
L = NSYMS * UP
rng = np.random.default_rng(5)
y_ri = rng.standard_normal((2, B, L), dtype=np.float32)
d_y = jax.device_put(jnp.asarray(y_ri))


def make_step(unroll, want_paths=False, bm_only=False):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(yri, salt, n_reps):
        def one(yrow):
            if bm_only:
                # replicate the table build only
                ypad = jnp.concatenate(
                    [yrow, jnp.zeros(UP + UP, dtype=yrow.dtype)])
                n_all = jnp.arange(NSYMS, dtype=jnp.float32)
                t_rel = jnp.arange(UP, dtype=jnp.float32)
                phase = jnp.exp(-1j * jnp.asarray(omegas)[None, :, None]
                                * (n_all[:, None, None] * UP
                                   + t_rel[None, None, :]))
                base = jnp.einsum("it,nit->nt",
                                  jnp.asarray(pulse).astype(jnp.complex64),
                                  phase.astype(jnp.complex64))
                s = jnp.asarray(alphabet)[None, :, None] * base[:, None, :]
                idx = (jnp.arange(NSYMS)[:, None] * UP
                       + jnp.arange(UP)[None, :])
                ywin = ypad[idx]
                d = ywin[:, None, :] - s
                dsq = d.real * d.real + d.imag * d.imag
                return jnp.sum(dsq)
            paths, metrics = _viterbi_run_memoryless(
                yrow, jnp.asarray(alphabet), jnp.asarray(pret),
                jnp.asarray(pulse), jnp.asarray(omegas), jnp.asarray(start),
                up=UP, pulselen=UP, pathlen=NSYMS, unroll=unroll)
            out = metrics[jnp.argmin(metrics)]
            if want_paths:
                out = out + jnp.sum(paths).astype(jnp.float32)
            return out

        def body(acc, i):
            yb = jax.lax.complex(
                yri[0] * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i)),
                yri[1])
            return acc + jnp.sum(jax.vmap(one)(yb)), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(n_reps, dtype=jnp.float32))
        return acc
    return step


def run(name, fn):
    try:
        dt = rep_differenced(fn, d_y)
        print(f"{name:10s} {dt * 1e3:8.3f} ms  "
              f"{B * NSYMS / dt / 1e6:7.2f} Msym/s  "
              f"spread {dt.spread_pct:.1f}%", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


want = sys.argv[1:] or ["bm-only", "acs-8", "acs-16", "acs-32", "acs-64",
                        "paths-8"]
for mode in want:
    if mode == "bm-only":
        run(mode, make_step(8, bm_only=True))
    elif mode.startswith("acs-"):
        run(mode, make_step(int(mode[4:])))
    elif mode.startswith("paths-"):
        run(mode, make_step(int(mode[6:]), want_paths=True))
