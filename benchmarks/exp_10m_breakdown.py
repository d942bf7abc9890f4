"""Experiment: where does the 10M x 128 freq-scan xcorr sweep spend time?

Times isolated pieces of the pipeline on the real chip with the same
rep-differencing harness as bench.py (axon memoizes identical dispatches and
hides queueing behind block_until_ready, so every rep varies inputs and the
fixed dispatch floor is differenced out).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

# repo root on sys.path (PYTHONPATH breaks the axon plugin; see ROADMAP.md)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(fn, *args, r_lo=1, r_hi=3):
    def once(n_reps, salt):
        ts = []
        for rep in range(2):
            t0 = time.perf_counter()
            out = fn(*args, salt + rep, n_reps)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    once(r_lo, 0)
    once(r_hi, 0)
    a = once(r_lo, 1)
    b = once(r_hi, 1)
    return (b - a) / (r_hi - r_lo)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from pydsproutines_tpu.ops.fft import get_fft_plan
    from pydsproutines_tpu.ops.xcorr import gather_shift_slices

    n = 10_000_000
    B = 16
    plan = get_fft_plan(n, "complex64")
    print("factors", plan.factors, file=sys.stderr)
    f0, f1_, f2_ = plan.factors

    rng = np.random.default_rng(0)
    rx_ri = jax.device_put(jnp.asarray(
        rng.standard_normal((2, n + 256), dtype=np.float32)))
    cut_ri = jax.device_put(jnp.asarray(
        rng.standard_normal((2, n), dtype=np.float32)))

    # (a) gather+modulate only: produce pdt (B, n) and reduce to tiny output
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def gm(rx_ri, cut_ri, salt, n_reps):
        rx = jax.lax.complex(rx_ri[0], rx_ri[1])
        cut = jax.lax.complex(cut_ri[0], cut_ri[1])

        def one(i):
            sl = gather_shift_slices(rx, salt + i + jnp.arange(B), n, 1)
            pdt = sl * jnp.conj(cut)
            return jnp.sum(pdt.real, axis=-1)  # force materialization-ish
        return jax.lax.map(one, jnp.arange(n_reps))

    # (b) stage0 einsum on a resident batch
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def s0(rx_ri, cut_ri, salt, n_reps):
        rx = jax.lax.complex(rx_ri[0], rx_ri[1])
        w, tw = plan._mats()

        def one(i):
            b = jax.lax.dynamic_slice(rx, (i,), (n,)).reshape(f0, n // f0)
            f1 = jnp.einsum("kn,nm->km", w[0], b)
            return jnp.sum(f1.real, axis=-1)
        return jax.lax.map(one, jnp.arange(n_reps) + salt)

    # (c) full call_peak on one shift at a time (B=1 stages)
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def pk(rx_ri, cut_ri, salt, n_reps):
        rx = jax.lax.complex(rx_ri[0], rx_ri[1])
        cut = jax.lax.complex(cut_ri[0], cut_ri[1])

        def one(i):
            sl = gather_shift_slices(rx, salt + i + jnp.arange(B), n, 1)
            pdt = sl * jnp.conj(cut)
            return plan.call_peak(pdt)
        return jax.lax.map(one, jnp.arange(n_reps))

    t_gm = timed(gm, rx_ri, cut_ri)
    print(f"gather+modulate ({B} shifts): {t_gm*1e3:8.2f} ms")
    t_s0 = timed(s0, rx_ri, cut_ri)
    print(f"stage0 einsum (1 shift):      {t_s0*1e3:8.2f} ms")
    t_pk = timed(pk, rx_ri, cut_ri)
    print(f"full chunk ({B} shifts):      {t_pk*1e3:8.2f} ms "
          f"-> sweep(128) = {t_pk*128/B*1e3:.1f} ms")

    # (d) per-shift pipeline, no batch gather: slice -> modulate -> call_peak
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def per_shift(rx_ri, cut_ri, salt, n_reps):
        rx = jax.lax.complex(rx_ri[0], rx_ri[1])
        cc = jnp.conj(jax.lax.complex(cut_ri[0], cut_ri[1]))

        def one(s):
            pdt = jax.lax.dynamic_slice(rx, (s,), (n,)) * cc
            return plan.call_peak(pdt[None, :])
        return jax.lax.map(one, salt + jnp.arange(n_reps * B))

    t_ps = timed(per_shift, rx_ri, cut_ri)
    print(f"per-shift pipeline ({B} shifts): {t_ps*1e3:8.2f} ms "
          f"-> sweep(128) = {t_ps*128/B*1e3:.1f} ms "
          f"= {n*128/(t_ps*128/B)/1e9:.1f} Gss/s")
