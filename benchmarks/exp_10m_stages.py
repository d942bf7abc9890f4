"""Experiment: per-shift cost of each stage of the 10M planes pipeline."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(fn, *args, r_lo=2, r_hi=6):
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

    n = 10_000_000
    plan = get_fft_plan(n, "complex64")
    f0, f1_, f2_ = plan.factors

    rng = np.random.default_rng(0)
    rxr = jax.device_put(jnp.asarray(
        rng.standard_normal(n + 256, dtype=np.float32)))
    rxi = jax.device_put(jnp.asarray(
        rng.standard_normal(n + 256, dtype=np.float32)))
    ccr = jax.device_put(jnp.asarray(
        rng.standard_normal(n, dtype=np.float32)))
    cci = jax.device_put(jnp.asarray(
        rng.standard_normal(n, dtype=np.float32)))

    def make(level):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(rxr, rxi, ccr, cci, salt, n_reps):
            wr_l, wi_l, twr_l, twi_l = plan._mats_planes("bf16")

            def one(s):
                xr = jax.lax.dynamic_slice(rxr, (s,), (n,))
                xi = jax.lax.dynamic_slice(rxi, (s,), (n,))
                pr = (xr * ccr - xi * cci).astype(jnp.bfloat16)
                pi = (xr * cci + xi * ccr).astype(jnp.bfloat16)
                if level == 0:
                    return jnp.sum(pr.astype(jnp.float32)), jnp.sum(
                        pi.astype(jnp.float32))
                ein = functools.partial(
                    jnp.einsum, preferred_element_type=jnp.float32)
                cr = pr.reshape(f0, n // f0)
                ci = pi.reshape(f0, n // f0)
                wr, wi = jnp.asarray(wr_l[0]), jnp.asarray(wi_l[0])
                fr = ein("kn,nm->km", wr, cr) - ein("kn,nm->km", wi, ci)
                fi = ein("kn,nm->km", wr, ci) + ein("kn,nm->km", wi, cr)
                if level == 1:
                    return jnp.sum(fr), jnp.sum(fi)
                twr, twi = jnp.asarray(twr_l[0]), jnp.asarray(twi_l[0])
                gr = (fr * twr - fi * twi).astype(jnp.bfloat16)
                gi = (fr * twi + fi * twr).astype(jnp.bfloat16)
                if level == 2:
                    return jnp.sum(gr.astype(jnp.float32)), jnp.sum(
                        gi.astype(jnp.float32))
                wr1, wi1 = jnp.asarray(wr_l[1]), jnp.asarray(wi_l[1])
                cr = gr.reshape(f0, f1_, f2_)
                ci = gi.reshape(f0, f1_, f2_)
                fr = ein("kn,bnm->bkm", wr1, cr) - ein("kn,bnm->bkm", wi1, ci)
                fi = ein("kn,bnm->bkm", wr1, ci) + ein("kn,bnm->bkm", wi1, cr)
                if level == 3:
                    return jnp.sum(fr), jnp.sum(fi)
                from pydsproutines_tpu.ops.pallas.fft_peak import (
                    stage2_caf_peak_planes)
                tw_last, w_last = plan._peak_consts()
                pmax, inner = stage2_caf_peak_planes(
                    fr.astype(jnp.bfloat16), fi.astype(jnp.bfloat16),
                    tw_last, w_last, f1_, mode="bf16")
                return jnp.max(pmax), jnp.max(inner)

            return jax.lax.map(one, salt + jnp.arange(n_reps))
        return run

    names = ["slice+modulate+bf16", "+stage0 einsum", "+twiddle+cast",
             "+stage1 einsum", "+pallas peak"]
    prev = 0.0
    for lv in range(5):
        t = timed(make(lv), rxr, rxi, ccr, cci)
        print(f"level {lv} {names[lv]:24s}: {t*1e3:7.2f} ms/shift "
              f"(+{(t-prev)*1e3:6.2f})")
        prev = t
