"""Marginal per-shift cost of the PRODUCTION 10M planes path vs the bare
experiment pipeline (exp_10m_stages3 case 1), to locate harness overhead."""
from __future__ import annotations
import functools, os, sys, time
import numpy as np

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
    once(r_lo, 0); once(r_hi, 0)
    return (once(r_hi, 1) - once(r_lo, 1)) / (r_hi - r_lo)


if __name__ == "__main__":
    import jax, jax.numpy as jnp
    from pydsproutines_tpu.ops.fft import get_fft_plan

    n = 10_000_000
    plan = get_fft_plan(n, "complex64")
    rng = np.random.default_rng(0)
    rxr = jax.device_put(jnp.asarray(rng.standard_normal(n + 512, dtype=np.float32)))
    rxi = jax.device_put(jnp.asarray(rng.standard_normal(n + 512, dtype=np.float32)))
    ccr = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))
    cci = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))

    # (a) production call_peak_planes per shift (mats hoisted, like xcorr.py)
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def prod(rxr, rxi, ccr, cci, salt, n_reps):
        mats = plan._mats_planes("bf16")
        mats = jax.tree_util.tree_map(jnp.asarray, mats)
        rxrb = rxr.astype(jnp.bfloat16); rxib = rxi.astype(jnp.bfloat16)
        ccrb = ccr.astype(jnp.bfloat16); ccib = cci.astype(jnp.bfloat16)

        def one(s):
            xr = jax.lax.dynamic_slice(rxrb, (s,), (n,))
            xi = jax.lax.dynamic_slice(rxib, (s,), (n,))
            pr = xr * ccrb - xi * ccib
            pi = xr * ccib + xi * ccrb
            pmax, ibin = plan.call_peak_planes(pr[None, :], pi[None, :],
                                               mode="bf16", mats=mats)
            return pmax[0], ibin[0]
        return jax.lax.map(one, salt + jnp.arange(n_reps))

    # (b) same but mats NOT hoisted (embedded host constants inside body)
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def prod_const(rxr, rxi, ccr, cci, salt, n_reps):
        rxrb = rxr.astype(jnp.bfloat16); rxib = rxi.astype(jnp.bfloat16)
        ccrb = ccr.astype(jnp.bfloat16); ccib = cci.astype(jnp.bfloat16)

        def one(s):
            xr = jax.lax.dynamic_slice(rxrb, (s,), (n,))
            xi = jax.lax.dynamic_slice(rxib, (s,), (n,))
            pr = xr * ccrb - xi * ccib
            pi = xr * ccib + xi * ccrb
            pmax, ibin = plan.call_peak_planes(pr[None, :], pi[None, :],
                                               mode="bf16")
            return pmax[0], ibin[0]
        return jax.lax.map(one, salt + jnp.arange(n_reps))

    # (c) the full production impl (gather + cumsum + normalization)
    from pydsproutines_tpu.ops.xcorr import _fast_xcorr_impl

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def full(rxr, rxi, ccr, cci, salt, n_reps):
        rx = jax.lax.complex(rxr, rxi)
        cut = jax.lax.complex(ccr, cci)

        def one(i):
            qf2, bins = _fast_xcorr_impl(
                cut, rx, i + jnp.arange(16), n=n, freqsearch=True,
                output_caf=False, abs_result=True, batch_size=16, step=1)
            return jnp.max(qf2), jnp.max(bins)
        return jax.lax.map(one, salt + jnp.arange(n_reps))

    sel = sys.argv[1:] or ["a", "b"]
    for tok in sel:
        if tok == "a":
            t = timed(prod, rxr, rxi, ccr, cci, r_lo=8, r_hi=40)
            print(f"prod call_peak_planes (hoisted mats): {t*1e3:7.2f} ms/shift")
        elif tok == "b":
            t = timed(prod_const, rxr, rxi, ccr, cci, r_lo=8, r_hi=40)
            print(f"prod call_peak_planes (const mats)  : {t*1e3:7.2f} ms/shift")
        elif tok == "c":
            t = timed(full, rxr, rxi, ccr, cci, r_lo=1, r_hi=4)
            print(f"full _fast_xcorr_impl 16-shift sweep: {t*1e3:7.2f} ms/sweep"
                  f" = {t/16*1e3:.2f} ms/shift")
        sys.stdout.flush()
