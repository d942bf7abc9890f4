"""10M per-shift pipeline variants: twiddle factorization, shift batching,
alternative factorizations.

The stage-0 twiddle of an n = f0*rest plan is TW[k, j] = exp(-2j*pi*k*j/n) —
a full-size (f0, rest) matrix whose HBM read costs ~40 MB/shift at 10M in
bf16. Splitting j = q*f2 + r factors it EXACTLY:

    TW[k, q*f2 + r] = exp(-2j*pi*k*q*f2/n) * exp(-2j*pi*k*r/n)
                    = A[k, q] * B[k, r]

with A (f0, f1) and B (f0, f2) tiny — the twiddle becomes two broadcast
multiplies fused into the stage-1 elementwise epilogue, no big constant read.
"""
from __future__ import annotations
import functools, os, sys, time
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
    once(r_lo, 0); once(r_hi, 0)
    return (once(r_hi, 1) - once(r_lo, 1)) / (r_hi - r_lo)


if __name__ == "__main__":
    import jax, jax.numpy as jnp
    from pydsproutines_tpu.ops.fft import FourStepFFT, get_fft_plan
    from pydsproutines_tpu.ops.pallas.fft_peak import stage2_caf_peak_planes

    n = 10_000_000
    rng = np.random.default_rng(0)
    rxr = jax.device_put(jnp.asarray(rng.standard_normal(n + 256, dtype=np.float32)))
    rxi = jax.device_put(jnp.asarray(rng.standard_normal(n + 256, dtype=np.float32)))
    ccr = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))
    cci = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))

    def pipeline(factors, fold_tw: bool, B: int):
        """Current planes pipeline at the given factorization, optionally
        with the factored twiddle, batching B shifts per map step."""
        plan = FourStepFFT(n, factors=list(factors))
        f0, f1_, f2_ = factors
        tw_last, w_last = plan._peak_consts()

        # stage matrices as planes (host consts are fine at these sizes
        # except the (f0, rest) stage-0 twiddle when fold_tw=False)
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
        w0 = plan_stage_w(f0)
        w1 = plan_stage_w(f1_)
        w0r, w0i = w0.real.astype(bf16), w0.imag.astype(bf16)
        w1r, w1i = w1.real.astype(bf16), w1.imag.astype(bf16)
        if fold_tw:
            k = np.arange(f0, dtype=np.float64)
            q = np.arange(f1_, dtype=np.float64)
            r = np.arange(f2_, dtype=np.float64)
            A = np.exp(-2j * np.pi * np.mod(np.outer(k, q * f2_), n) / n)
            Bm = np.exp(-2j * np.pi * np.mod(np.outer(k, r), n) / n)
            Ar, Ai = A.real.astype(np.float32), A.imag.astype(np.float32)
            Br, Bi = Bm.real.astype(np.float32), Bm.imag.astype(np.float32)
        else:
            rest = f1_ * f2_
            kk = np.arange(f0, dtype=np.float64)
            jj = np.arange(rest, dtype=np.float64)
            tw = np.exp(-2j * np.pi * np.mod(np.outer(kk, jj), n) / n)
            twr, twi = tw.real.astype(bf16), tw.imag.astype(bf16)
        # stage-1 twiddle (f1_, f2_) small either way
        m1 = f1_ * f2_
        k1 = np.arange(f1_, dtype=np.float64)
        rr_ = np.arange(f2_, dtype=np.float64)
        tw1 = np.exp(-2j * np.pi * np.mod(np.outer(k1, rr_), m1) / m1)
        tw1r, tw1i = tw1.real.astype(np.float32), tw1.imag.astype(np.float32)

        ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(rxr, rxi, ccr, cci, salt, n_reps):
            rxrb = rxr.astype(jnp.bfloat16); rxib = rxi.astype(jnp.bfloat16)
            ccrb = ccr.astype(jnp.bfloat16); ccib = cci.astype(jnp.bfloat16)

            def one(s0):
                def slice_mod(s):
                    xr = jax.lax.dynamic_slice(rxrb, (s,), (n,))
                    xi = jax.lax.dynamic_slice(rxib, (s,), (n,))
                    pr = xr * ccrb - xi * ccib
                    pi = xr * ccib + xi * ccrb
                    return pr, pi
                prs, pis = jax.vmap(slice_mod)(s0 + jnp.arange(B))
                cr = prs.reshape(B, f0, f1_ * f2_)
                ci = pis.reshape(B, f0, f1_ * f2_)
                # stage 0
                fr = ein("kn,bnm->bkm", jnp.asarray(w0r), cr) \
                    - ein("kn,bnm->bkm", jnp.asarray(w0i), ci)
                fi = ein("kn,bnm->bkm", jnp.asarray(w0r), ci) \
                    + ein("kn,bnm->bkm", jnp.asarray(w0i), cr)
                if fold_tw:
                    fr4 = fr.reshape(B, f0, f1_, f2_)
                    fi4 = fi.reshape(B, f0, f1_, f2_)
                    ar = jnp.asarray(Ar)[None, :, :, None]
                    ai = jnp.asarray(Ai)[None, :, :, None]
                    br = jnp.asarray(Br)[None, :, None, :]
                    bi = jnp.asarray(Bi)[None, :, None, :]
                    twr4 = ar * br - ai * bi
                    twi4 = ar * bi + ai * br
                    gr = (fr4 * twr4 - fi4 * twi4).astype(jnp.bfloat16)
                    gi = (fr4 * twi4 + fi4 * twr4).astype(jnp.bfloat16)
                else:
                    twrj = jnp.asarray(twr).astype(jnp.float32)
                    twij = jnp.asarray(twi).astype(jnp.float32)
                    gr = (fr * twrj - fi * twij).astype(jnp.bfloat16) \
                        .reshape(B, f0, f1_, f2_)
                    gi = (fr * twij + fi * twrj).astype(jnp.bfloat16) \
                        .reshape(B, f0, f1_, f2_)
                # stage 1
                hr = ein("kn,bcnm->bckm", jnp.asarray(w1r), gr) \
                    - ein("kn,bcnm->bckm", jnp.asarray(w1i), gi)
                hi = ein("kn,bcnm->bckm", jnp.asarray(w1r), gi) \
                    + ein("kn,bcnm->bckm", jnp.asarray(w1i), gr)
                pmax, inner = stage2_caf_peak_planes(
                    hr.astype(jnp.bfloat16).reshape(-1, f1_, f2_),
                    hi.astype(jnp.bfloat16).reshape(-1, f1_, f2_),
                    tw_last, w_last, f1_, mode="bf16")
                return jnp.max(pmax.reshape(B, -1), axis=1)

            return jax.lax.map(one, salt + jnp.arange(n_reps) * B)
        return run

    def plan_stage_w(f):
        k = np.arange(f, dtype=np.float64)
        return np.exp(-2j * np.pi * np.mod(np.outer(k, k), f) / f)

    cases = [
        ("current [200,200,250] B=1 tw-mat", (200, 200, 250), False, 1),
        ("folded tw B=1", (200, 200, 250), True, 1),
        ("folded tw B=2", (200, 200, 250), True, 2),
        ("folded tw B=4", (200, 200, 250), True, 4),
        ("folded tw [625,125,128] B=2", (625, 125, 128), True, 2),
        ("folded tw [500,125,160] B=2", (500, 125, 160), True, 2),
        ("folded tw [320,250,125] B=2", (320, 250, 125), True, 2),
    ]
    sel = [int(a) for a in sys.argv[1:]] or list(range(len(cases)))
    for idx in sel:
        name, factors, fold, B = cases[idx]
        try:
            run = pipeline(factors, fold, B)
            t = timed(run, rxr, rxi, ccr, cci, r_lo=1, r_hi=3)
            per_shift = t / B
            print(f"{name:38s}: {per_shift*1e3:7.2f} ms/shift "
                  f"({n/per_shift/1e9:5.1f} Gss/s eqv x128)")
        except Exception as e:
            print(f"{name:38s}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()
