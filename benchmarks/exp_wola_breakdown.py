"""Where does the WOLA channelizer spend time on chip?

Levels: (0) phase-matrix build only, (1) +polyphase fold (grouped depthwise
conv), (2) +IDFT matmul, (3) full wola() incl. dtype casts. Run each level
with the rep-differenced harness. Also tries a fold variant formulated as a
blocked-Toeplitz MXU matmul per phase block.
"""
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

    n = 8_388_608
    dec = nch = 64
    taps = 2048
    B = taps // nch
    rng = np.random.default_rng(2)
    xr = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))
    xi = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))
    h = rng.standard_normal(taps).astype(np.float32)
    nprime = n // dec

    k = np.arange(nch, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), nch) / nch)
    wc_r = wconj.real.astype(np.float32)
    wc_i = wconj.imag.astype(np.float32)

    def make(level):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(xr, xi, salt, n_reps):
            def one(s):
                xs_r = xr * (1.0 + 1e-7 * s.astype(jnp.float32))
                xs_i = xi
                # phases[k, a]: reshape trick from _wola_polyphase_fold
                def phase_mat(v):
                    xp = jnp.concatenate([jnp.zeros(nch, v.dtype),
                                          v[: nprime * nch]])
                    xp2 = xp.reshape(nprime + 1, nch)
                    col0 = xp2[1:, 0:1]
                    rest = xp2[:-1, :0:-1]
                    return jnp.concatenate([col0, rest], axis=1)
                pr = phase_mat(xs_r)
                pi_ = phase_mat(xs_i)
                if level == 0:
                    return jnp.sum(pr) + jnp.sum(pi_)
                hk = jnp.asarray(h.reshape(B, nch))
                kernel = jnp.flip(hk, axis=0).T[:, None, :]
                planes = jnp.stack([pr, pi_])                 # (2, T, nch)
                planes = jnp.moveaxis(planes, -1, 1)          # (2, nch, T)
                out = jax.lax.conv_general_dilated(
                    planes, kernel, window_strides=(1,),
                    padding=[(B - 1, 0)], feature_group_count=nch,
                    dimension_numbers=("NCW", "OIW", "NCW"))
                fr = out[0].T                                  # (T, nch)
                fi = out[1].T
                if level == 1:
                    return jnp.sum(fr) + jnp.sum(fi)
                cr = fr @ jnp.asarray(wc_r) - fi @ jnp.asarray(wc_i)
                ci = fr @ jnp.asarray(wc_i) + fi @ jnp.asarray(wc_r)
                if level == 2:
                    return jnp.sum(cr) + jnp.sum(ci)
                return jnp.sum(jnp.abs(jax.lax.complex(cr, ci)))
            return jax.lax.map(one, salt + jnp.arange(n_reps))
        return run

    # fold as blocked-Toeplitz matmul: rows of K output steps per block,
    # each block one (K+B-1, nch)-window einsum against a (B, nch) taps
    # stack -- contraction over b only (per-phase), via as_strided-style
    # shifted stacking of the phase matrix
    def make_matfold(kblk):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(xr, xi, salt, n_reps):
            def one(s):
                xs_r = xr * (1.0 + 1e-7 * s.astype(jnp.float32))
                def phase_mat(v):
                    xp = jnp.concatenate([jnp.zeros(nch, v.dtype),
                                          v[: nprime * nch]])
                    xp2 = xp.reshape(nprime + 1, nch)
                    return jnp.concatenate([xp2[1:, 0:1], xp2[:-1, :0:-1]],
                                           axis=1)
                pr = phase_mat(xs_r)
                pi_ = phase_mat(xi)
                hk = jnp.asarray(h.reshape(B, nch))            # h_a[b]
                nblk = nprime // kblk
                pad = jnp.zeros((B - 1, nch), pr.dtype)

                # per-phase banded matmul: out[a, j, t] = sum_w win[a, j, w]
                # * Ka[a, w, t] with Ka[a, b + t, t] = hk[B-1-b, a] — a
                # BATCHED MXU dot_general over the 64 phases
                w = kblk + B - 1
                t_i, w_i = np.meshgrid(np.arange(kblk), np.arange(w),
                                       indexing="ij")
                b_i = w_i - t_i
                valid = (b_i >= 0) & (b_i < B)
                bsel = np.clip(B - 1 - b_i, 0, B - 1)          # (kblk, w)
                Ka = jnp.where(jnp.asarray(valid)[..., None],
                               hk[jnp.asarray(bsel)], 0.0)     # (kblk, w, nch)
                Ka = jnp.moveaxis(Ka, -1, 0)                   # (nch, kblk, w)

                def fold(p):
                    rr = -(-w // kblk)
                    padr = jnp.zeros((rr * kblk, nch), p.dtype)
                    pp = jnp.concatenate([pad, p, padr])       # right headroom
                    parts = [jax.lax.slice(
                        pp, (i * kblk, 0), (i * kblk + nblk * kblk, nch))
                        .reshape(nblk, kblk, nch) for i in range(rr)]
                    win = jnp.concatenate(parts, axis=1)[:, :w]  # (nblk,w,nch)
                    win_a = jnp.moveaxis(win, -1, 0)             # (nch,nblk,w)
                    out = jnp.einsum("anw,atw->ant", win_a, Ka)  # (nch,nblk,k)
                    return jnp.moveaxis(out, 0, -1).reshape(nprime, nch)
                fr = fold(pr)
                fi = fold(pi_)
                cr = fr @ jnp.asarray(wc_r) - fi @ jnp.asarray(wc_i)
                ci = fr @ jnp.asarray(wc_i) + fi @ jnp.asarray(wc_r)
                return jnp.sum(cr) + jnp.sum(ci)
            return jax.lax.map(one, salt + jnp.arange(n_reps))
        return run

    names = {0: "phase matrix", 1: "+depthwise fold", 2: "+idft matmul",
             3: "full wola"}
    sel = sys.argv[1:] or ["0", "1", "2", "3", "m"]
    for tok in sel:
        if tok == "m":
            t = timed(make_matfold(512), xr, xi)
            print(f"matfold(512)+idft     : {t*1e3:7.2f} ms "
                  f"({n/t/1e9:5.2f} GS/s)")
        else:
            lv = int(tok)
            t = timed(make(lv), xr, xi)
            print(f"level {lv} {names[lv]:16s}: {t*1e3:7.2f} ms "
                  f"({n/t/1e9:5.2f} GS/s)")
        sys.stdout.flush()
