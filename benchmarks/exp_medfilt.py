"""Median filter strategies on TPU, n=4M k=129 (current jnp.median path
measured 4.07 s — XLA's row sort is serial-comparator slow on TPU).

  sort    current: jnp.median over (chunk, k) windows (lax.map chunks)
  topk    jax.lax.top_k(windows, (k+1)//2)[-1] per chunk
  radix   32-bit radix select on monotone uint32 keys, windows slab
          materialized once, fori_loop over bits (XLA)
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
            out = fn(*args, np.float32(1e-7 * (salt + rep)), n_reps)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)
    once(r_lo, 0); once(r_hi, 0)
    return (once(r_hi, 1) - once(r_lo, 1)) / (r_hi - r_lo)


def float_keys(x):
    import jax.numpy as jnp
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(i >= 0, u + jnp.uint32(0x80000000), ~u)


def keys_to_float(k):
    import jax.numpy as jnp
    as_pos = k - jnp.uint32(0x80000000)
    neg = ~k
    i = jnp.where(k >= jnp.uint32(0x80000000), as_pos, neg)
    return jax.lax.bitcast_convert_type(i.astype(jnp.uint32), jnp.float32)


def build_windows(xp, nblk, cblk, k):
    """(nblk, cblk, k) windows of xp via shifted reshapes."""
    import jax.numpy as jnp
    w = cblk + k - 1
    rr = -(-w // cblk)
    need = nblk * cblk + rr * cblk
    xpp = jnp.pad(xp, (0, max(0, need - xp.shape[0])))
    parts = [jax.lax.slice(xpp, (i * cblk,), (i * cblk + nblk * cblk,))
             .reshape(nblk, cblk) for i in range(rr)]
    wide = jnp.concatenate(parts, axis=1)[:, :w]        # (nblk, cblk+k-1)
    # W[b, i, j] = wide[b, i + j]: another level of shifted reshape per j
    # block is awkward; use gather-free stack of k static slices instead
    cols = [jax.lax.slice(wide, (0, j), (nblk, j + cblk)) for j in range(k)]
    return jnp.stack(cols, axis=-1)                      # (nblk, cblk, k)


if __name__ == "__main__":
    import jax, jax.numpy as jnp

    n = 4_194_304
    k = 129
    half = k // 2
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal(n, dtype=np.float32)))

    def make_topk(cblk=8192):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(x, eps, n_reps):
            outs = []
            for i in range(n_reps):
                xs = x * (1.0 + eps * (i + 1))
                xp = jnp.pad(xs, (half, half))
                nblk = n // cblk
                W = build_windows(xp, nblk, cblk, k)
                top, _ = jax.lax.top_k(W, half + 1)
                outs.append(jnp.sum(top[..., -1]))
            return jnp.stack(outs)
        return run

    def make_radix(cblk=8192):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(x, eps, n_reps):
            outs = []
            for i in range(n_reps):
                xs = x * (1.0 + eps * (i + 1))
                xp = jnp.pad(xs, (half, half))
                nblk = n // cblk
                W = float_keys(build_windows(xp, nblk, cblk, k))

                def body(b, acc):
                    bit = jnp.uint32(1) << (31 - b)
                    cand = acc | bit
                    # rank of median (0-based) = half; set bit if the count
                    # of keys strictly below cand is <= half (median >= cand)
                    cnt = jnp.sum((W < cand[..., None]).astype(jnp.int32),
                                  axis=-1)
                    return jnp.where(cnt <= half, cand, acc)

                acc = jax.lax.fori_loop(
                    0, 32, body, jnp.zeros((nblk, cblk), jnp.uint32))
                outs.append(jnp.sum(keys_to_float(acc)))
            return jnp.stack(outs)
        return run

    def make_sort(cblk=8192):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def run(x, eps, n_reps):
            outs = []
            for i in range(n_reps):
                xs = x * (1.0 + eps * (i + 1))
                xp = jnp.pad(xs, (half, half))
                nblk = n // cblk
                W = build_windows(xp, nblk, cblk, k)
                med = jnp.median(W, axis=-1)
                outs.append(jnp.sum(med))
            return jnp.stack(outs)
        return run

    # correctness spot check (tiny, CPU-free: same devices)
    import scipy.signal as sps
    xs = np.asarray(x[:4096])
    ref = sps.medfilt(xs, k)
    for name, mk in [("radix", make_radix), ("topk", make_topk)]:
        f = mk(cblk=512)
        out_fn = jax.jit(lambda xx: None)
        # direct mini-run of the core for correctness
        xp = jnp.pad(jnp.asarray(xs), (half, half))
        W = build_windows(xp, 8, 512, k)
        if name == "radix":
            Wk = float_keys(W)
            acc = jnp.zeros((8, 512), jnp.uint32)
            for b in range(32):
                bit = jnp.uint32(1) << (31 - b)
                cand = acc | bit
                cnt = jnp.sum((Wk < cand[..., None]).astype(jnp.int32), -1)
                acc = jnp.where(cnt <= half, cand, acc)
            got = np.asarray(keys_to_float(acc)).reshape(-1)
        else:
            top, _ = jax.lax.top_k(W, half + 1)
            got = np.asarray(top[..., -1]).reshape(-1)
        err = np.max(np.abs(got - ref))
        print(f"{name} correctness max err vs scipy: {err}")
        sys.stdout.flush()

    sel = sys.argv[1:] or ["radix", "topk"]
    for tok in sel:
        mk = {"radix": make_radix, "topk": make_topk, "sort": make_sort}[tok]
        t = timed(mk(), x)
        print(f"{tok:6s}: {t*1e3:8.2f} ms ({n/t/1e9:.3f} GS/s)")
        sys.stdout.flush()
