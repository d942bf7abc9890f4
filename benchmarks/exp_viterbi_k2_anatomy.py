"""Chip anatomy of the k_syms=2 batched min-plus Viterbi (14.9 Msym/s —
target >= 50). Isolates: (a) branch-table build alone, (b) min-plus chain
alone on precomputed tables, (c) full batched call.

Run: timeout 3000 python benchmarks/exp_viterbi_k2_anatomy.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bench import rep_differenced
    from pydsproutines_tpu.ops import viterbi as V

    B, nsyms, up = 64, 512, 8
    alphabet = np.array([1.0, -1.0], dtype=np.complex64)
    pret = np.array([[0, 1], [0, 1]], dtype=np.int32)
    pulse = np.full((1, 2 * up), 0.5, dtype=np.complex64)
    omegas = np.array([0.05], dtype=np.float32)
    start = np.array([True, True])
    ps = tuple(map(tuple, pret.tolist()))
    ss = (True, True)
    rng = np.random.default_rng(7)
    y_ri = rng.standard_normal((2, B, nsyms * up), dtype=np.float32)
    d_y = jax.device_put(jnp.asarray(y_ri))

    def scan_reps(fn):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def step(yri, salt, n_reps):
            def body(acc, i):
                yb = jax.lax.complex(
                    yri[0] * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i)),
                    yri[1])
                return acc + fn(yb), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.arange(n_reps, dtype=jnp.float32))
            return acc
        return step

    def tables_only(yb):
        bm_full, bm_short = jax.vmap(
            lambda y: V._code_branch_tables(
                y, jnp.asarray(alphabet), jnp.asarray(pulse),
                jnp.asarray(omegas), up=up, pulselen=2 * up, k_syms=2,
                pathlen=nsyms))(yb)
        return jnp.sum(bm_short[:, 0]) + jnp.sum(bm_full[:, -1])

    def full(yb):
        paths, metrics = V.viterbi_path_acs_batch(
            yb, jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pulse), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=2 * up, k_syms=2, pathlen=nsyms,
            pret_static=ps, start_static=ss)
        return jnp.sum(jnp.min(metrics, axis=1))

    # (b) chain-only: random bm tables as input (no synth/table build)
    codes = 9
    bm_np = rng.standard_normal((nsyms, codes, B), dtype=np.float32) ** 2
    d_bm = jax.device_put(jnp.asarray(bm_np))

    cvec = np.arange(codes)
    tail = cvec // 3
    candc = (np.arange(3)[None, :] * 3 + tail[:, None]).astype(np.int32)
    dnew = cvec % 3
    dq = tail % 3
    legal_state = np.zeros((3, 3), bool)
    for p in range(2):
        legal_state[pret[p] + 1, p + 1] = True
    legc = np.broadcast_to(legal_state[dq[:, None], dnew[:, None]],
                           candc.shape).copy()
    adjc = np.full((codes, codes), np.inf, np.float32)
    rows = np.repeat(cvec, 3)[legc.reshape(-1)]
    cols = candc.reshape(-1)[legc.reshape(-1)]
    adjc[rows, cols] = 0.0

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def chain_only(bm, salt, n_reps):
        def body(acc, i):
            bmp = bm * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i))
            mats = bmp[1:, :, None, :] + jnp.asarray(adjc)[None, :, :, None]
            m0 = bmp[0]
            metrics, seq = V._minplus_chain_batched(mats, m0, candc, legc)
            return acc + jnp.sum(jnp.min(metrics, axis=0)) \
                + jnp.sum(seq[-1, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_reps, dtype=jnp.float32))
        return acc

    for name, step, args in [
            ("a. bm tables only   ", scan_reps(tables_only), (d_y,)),
            ("b. min-plus chain   ", chain_only, (d_bm,)),
            ("c. full batched call", scan_reps(full), (d_y,)),
    ]:
        try:
            dt = rep_differenced(step, *args, max_r_hi=512)
            print(f"{name}: {dt*1e3:7.3f} ms -> "
                  f"{B*nsyms/dt/1e6:7.1f} Msym/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
