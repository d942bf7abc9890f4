#!/usr/bin/env python
"""On-chip anatomy of the fused WOLA kernel: where do 1.72 ms go?

Variants (one process, rep-differenced):
  dma     — kernel body = copy tile to out (DMA + write only)
  fold    — DMA + aligned fold, skip IDFT matmul
  matmul  — DMA + IDFT matmul on the raw tile, skip fold
  kern    — full kernel on PREMATERIALIZED interleaved xi, sum(f32 out)
            directly (no plane<->complex conversion epilogue)
  full    — public wola_fused path incl. conversions (the bench shape)
Sweep kb via argv, e.g.  python exp_wola_anatomy.py 2048 1024
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.pallas.wola_fused import wola_fused


def _idft_interleaved(n: int) -> np.ndarray:
    """(2n, 2n) f32: row-permuted conj-DFT matrix as [[Re,Im],[-Im,Re]]
    interleaved 2x2 blocks, so interleaved-complex @ W4 == complex @ Wp.

    Inlined here: this script benchmarks the INTERLEAVED-lane layout
    variant (the one the shipped pair-row kernel replaced), so it needs the
    interleaved matrix the library no longer ships."""
    k = np.arange(n, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), n) / n)
    perm = (-np.arange(n)) % n                       # xq column c -> phase a
    Wp = wconj[perm]
    W4 = np.zeros((2 * n, 2 * n), np.float32)
    W4[0::2, 0::2] = Wp.real
    W4[0::2, 1::2] = Wp.imag
    W4[1::2, 0::2] = -Wp.imag
    W4[1::2, 1::2] = Wp.real
    return W4

N = 8_388_608
DEC = NCH = 64
TAPS = 2048
B = TAPS // NCH
COLS = 2 * NCH
ROWS = N // DEC

rng = np.random.default_rng(2)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h = rng.standard_normal(TAPS).astype(np.float32)
d_h = jax.device_put(jnp.asarray(h))
# prematerialized interleaved input (rows, 2n)
xi_np = np.empty((ROWS, COLS), np.float32)
xi_np[:, 0::2] = x_ri[0].reshape(ROWS, NCH)
xi_np[:, 1::2] = x_ri[1].reshape(ROWS, NCH)
d_xi = jax.device_put(jnp.asarray(xi_np))
d_x = jax.device_put(jnp.asarray(x_ri))


def make_t3():
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(NCH)[None, :]
    idx0 = np.clip(s_i * NCH, 0, TAPS - 1)
    idxc = np.clip((s_i - 1) * NCH + (NCH - c_i), 0, TAPS - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = np.where(valid, h[tap_idx], 0.0).astype(np.float32)
    t2 = np.repeat(T, 2, axis=1)
    nq = (B + 8) // 8
    r_i = np.repeat(np.arange(8), nq)
    q_i = np.tile(np.arange(nq), 8)
    a_i = B - 8 * q_i - r_i
    t3 = np.where(((a_i >= 0) & (a_i <= B))[:, None],
                  t2[np.clip(a_i, 0, B)], 0.0).astype(np.float32)
    return jnp.asarray(t3), nq


T3, NQ = make_t3()
W4 = jnp.asarray(_idft_interleaved(NCH))


def variant_kernel(x_hbm, t3, w4, out, scratch, sems, *, kb, nsteps, mode,
                   prec):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)

    def full_copy(step, slot_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * kb - B, kb + B), :],
            scratch.at[slot_, pl.ds(0, kb + B), :], sems.at[slot_])

    def head_copy(slot_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, kb), :],
            scratch.at[slot_, pl.ds(B, kb), :], sems.at[slot_])

    @pl.when(gi == 0)
    def _():
        scratch[slot, :B, :] = jnp.zeros((B, COLS), jnp.float32)
        scratch[0, kb + B:, :] = jnp.zeros((8, COLS), jnp.float32)
        scratch[1, kb + B:, :] = jnp.zeros((8, COLS), jnp.float32)
        head_copy(slot).start()

    if nsteps > 1:
        @pl.when(gi + 1 < nsteps)
        def _():
            full_copy(gi + 1, nslot).start()

        @pl.when(gi > 0)
        def _():
            full_copy(gi, slot).wait()

    @pl.when(gi == 0)
    def _():
        head_copy(slot).wait()

    xt = scratch[slot]
    if mode == "dma":
        out[...] = xt[B: B + kb, :]
        return
    if mode in ("fold", "kern", "full"):
        acc = jnp.zeros((kb, COLS), jnp.float32)
        for r in range(8):
            u = xt[0: kb + 8, :] * t3[r * NQ]
            for q in range(1, NQ):
                u = u + xt[8 * q: 8 * q + kb + 8, :] * t3[r * NQ + q]
            acc = acc + u[r: r + kb, :]
    else:
        acc = xt[B: B + kb, :]
    if mode == "fold":
        out[...] = acc
        return
    out[...] = jax.lax.dot_general(
        acc, w4[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision={"highest": jax.lax.Precision.HIGHEST,
                   "default": jax.lax.Precision.DEFAULT}[prec])


@functools.partial(jax.jit, static_argnames=("kb", "mode", "prec", "n_reps"))
def step_kernel(xi, salt, n_reps, kb, mode, prec):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nsteps = -(-ROWS // kb)
    outs = []
    for i in range(n_reps):
        xs = xi * (1.0 + 1e-7 * (salt + i))
        out = pl.pallas_call(
            functools.partial(variant_kernel, kb=kb, nsteps=nsteps,
                              mode=mode, prec=prec),
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((kb, COLS), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nsteps * kb, COLS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, kb + B + 8, COLS), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xs, T3, W4)
        outs.append(jnp.sum(out))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_full(xri, salt, n_reps):
    outs = []
    for i in range(n_reps):
        x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
        outs.append(jnp.sum(jnp.abs(wola_fused(d_h, x, DEC, NCH))))
    return jnp.stack(outs)


def run(name, fn, *a):
    dt = rep_differenced(fn, *a, max_r_hi=64)
    print(f"{name:34s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)


kbs = [int(v) for v in (sys.argv[1:] or ["2048"])]
for kb in kbs:
    for mode in ("dma", "fold", "matmul", "kern"):
        run(f"kb={kb} {mode}",
            functools.partial(step_kernel, kb=kb, mode=mode, prec="highest"),
            d_xi)
    run(f"kb={kb} kern-default-prec",
        functools.partial(step_kernel, kb=kb, mode="kern", prec="default"),
        d_xi)
run("full (conversions incl.)", step_full, d_x)
