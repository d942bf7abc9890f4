"""Fully-fused WOLA channelizer Pallas kernel (N == Dec path).

Reference semantics: the threaded WOLA C DLL fold+IFFT
(/root/reference/multiChannelWola.c:79-101) — here fused into ONE kernel so
the 8M-sample channelize is a single HBM read + single HBM write.

Design (v5e): the complex64 input is BITCAST to interleaved f32 lanes
(rows, 2N) — lane 2c is Re(channel-column c of xq = x.reshape(rows, N)),
lane 2c+1 is Im — a free reinterpret, no copy. Per kb-row grid step:

1. DMA rows [g*kb - B, g*kb + kb) into VMEM (double-buffered; step 0 zeroes
   the B-row history instead — x is implicitly zero before index 0).
2. Polyphase fold on the VPU: g[t, l] = sum_s T2[s, l] * xt[B - s + t, l],
   B+1 static sublane-shifted FMAs. T2 carries the xq-column-order taps
   (the a <-> (N-a)%N phase permutation is absorbed downstream, exactly as
   ops/wola._wola_fold_matmul), duplicated per interleaved lane pair, with
   the c == 0 column's one-row alignment offset folded into the shift index.
3. IDFT as ONE real (kb, 2N) @ (2N, 2N) MXU matmul: W4 interleaves the
   row-permuted conjugate DFT matrix as [[Re, Im], [-Im, Re]] 2x2 lane
   blocks, so complex multiply-accumulate happens inside a single full-width
   f32 matmul and the output stays interleaved.

The (rows, 2N) f32 output bitcasts straight back to (rows, N) complex64 —
again free. Measured HBM traffic is therefore the 2-pass minimum; the fold
(VPU) and IDFT (MXU) overlap the DMA stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _idft_interleaved(n: int) -> np.ndarray:
    """(2n, 2n) f32: row-permuted conj-DFT matrix as [[Re,Im],[-Im,Re]]
    interleaved 2x2 blocks, so interleaved-complex @ W4 == complex @ Wp."""
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


def wola_fused_viable(n_ch: int, dec: int, taps: int, rows: int,
                      dtype) -> bool:
    if n_ch != dec:
        return False
    if (2 * n_ch) % 128 != 0 or n_ch > 512:
        return False                                 # lane tiling
    B = taps // n_ch
    if B % 8 != 0 or B > 256:
        return False                                 # sublane-aligned DMA
    if rows < 2048:
        return False                                 # too small to matter
    return jnp.dtype(dtype) == jnp.complex64


def _pick_kb(n: int, B: int) -> int:
    # ~1 MB per scratch slot; kb multiple of 8 (and of B's alignment)
    kb = max(256, (1 << 20) // (2 * n * 4))
    kb = min(kb, 2048)
    return (kb // 8) * 8


def _kernel(x_hbm, t3, w4, out, scratch, sems, *, kb: int, B: int,
            cols: int, nsteps: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)

    def full_copy(step, slot_):
        # rows [step*kb - B, step*kb + kb); valid for step >= 1
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * kb - B, kb + B), :],
            scratch.at[slot_, pl.ds(0, kb + B), :], sems.at[slot_])

    def head_copy(slot_):
        # step 0: history rows are implicit zeros
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, kb), :],
            scratch.at[slot_, pl.ds(B, kb), :], sems.at[slot_])

    @pl.when(gi == 0)
    def _():
        scratch[slot, :B, :] = jnp.zeros((B, cols), jnp.float32)
        # the 8 over-read rows are never DMA'd: uninitialized VMEM there
        # would poison zero-tap FMAs (0 * NaN) — zero them once per slot
        scratch[0, kb + B:, :] = jnp.zeros((8, cols), jnp.float32)
        scratch[1, kb + B:, :] = jnp.zeros((8, cols), jnp.float32)
        head_copy(slot).start()

    # nsteps is a PYTHON static: at nsteps == 1 the (kb+B)-row descriptor
    # would not even fit the operand shape at trace time, so the full-copy
    # branches must not be constructed at all
    if nsteps > 1:
        @pl.when(gi + 1 < nsteps)
        def _():
            full_copy(gi + 1, nslot).start()

        # waits must mirror the started copy exactly (byte counts differ)
        @pl.when(gi > 0)
        def _():
            full_copy(gi, slot).wait()

    @pl.when(gi == 0)
    def _():
        head_copy(slot).wait()

    # Aligned-fold regrouping: a raw fold sum_s T2[s] * xt[B-s+t] issues
    # B+1 sublane-UNALIGNED slice-FMAs — Mosaic realigns each with
    # cross-vreg shuffles and the fold runs ~2x the pure-FMA floor
    # (measured 2.08 ms/8M, slower than the XLA path). Substituting
    # a = B - s = 8q + r gives acc[t] = sum_r u_r[t + r] with
    # u_r[t'] = sum_q t3[r, q] * xt[t' + 8q]: the q-slices are 8-ALIGNED
    # (free vreg addressing); only the 8 final accumulate-adds are shifted.
    # t3 re-indexes the fold taps as [r*nq + q] -> T2[B - 8q - r] (zeros
    # where out of range). The scratch tile carries 8 extra rows so the
    # widest (q, t') slice stays in bounds; those rows are never DMA'd and
    # any values they contribute land only in u rows >= kb, which the
    # acc slice discards.
    xt = scratch[slot]                               # (kb+B+8, cols)
    nq = (B + 8) // 8
    acc = jnp.zeros((kb, cols), jnp.float32)
    for r in range(8):
        u = xt[0: kb + 8, :] * t3[r * nq]
        for q in range(1, nq):
            u = u + xt[8 * q: 8 * q + kb + 8, :] * t3[r * nq + q]
        acc = acc + u[r: r + kb, :]
    out[...] = jax.lax.dot_general(
        acc, w4[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("dec", "n", "interpret"))
def wola_fused(f_tap: jnp.ndarray, x: jnp.ndarray, dec: int, n: int,
               interpret: bool = False) -> jnp.ndarray:
    """Fused-channelizer entry: complex64 x, n == dec. Returns
    (len(x)//dec, n) complex64 identical to ops.wola.wola()."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n == dec
    taps = f_tap.shape[-1]
    B = taps // n
    rows = x.shape[-1] // dec
    cols = 2 * n
    kb = _pick_kb(n, B)
    nsteps = -(-rows // kb)

    # Fold tap table T[s, c]: g[k, c] = sum_s T[s, c] * xq[k - s, c] with
    #   T[s, 0] = h[s*n] (s < B);  T[s, c>0] = h[(s-1)*n + n - c] (s >= 1)
    # — xq-column order (phase permutation absorbed by the IDFT row perm),
    # the c == 0 one-row alignment offset folded into the shift index. Built
    # with a static-index gather so traced taps also work (same trick as
    # _wola_fold_matmul).
    h = jnp.real(f_tap).astype(jnp.float32)
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(n)[None, :]
    idx0 = np.clip(s_i * n, 0, taps - 1)
    idxc = np.clip((s_i - 1) * n + (n - c_i), 0, taps - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = jnp.where(jnp.asarray(valid), h[jnp.asarray(tap_idx)], 0.0)
    t2 = jnp.repeat(T, 2, axis=1)                    # (B+1, cols)
    # aligned-fold tap table: t3[r*nq + q] = t2[B - 8q - r] (zeros outside)
    nq = (B + 8) // 8
    r_i = np.repeat(np.arange(8), nq)
    q_i = np.tile(np.arange(nq), 8)
    a_i = B - 8 * q_i - r_i
    t3 = jnp.where(jnp.asarray((a_i >= 0) & (a_i <= B))[:, None],
                   t2[jnp.asarray(np.clip(a_i, 0, B))], 0.0)
    w4 = jnp.asarray(_idft_interleaved(n))           # (cols, cols)

    xq = x[: rows * n].reshape(rows, n)
    # interleaved f32 lanes: 2c = Re, 2c+1 = Im. An explicit stack (rather
    # than a bitcast view) so XLA can fuse it with the producer — when the
    # caller builds x from real planes inside the same jit, no intermediate
    # complex array is ever materialized.
    xi = jnp.stack([jnp.real(xq).astype(jnp.float32),
                    jnp.imag(xq).astype(jnp.float32)],
                   axis=-1).reshape(rows, cols)
    pad_rows = nsteps * kb - rows
    if pad_rows:
        xi = jnp.pad(xi, ((0, pad_rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, kb=kb, B=B, cols=cols, nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((kb, cols), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps * kb, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, kb + B + 8, cols), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * kb * cols * cols
            + 2 * nsteps * kb * cols * (B + 1),
            transcendentals=0,
            bytes_accessed=4 * xi.size + 4 * nsteps * kb * cols),
        interpret=interpret,
    )(xi, t3, w4)
    o = out[:rows].reshape(rows, n, 2)
    return jax.lax.complex(o[..., 0], o[..., 1])
