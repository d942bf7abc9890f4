"""Pallas kernel: fused final-FFT-stage + |.|^2 + per-row argmax (CAF peak).

The freq-scanning xcorr peak search (reference fastXcorr,
/root/reference/xcorrRoutines.py:460,519-531; GPU variant cp_fastXcorr :29
with the fused abs-argmax kernel custom_kernels/argmax.cu:94) only needs the
*location and magnitude* of the spectrum maximum per shift — never the
spectrum itself. The four-step matmul FFT (ops/fft.py) computes that spectrum
as stage1-matmul -> twiddle -> stage2-matmul; letting XLA materialize the
stage-2 output costs a full HBM round trip of the (batch, N) spectrum plus a
separate magnitude+argmax pass (measured ~15 ms of a 22 ms 128x1M sweep on
v5e).

This kernel fuses twiddle * stage2-matmul * |.|^2 * row-argmax: each grid
step loads one (K1T, J) tile of the stage-1 output, applies the twiddle
(VPU), runs the (K1T, J) @ (J, K2) DFT matmul on the MXU, and reduces to a
per-(k1-row) (max, argmax-k2) pair in VMEM — the (batch, N) spectrum never
touches HBM. True bin index for permuted position (k1, k2) is k1 + N1*k2
(ops/fft.py derivation), reconstructed by the wrapper after a tiny XLA
argmax over the (batch, K1) row winners.

Precision modes for the MXU stages (measured on v5e, 1M-point DFT):
  "bf16"    1 pass / real-matmul, spectrum rel err ~1e-2 — peak-search grade
  "bf16x3"  3-pass error-compensated split, rel err ~1e-5 — parity grade
  "f32"     6-pass (Precision.HIGHEST), rel err ~5e-7 — reference grade
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# VMEM working-set budget for tile selection (bytes). The Mosaic scoped
# limit is raised to 2x this via CompilerParams (v5e has headroom above the
# 16 MB default); the budget keeps estimated buffers at half that.
_VMEM_BUDGET = 28 * 1024 * 1024


def _split_bf16(x: jnp.ndarray):
    """Error-compensated bf16 split: x ~= hi + lo with hi = bf16(x)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(f1r, f1i, twr, twi, w2r_hbm, w2i_hbm, w2r_lo_hbm, w2i_lo_hbm,
            out_max, out_idx, w2r, w2i, w2r_lo, w2i_lo, sems, *, mode: str):
    """One (K1T, J) row tile: g = f1*tw; r2 = g @ W2; rowwise max/argmax.

    f1r/f1i: (1, K1T, J) stage-1 planes (streamed VMEM blocks).
    twr/twi: (K1T, J) twiddle planes (streamed VMEM blocks).
    w2*_hbm: (J, K2) stage-2 DFT matrix planes left in HBM (bf16 for
    "bf16"/"bf16x3", f32 for "f32"; *_lo only for "bf16x3", else (1,1)
    dummies) — DMA'd ONCE into persistent VMEM scratch w2r/w2i/w2*_lo on the
    first grid step, avoiding per-step double-buffering of the multi-MB
    matrix. out_max/out_idx: (1, 1, K1T).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        refs = [(w2r_hbm, w2r, 0), (w2i_hbm, w2i, 1)]
        if mode == "bf16x3":
            refs += [(w2r_lo_hbm, w2r_lo, 2), (w2i_lo_hbm, w2i_lo, 3)]
        copies = [pltpu.make_async_copy(src, dst, sems.at[i])
                  for src, dst, i in refs]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    # f1 planes may arrive bf16 (the multi-stage planes path stores bf16
    # intermediates); upcast for the f32 VPU twiddle multiply
    f1r0 = f1r[0].astype(jnp.float32)
    f1i0 = f1i[0].astype(jnp.float32)
    gr = f1r0 * twr[:] - f1i0 * twi[:]
    gi = f1r0 * twi[:] + f1i0 * twr[:]

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if mode == "f32":
        dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        rr = dot32(gr, w2r[:]) - dot32(gi, w2i[:])
        ri = dot32(gr, w2i[:]) + dot32(gi, w2r[:])
    elif mode == "bf16x3":
        gr_hi, gr_lo = _split_bf16(gr)
        gi_hi, gi_lo = _split_bf16(gi)

        def mm(xhi, xlo, whi, wlo):
            # (xhi+xlo)@(whi+wlo) ~= xhi@whi + xhi@wlo + xlo@whi
            return (dot(xhi, whi) + dot(xhi, wlo)) + dot(xlo, whi)

        rr = mm(gr_hi, gr_lo, w2r[:], w2r_lo[:]) \
            - mm(gi_hi, gi_lo, w2i[:], w2i_lo[:])
        ri = mm(gr_hi, gr_lo, w2i[:], w2i_lo[:]) \
            + mm(gi_hi, gi_lo, w2r[:], w2r_lo[:])
    else:  # "bf16"
        grb = gr.astype(jnp.bfloat16)
        gib = gi.astype(jnp.bfloat16)
        rr = dot(grb, w2r[:]) - dot(gib, w2i[:])
        ri = dot(grb, w2i[:]) + dot(gib, w2r[:])

    mag = rr * rr + ri * ri                       # (K1T, K2)
    out_max[0, 0, :] = jnp.max(mag, axis=-1)
    out_idx[0, 0, :] = jnp.argmax(mag, axis=-1).astype(jnp.int32)


def pick_row_tile(k1: int, j: int, k2: int, mode: str) -> int | None:
    """Largest multiple-of-8 divisor of k1 whose working set fits the VMEM
    budget next to the (J, K2) stage matrix; None if none fits."""
    wbytes = 2 if mode in ("bf16", "bf16x3") else 4
    nw = 4 if mode == "bf16x3" else 2
    fixed = j * k2 * wbytes * nw          # w2 scratch, single-buffered
    if fixed > _VMEM_BUDGET:
        return None
    # row-tile offsets must stay 8-aligned (f32 sublanes), so tiles are
    # multiple-of-8 divisors — or the whole K1 axis as one tile (offset 0)
    divs = sorted({d for d in range(8, k1 + 1, 8) if k1 % d == 0} | {k1})
    for d in reversed(divs):
        # double-buffered f1 + tw blocks, plus g/r2/mag working tiles
        blocks = (d * j * 4) * 2 * 2 * 2
        work = d * j * 4 * 2 + d * k2 * 4 * 3
        if fixed + blocks + work <= _VMEM_BUDGET:
            return d
    return None


@functools.partial(jax.jit, static_argnames=("k1t", "mode", "interpret"))
def _stage2_peak_pallas(f1r, f1i, twr, twi, w2r, w2i, w2r_lo, w2i_lo, *,
                        k1t: int, mode: str, interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k1, j = f1r.shape
    k2 = w2r.shape[1]
    t = k1 // k1t

    flops = 8 * b * k1 * j * k2 * (3 if mode == "bf16x3" else 1)
    wdt = w2r.dtype
    lodt = w2r_lo.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        scratch_shapes=[
            pltpu.VMEM(w2r.shape, wdt),
            pltpu.VMEM(w2i.shape, wdt),
            pltpu.VMEM(w2r_lo.shape, lodt),
            pltpu.VMEM(w2i_lo.shape, lodt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        # t outer / b inner: the (t-indexed) twiddle block stays resident
        # across the b sweep, so it streams T times, not T*B times
        grid=(t, b),
        in_specs=[
            pl.BlockSpec((1, k1t, j), lambda ti, bi: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1t, j), lambda ti, bi: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1t, j), lambda ti, bi: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1t, j), lambda ti, bi: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # w2 planes stay in HBM,
            pl.BlockSpec(memory_space=pl.ANY),    # DMA'd once to scratch
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # (1, 1, k1t) blocks: the trailing two block dims equal the
            # array's, satisfying the TPU (8, 128)-alignment rule
            pl.BlockSpec((1, 1, k1t), lambda ti, bi: (bi * t + ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k1t), lambda ti, bi: (bi * t + ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_max, out_idx = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=[jax.ShapeDtypeStruct((b * t, 1, k1t), jnp.float32),
                   jax.ShapeDtypeStruct((b * t, 1, k1t), jnp.int32)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * f1r.size * 4 + 2 * twr.size * 4
            + 2 * w2r.size * (2 if mode != "f32" else 4),
            transcendentals=0),
        interpret=interpret,
    )(f1r, f1i, twr, twi, w2r, w2i, w2r_lo, w2i_lo)
    # (B*T, K1T) row-major == (B, K1)
    return out_max.reshape(b, k1), out_idx.reshape(b, k1)


def stage2_caf_peak(f1: jnp.ndarray, tw: np.ndarray, w2: np.ndarray,
                    n1: int, mode: str = "bf16", k1t: int | None = None,
                    interpret: bool = False):
    """Fused twiddle+stage2+magnitude+argmax over the four-step FFT's
    stage-1 output.

    f1: (B, K1, J) complex stage-1 result for a batch of B transforms.
    tw: (K1, J) complex twiddle (host constant). w2: (K2, J) stage-2 DFT
    matrix as built by FourStepFFT (host constant; contracted over J).
    Returns (peak_mag_sq (B,), true_bin (B,) int32) per transform, matching
    jnp.argmax(|fft(x)|**2) semantics (first-occurrence ties in the permuted
    k1-major order, identical to FourStepFFT.call_permuted peak searches).
    """
    return stage2_caf_peak_planes(
        f1.real.astype(jnp.float32), f1.imag.astype(jnp.float32),
        tw, w2, n1, mode=mode, k1t=k1t, interpret=interpret)


def stage2_caf_peak_planes(f1r: jnp.ndarray, f1i: jnp.ndarray,
                           tw: np.ndarray, w2: np.ndarray, n1: int,
                           mode: str = "bf16", k1t: int | None = None,
                           interpret: bool = False):
    """As stage2_caf_peak but over separate (B, K1, J) re/im planes (float32
    or bfloat16 — the layout Pallas/planes producers hand over directly;
    bf16 planes are upcast in-kernel for the twiddle multiply)."""
    b, k1, j = f1r.shape
    w2t = np.ascontiguousarray(np.asarray(w2).T)       # (J, K2)
    k2 = w2t.shape[1]
    if k1t is None:
        k1t = pick_row_tile(k1, j, k2, mode)
    if k1t is None:
        raise ValueError(f"no viable row tile for K1={k1}, J={j}, K2={k2}")

    twr = np.ascontiguousarray(np.asarray(tw).real.astype(np.float32))
    twi = np.ascontiguousarray(np.asarray(tw).imag.astype(np.float32))
    import ml_dtypes
    bf16 = np.dtype(ml_dtypes.bfloat16)
    if mode == "f32":
        w2r = w2t.real.astype(np.float32)
        w2i = w2t.imag.astype(np.float32)
        w2r_lo = w2i_lo = np.zeros((1, 1), bf16)
    else:
        w2r64 = w2t.real.astype(np.float64)
        w2i64 = w2t.imag.astype(np.float64)
        w2r = w2r64.astype(bf16)
        w2i = w2i64.astype(bf16)
        if mode == "bf16x3":
            w2r_lo = (w2r64 - w2r.astype(np.float64)).astype(bf16)
            w2i_lo = (w2i64 - w2i.astype(np.float64)).astype(bf16)
        else:
            w2r_lo = w2i_lo = np.zeros((1, 1), bf16)

    out_max, out_idx = _stage2_peak_pallas(
        f1r, f1i, jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(w2r), jnp.asarray(w2i), w2r_lo, w2i_lo,
        k1t=int(k1t), mode=mode, interpret=interpret)

    # winner across k1 rows: first occurrence = lowest k1 then lowest k2,
    # matching argmax over the permuted k1-major flattening
    k1_star = jnp.argmax(out_max, axis=-1)
    pmax = jnp.take_along_axis(out_max, k1_star[:, None], axis=-1)[:, 0]
    k2_star = jnp.take_along_axis(out_idx, k1_star[:, None], axis=-1)[:, 0]
    true_bin = k1_star.astype(jnp.int32) + np.int32(n1) * k2_star
    return pmax, true_bin
