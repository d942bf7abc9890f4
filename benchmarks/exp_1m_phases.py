#!/usr/bin/env python
"""1M fused-CAF kernel phase isolation (VERDICT round-3 item 7): is the
kernel at its 7.8 ms Karatsuba FLOP bound, or does the VPU epilogue
(t-combines, twiddle, |.|^2, argmax) cost extra passes?

Variants (one process, rep-differenced; same operands as the real kernel):
  mm-only   — matmuls only: stage1 t1/t2/t3 + stage2 s1/s2/s3 consumed by a
              cheap sum (skips combines/twiddle/mag/argmax). The pure MXU
              floor of the shipped 6-pass Karatsuba structure.
  mm+comb   — + t/s combines and the twiddle multiply (VPU elementwise).
  full      — the shipped kernel body (adds mag + argmax reduction).
  full-opt  — full, with the argmax index pass guarded by pl.when(take)
              and the flat-index iota hoisted to a VMEM constant.
  ship      — public fused_freq_scan_xcorr (reference point).
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.pallas.fused_xcorr import (
    FusedXcorrPlan, get_fused_plan, fused_freq_scan_xcorr)

N = 1_000_000
BATCH = 128
NSHIFTS = 128
_INT_MAX = np.int32(2147483647)

rng = np.random.default_rng(0)
rxlen = N + NSHIFTS + 2048
rx_re = jax.device_put(jnp.asarray(
    rng.standard_normal(rxlen, dtype=np.float32)))
rx_im = jax.device_put(jnp.asarray(
    rng.standard_normal(rxlen, dtype=np.float32)))
cc_re_f = jax.device_put(jnp.asarray(
    rng.standard_normal(N, dtype=np.float32)))
cc_im_f = jax.device_put(jnp.asarray(
    rng.standard_normal(N, dtype=np.float32)))

PLAN = get_fused_plan(N, BATCH, 1, "bf16")
assert PLAN.viable
N1, N2, K1T = PLAN.n1, PLAN.n2, PLAN.k1t


def variant_kernel(z_re, z_im, cc_re, cc_im, tw_re, tw_im, w1r, w1i, w1s,
                   w2r, w2i, w2s, flatc, out_max, out_idx, *, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci = pl.program_id(0)
    b = pl.program_id(1)
    n1, n2, k1t = N1, N2, K1T

    w = z_re.shape[2]
    amt = jax.lax.rem(jnp.int32(w) - b, jnp.int32(w))
    zr = pltpu.roll(z_re[0], amt, 1)[:, :n2]
    zi = pltpu.roll(z_im[0], amt, 1)[:, :n2]
    pr = zr * cc_re[:, :] - zi * cc_im[:, :]
    pi = zr * cc_im[:, :] + zi * cc_re[:, :]
    prb = pr.astype(jnp.bfloat16)
    pib = pi.astype(jnp.bfloat16)
    psb = (pr + pi).astype(jnp.bfloat16)

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    best_m = jnp.full((), -1.0, jnp.float32)
    best_i = jnp.full((), _INT_MAX, jnp.int32)
    acc = jnp.zeros((), jnp.float32)
    for tk in range(n1 // k1t):
        rows = slice(tk * k1t, (tk + 1) * k1t)
        t1 = dot(w1r[rows, :], prb)
        t2 = dot(w1i[rows, :], pib)
        t3 = dot(w1s[rows, :], psb)
        if mode == "mm-only":
            # feed stage 2 straight from t1/t2/t3 (wrong numbers, same MXU
            # shape/count — bf16 casts kept so operand dtypes match)
            s1 = dot(t1.astype(jnp.bfloat16), w2r[:, :])
            s2 = dot(t2.astype(jnp.bfloat16), w2i[:, :])
            s3 = dot(t3.astype(jnp.bfloat16), w2s[:, :])
            acc = acc + jnp.sum(s1[:1]) + jnp.sum(s2[:1]) + jnp.sum(s3[:1])
            continue
        f1r = t1 - t2
        f1i = t3 - t1 - t2
        gr = f1r * tw_re[rows, :] - f1i * tw_im[rows, :]
        gi = f1r * tw_im[rows, :] + f1i * tw_re[rows, :]
        s1 = dot(gr.astype(jnp.bfloat16), w2r[:, :])
        s2 = dot(gi.astype(jnp.bfloat16), w2i[:, :])
        s3 = dot((gr + gi).astype(jnp.bfloat16), w2s[:, :])
        rr = s1 - s2
        ri = s3 - s1 - s2
        if mode == "mm+comb":
            acc = acc + jnp.sum(rr[:1]) + jnp.sum(ri[:1])
            continue
        mag = rr * rr + ri * ri
        tmax = jnp.max(mag)
        if mode == "full":
            kk1 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0) \
                + tk * k1t
            kk2 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
            flat = kk1 * n2 + kk2
            tidx = jnp.min(jnp.where(mag >= tmax, flat, _INT_MAX))
            take = tmax > best_m
            best_i = jnp.where(take, tidx, best_i)
            best_m = jnp.where(take, tmax, best_m)
        else:  # full-opt: constant flat indices + guarded index pass
            tidx = jnp.min(jnp.where(mag >= tmax, flatc[rows, :], _INT_MAX))
            take = tmax > best_m
            best_i = jnp.where(take, tidx, best_i)
            best_m = jnp.where(take, tmax, best_m)

    if mode in ("mm-only", "mm+comb"):
        out_max[ci, b] = acc
        out_idx[ci, b] = jnp.int32(0)
    else:
        out_max[ci, b] = best_m
        out_idx[ci, b] = best_i


@functools.partial(jax.jit, static_argnames=("mode", "n_reps"))
def step(rre, rim, ccr, cci, salt, n_reps, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    halo = BATCH - 1
    wcols = -(-(N2 + halo) // 128) * 128
    nchunks = 1
    flatc = (np.arange(N1)[:, None] * N2
             + np.arange(N2)[None, :]).astype(np.int32)

    def build(plane, s0):
        w = jax.lax.dynamic_slice(plane, (s0,), (N1 * N2 + N2,))
        a = jax.lax.slice(w, (0,), (N1 * N2,)).reshape(N1, N2)
        bb = jax.lax.slice(w, (N2,), (N2 + N1 * N2,)).reshape(N1, N2)
        return jnp.concatenate(
            [a, bb[:, :halo],
             jnp.zeros((N1, wcols - N2 - halo), plane.dtype)],
            axis=1)[None]

    outs = []
    for i in range(n_reps):
        s0 = (salt + i) % 8
        z_re = build(rre, s0)
        z_im = build(rim, s0)
        mx, ix = pl.pallas_call(
            functools.partial(variant_kernel, mode=mode),
            grid=(nchunks, BATCH),
            in_specs=[pl.BlockSpec((1, N1, wcols), lambda ci, b: (ci, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=[jax.ShapeDtypeStruct((nchunks, BATCH), jnp.float32),
                       jax.ShapeDtypeStruct((nchunks, BATCH), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=6 * BATCH * (N1 * N1 * N2 + N1 * N2 * N2),
                bytes_accessed=4 * 4 * N1 * wcols, transcendentals=0),
        )(z_re, z_im, ccr.reshape(N1, N2), cci.reshape(N1, N2),
          jnp.asarray(PLAN.tw_re), jnp.asarray(PLAN.tw_im),
          jnp.asarray(PLAN.w1r), jnp.asarray(PLAN.w1i),
          jnp.asarray(PLAN.w1s), jnp.asarray(PLAN.w2r),
          jnp.asarray(PLAN.w2i), jnp.asarray(PLAN.w2s),
          jnp.asarray(flatc))
        outs.append(jnp.max(mx) + jnp.float32(jnp.min(ix)))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_ship(rre, rim, ccr, cci, salt, n_reps):
    outs = []
    for i in range(n_reps):
        cut = jax.lax.complex(ccr * (1.0 + 1e-7 * (salt + i)), cci)
        rxc = jax.lax.complex(rre, rim)
        qf2, bins = fused_freq_scan_xcorr(cut, rxc, 0, NSHIFTS,
                                          batch=BATCH, mode="bf16")
        outs.append(jnp.max(qf2))
    return jnp.stack(outs)


def run(name, fn, *a):
    try:
        dt = rep_differenced(fn, *a, max_r_hi=16)
        # per-BATCH-shift sweep time; scale to the official 128-shift sweep
        print(f"{name:12s} {dt * 1e3:8.3f} ms/sweep  "
              f"{N * NSHIFTS / dt / 1e9:6.2f} Gss/s  "
              f"spread {dt.spread_pct:.1f}%", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


want = sys.argv[1:] or ["mm-only", "mm+comb", "full", "full-opt", "ship"]
for mode in want:
    if mode == "ship":
        run("ship", step_ship, rx_re, rx_im, cc_re_f, cc_im_f)
    else:
        run(mode, functools.partial(step, mode=mode),
            rx_re, rx_im, cc_re_f, cc_im_f)
