"""Fused three-stage CAF peak search for big composite windows (e.g. 10M).

Reference semantics: fastXcorr freq-scan peak search at the 10M-sample
"north star" geometry (/root/reference/xcorrRoutines.py:460,519-531;
/root/reference/benchmarks/README.md:21-23). The reference GPU path batches
window slices through cuFFT and fuses only the final abs-argmax
(custom_kernels/argmax.cu:94).

Why this kernel exists: at n ~ 1e7 the single-kernel two-factor pipeline
(ops/pallas/fused_xcorr.py) cannot fit its (n1, n1) stage matrices in VMEM
(n1 ~ 3163 -> 58 MB for one bf16 matrix triple), so rounds 1-4 ran the
multi-stage XLA "planes" formulation instead — whose inter-stage
intermediates round-trip HBM (~480 MB of traffic per shift, measured
1.24 ms/shift = 8.06 Gss/s official for four rounds).

TPU-first redesign: factor n = f0*f1*f2 with f2 a multiple of 128 (exact
lane tiling, no relayouts anywhere) and run TWO Pallas kernels per shift:

  kernel A (grid over the middle digit q1 = n1): for each q1-strip of the
    (f0, f1, f2) window view, modulate by conj(cutout) (VPU), contract the
    leading digit on the MXU ((f0, f0) @ (f0, f2) Karatsuba bf16), and
    write the (f0, f2) result to a bf16 HBM scratch laid out (f1, f0, f2)
    — i.e. ALREADY TRANSPOSED for kernel B, so neither kernel ever
    reshapes or relayouts in VMEM (Mosaic cannot split/merge lane dims
    in-kernel; ROADMAP round-4 Mosaic findings).

  kernel B (grid over the first output digit k0): reads the (f1, f2)
    scratch slice for k0 (a strided block DMA), folds the stage-1 twiddle's
    A1[k0, n1] digit plane into a per-k0 stage-2 matrix (VPU build of
    (f1, f1) — the twiddle matrix is never materialized), contracts n1 on
    the MXU, applies the combined A2[k0, n2] * TW2[k1, n2] twiddle (VPU),
    contracts n2 against the (f2, f2) stage-3 matrix, and reduces
    |.|^2 -> (max, argmax) in VMEM. Only (f0,) scalars leave the kernel.

  Twiddle algebra (n = n0*f1*f2 + n1*f2 + n2, k = k0 + f0*k1 + f0*f1*k2):
    stage-1 twiddle W_N^{k0(n1 f2 + n2)} = A1[k0,n1] * A2[k0,n2] with
    A1[k0,n1] = exp(-2i pi k0 n1/(f0 f1)), A2[k0,n2] = exp(-2i pi k0 n2/N).
    A1 commutes into stage 2's matrix (it depends only on (k0, n1));
    A2 commutes past stage 2 (it is n1-independent) and merges with
    stage 2's own twiddle TW2[k1,n2] = exp(-2i pi k1 n2/(f1 f2)).

HBM traffic per shift (n = 1e7, bf16): window slice ~40 MB + kernel A
reads 40 (rx strips) + 40 (template) and writes 40 (scratch) + kernel B
reads 40 = ~200 MB vs ~480 MB for the XLA planes path; MXU work runs on
128-aligned shapes (125 -> pad 128 = 0.977 vs the planes path's 200 -> 256
= 0.61 utilization).

Precision: "bf16" is peak-search grade (~1e-2 spectrum rel err, same as
the planes path; fast_xcorr re-verifies the winning shift exactly in f32),
"f32" runs Precision.HIGHEST for parity tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_INT_MAX = np.int32(2147483647)


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def find_triple(n: int) -> tuple[int, int, int] | None:
    """Factor n = f0*f1*f2 with f2 a lane-exact multiple of 128 in
    [128, 1024] and f0, f1 balanced in [16, 1024], minimizing the
    MXU-padded per-sample MAC cost sum(pad128(f)^2 / f)."""
    best = None
    best_cost = None
    for f2 in range(128, 1025, 128):
        if n % f2:
            continue
        rest = n // f2
        for f0 in range(int(math.isqrt(rest)), 15, -1):
            if rest % f0:
                continue
            f1 = rest // f0
            if f1 > 1024 or f0 < 16:
                break
            cost = (_pad128(f0) ** 2 / f0 + _pad128(f1) ** 2 / f1
                    + _pad128(f2) ** 2 / f2)
            if best_cost is None or cost < best_cost:
                best, best_cost = (f0, f1, f2), cost
            break  # most balanced split for this f2
    return best


def _planes(a: np.ndarray, dt) -> tuple[np.ndarray, np.ndarray]:
    return a.real.astype(dt), a.imag.astype(dt)


class Caf3Plan:
    """Host-side constants + geometry for the three-stage fused CAF."""

    def __init__(self, n: int, mode: str = "bf16"):
        self.n, self.mode = int(n), mode
        triple = find_triple(int(n))
        self.viable = triple is not None
        if not self.viable:
            return
        f0, f1, f2 = triple
        self.f0, self.f1, self.f2 = f0, f1, f2
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
        wdt = bf16 if mode == "bf16" else np.float32
        self.store = wdt

        def dftmat(m):
            k = np.arange(m, dtype=np.float64)
            return np.exp(-2j * np.pi * np.mod(np.outer(k, k), m) / m)

        # stage matrices; stage-3 pre-transposed (n2, k2) for direct
        # contraction (it is symmetric, but keep the transpose explicit)
        w1 = dftmat(f0)
        w2 = dftmat(f1)
        w3t = dftmat(f2).T
        self.w1r, self.w1i = _planes(w1, wdt)
        self.w2r, self.w2i = _planes(w2, np.float32)  # per-k0 VPU build
        self.w3r, self.w3i = _planes(w3t, wdt)
        if mode == "bf16":
            self.w1s = (w1.real + w1.imag).astype(wdt)
            self.w3s = (w3t.real + w3t.imag).astype(wdt)
        else:
            self.w1s = np.zeros((1, 1), wdt)
            self.w3s = np.zeros((1, 1), wdt)
        # twiddle digit planes (f64 phase mod 2*pi, like ops/fft.py)
        k0 = np.arange(f0, dtype=np.float64)
        n1 = np.arange(f1, dtype=np.float64)
        n2 = np.arange(f2, dtype=np.float64)
        a1 = np.exp(-2j * np.pi
                    * np.mod(np.outer(k0, n1), f0 * f1) / (f0 * f1))
        a2 = np.exp(-2j * np.pi * np.mod(np.outer(k0, n2), n) / n)
        k1 = np.arange(f1, dtype=np.float64)
        tw2 = np.exp(-2j * np.pi
                     * np.mod(np.outer(k1, n2), f1 * f2) / (f1 * f2))
        # row planes shaped (f0, 1, f) so per-k0 blocks keep Mosaic-legal
        # last-two block dims (1 == array dim, f == array dim)
        self.a1r, self.a1i = (p.reshape(f0, 1, f1)
                              for p in _planes(a1, np.float32))
        self.a2r, self.a2i = (p.reshape(f0, 1, f2)
                              for p in _planes(a2, np.float32))
        self.tw2r, self.tw2i = _planes(tw2, np.float32)
        # inner flat index (k1-major over (k1, k2)); true bin reconstructed
        # by the wrapper as k0 + f0*(k1 + f1*k2)
        self.flatc = (np.arange(f1)[:, None] * f2
                      + np.arange(f2)[None, :]).astype(np.int32)


def _stage1_kernel(xr, xi, cr, ci, w1r, w1i, w1s, or_, oi_, *, mode: str):
    """One q1-strip: modulate -> stage-1 DFT matmul -> bf16 scratch planes.

    xr/xi: (f0, f2) window strip planes. cr/ci: (f0, f2) template strip
    planes (pre-conjugated). w1*: (f0, f0) stage-1 matrix planes (+ the
    Karatsuba sum plane in bf16 mode). or_/oi_: (f0, f2) scratch planes.
    """
    pr = xr[...].astype(jnp.float32) * cr[...].astype(jnp.float32) \
        - xi[...].astype(jnp.float32) * ci[...].astype(jnp.float32)
    pi = xr[...].astype(jnp.float32) * ci[...].astype(jnp.float32) \
        + xi[...].astype(jnp.float32) * cr[...].astype(jnp.float32)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if mode == "f32":
        dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        yr = dot32(w1r[...], pr) - dot32(w1i[...], pi)
        yi = dot32(w1r[...], pi) + dot32(w1i[...], pr)
        or_[...] = yr
        oi_[...] = yi
    else:
        prb = pr.astype(jnp.bfloat16)
        pib = pi.astype(jnp.bfloat16)
        psb = (pr + pi).astype(jnp.bfloat16)
        t1 = dot(w1r[...], prb)
        t2 = dot(w1i[...], pib)
        t3 = dot(w1s[...], psb)
        or_[...] = (t1 - t2).astype(jnp.bfloat16)
        oi_[...] = (t3 - t1 - t2).astype(jnp.bfloat16)


def _stage23_kernel(sr, si, a1r, a1i, a2r, a2i, w2r, w2i, tw2r, tw2i,
                    w3r, w3i, w3s, flatc, out_max, out_idx, *, mode: str):
    """One k0: fold A1 into the stage-2 matrix, contract n1, combined
    twiddle, contract n2, |.|^2 -> (max, inner argmax).

    sr/si: (f1, f2) scratch slice for this k0. a1r/a1i: (f1,) A1 row
    (block-DMA'd per step). a2r/a2i: (f2,) A2 row. w2*: (f1, f1) f32
    stage-2 planes. tw2*: (f1, f2) stage-2 twiddle planes. w3*: (f2, f2)
    stage-3 planes (+ Karatsuba sum). out_*: (1, f0) SMEM scalars.
    """
    k0 = jax.lax.axis_index  # unused; keep signature tight
    del k0
    import jax.experimental.pallas as pl

    ci = pl.program_id(0)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # W2'[k1, n1] = W2[k1, n1] * A1[k0, n1] — broadcast the (1, f1) row
    # over k1 rows; the stage-1 twiddle's n1-dependent digit never exists
    # as a matrix
    ar = a1r[...].reshape(1, -1)
    ai = a1i[...].reshape(1, -1)
    w2pr = w2r[...] * ar - w2i[...] * ai
    w2pi = w2r[...] * ai + w2i[...] * ar

    if mode == "f32":
        dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        gr = dot32(w2pr, sr[...]) - dot32(w2pi, si[...])
        gi = dot32(w2pr, si[...]) + dot32(w2pi, sr[...])
    else:
        w2prb = w2pr.astype(jnp.bfloat16)
        w2pib = w2pi.astype(jnp.bfloat16)
        w2psb = (w2pr + w2pi).astype(jnp.bfloat16)
        ssum = (sr[...].astype(jnp.float32)
                + si[...].astype(jnp.float32)).astype(jnp.bfloat16)
        t1 = dot(w2prb, sr[...])
        t2 = dot(w2pib, si[...])
        t3 = dot(w2psb, ssum)
        gr = t1 - t2
        gi = t3 - t1 - t2

    # combined twiddle T[k1, n2] = TW2[k1, n2] * A2[k0, n2]
    br = a2r[...].reshape(1, -1)
    bi = a2i[...].reshape(1, -1)
    tr = tw2r[...] * br - tw2i[...] * bi
    ti = tw2r[...] * bi + tw2i[...] * br
    hr = gr * tr - gi * ti
    hi = gr * ti + gi * tr

    if mode == "f32":
        rr = dot32(hr, w3r[...]) - dot32(hi, w3i[...])
        ri = dot32(hr, w3i[...]) + dot32(hi, w3r[...])
    else:
        hrb = hr.astype(jnp.bfloat16)
        hib = hi.astype(jnp.bfloat16)
        hsb = (hr + hi).astype(jnp.bfloat16)
        u1 = dot(hrb, w3r[...])
        u2 = dot(hib, w3i[...])
        u3 = dot(hsb, w3s[...])
        rr = u1 - u2
        ri = u3 - u1 - u2

    mag = rr * rr + ri * ri
    tmax = jnp.max(mag)
    tidx = jnp.min(jnp.where(mag >= tmax, flatc[...], _INT_MAX))
    out_max[0, ci] = tmax
    out_idx[0, ci] = tidx


@functools.partial(jax.jit, static_argnames=("f0", "f1", "f2", "mode",
                                             "interpret", "stage"))
def _caf3_pallas(xr3, xi3, cr3, ci3, w1r, w1i, w1s, a1r, a1i, a2r, a2i,
                 w2r, w2i, tw2r, tw2i, w3r, w3i, w3s, flatc, *,
                 f0, f1, f2, mode, interpret=False, stage="both"):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    store = jnp.bfloat16 if mode == "bf16" else jnp.float32
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    # 2D views keep every block's last-two dims Mosaic-legal (dim -2 equals
    # the full array dim, dim -1 is a multiple of 128): the q1-strip of the
    # (f0, f1, f2) window view is the (f0, f2) column block of its 2D
    # (f0, f1*f2) flattening, and kernel A writes the scratch in the SAME
    # 2D layout — whose free 3D reshape is exactly the (k0, n1, n2) view
    # kernel B's per-k0 leading-squeezed blocks want.
    strip = pl.BlockSpec((f0, f2), lambda q1: (0, q1))
    flops1 = (6 if mode == "bf16" else 8) * f1 * f0 * f0 * f2
    sr_, si_ = pl.pallas_call(
        functools.partial(_stage1_kernel, mode=mode),
        grid=(f1,),
        in_specs=[strip, strip, strip, strip, const, const, const],
        out_specs=[strip, strip],
        out_shape=[jax.ShapeDtypeStruct((f0, f1 * f2), store)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops1,
            bytes_accessed=4 * xr3.size * xr3.dtype.itemsize
            + 2 * f1 * f0 * f2 * np.dtype(store).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xr3, xi3, cr3, ci3, w1r, w1i, w1s)
    if stage == "a":        # diagnostics: stage-1 kernel alone
        return (sr_[:1, :128].astype(jnp.float32),
                si_[:1, :128].astype(jnp.float32))
    sr_ = sr_.reshape(f0, f1, f2)
    si_ = si_.reshape(f0, f1, f2)

    scr_in = pl.BlockSpec((None, f1, f2), lambda k0: (k0, 0, 0))
    row1 = pl.BlockSpec((None, 1, f1), lambda k0: (k0, 0, 0))
    row2 = pl.BlockSpec((None, 1, f2), lambda k0: (k0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    flops2 = (6 if mode == "bf16" else 8) * f0 * (f1 * f1 * f2
                                                  + f1 * f2 * f2)
    maxv, idx = pl.pallas_call(
        functools.partial(_stage23_kernel, mode=mode),
        grid=(f0,),
        in_specs=[scr_in, scr_in, row1, row1, row2, row2, const, const,
                  const, const, const, const, const, const],
        out_specs=[smem, smem],
        out_shape=[jax.ShapeDtypeStruct((1, f0), jnp.float32),
                   jax.ShapeDtypeStruct((1, f0), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops2,
            bytes_accessed=2 * f1 * f0 * f2 * np.dtype(store).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(sr_, si_, a1r, a1i, a2r, a2i, w2r, w2i, tw2r, tw2i, w3r, w3i, w3s,
      flatc)
    return maxv[0], idx[0]


_PLAN_CACHE: dict = {}


def get_caf3_plan(n: int, mode: str = "bf16") -> Caf3Plan:
    key = (n, mode)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = Caf3Plan(n, mode)
    return _PLAN_CACHE[key]


def caf3_peak(xr: jnp.ndarray, xi: jnp.ndarray, ccr, cci, plan: Caf3Plan,
              interpret: bool = False):
    """(peak |X[k]|^2, true argmax bin) of the n-point DFT of the
    modulated window (xr + i*xi) * (ccr + i*cci).

    xr/xi: (n,) float32/bf16 window planes. ccr/cci: (n,) PRE-CONJUGATED
    template planes (host or device). Returns two scalars.
    """
    f0, f1, f2 = plan.f0, plan.f1, plan.f2
    idt = jnp.bfloat16 if plan.mode == "bf16" else jnp.float32

    def v2(a):
        return jnp.asarray(a).astype(idt).reshape(f0, f1 * f2)

    maxv, inner = _caf3_pallas(
        v2(xr), v2(xi), v2(ccr), v2(cci),
        jnp.asarray(plan.w1r), jnp.asarray(plan.w1i), jnp.asarray(plan.w1s),
        jnp.asarray(plan.a1r), jnp.asarray(plan.a1i),
        jnp.asarray(plan.a2r), jnp.asarray(plan.a2i),
        jnp.asarray(plan.w2r), jnp.asarray(plan.w2i),
        jnp.asarray(plan.tw2r), jnp.asarray(plan.tw2i),
        jnp.asarray(plan.w3r), jnp.asarray(plan.w3i),
        jnp.asarray(plan.w3s), jnp.asarray(plan.flatc),
        f0=f0, f1=f1, f2=f2, mode=plan.mode, interpret=interpret)
    k0 = jnp.argmax(maxv)
    pk = maxv[k0]
    fl = inner[k0]
    k1 = fl // f2
    k2 = fl % f2
    return pk, (k0 + f0 * (k1 + f1 * k2)).astype(jnp.uint32)
