"""Fused frequency-scanning xcorr: single-kernel Pallas CAF peak search.

Reference semantics: fastXcorr freq-scan peak search
(/root/reference/xcorrRoutines.py:460,519-531) — for every shift s,
argmax_k |FFT(rx[s:s+n] * conj(cutout))[k]|^2 with QF^2 normalization. The
reference GPU path gathers window slices into a batch matrix
(custom_kernels/copying.cu), runs cuFFT, and fuses only the argmax
(argmax.cu:94). The XLA four-step formulation (ops/xcorr.py) is HBM-bound:
the gathered product batch, the stage-1 planes, and (without the
fft_peak kernel) the spectrum each round-trip HBM — ~2 GB per 16-shift
chunk at n = 1M.

Here the ENTIRE per-shift pipeline runs inside one Pallas kernel with no
HBM intermediates, exploiting v5e's large VMEM (~100 MB usable, probed):

  grid = (chunks, shifts-per-chunk). Per chunk, one (n1, n2 + halo) window
  tile serves every shift of the chunk — consecutive shifts are lane offsets
  into the same tile, so the (B, n) gathered batch never exists. Per shift:
  modulate by conj(cutout) (VPU) -> stage-1 DFT matmul + twiddle ->
  stage-2 DFT matmul -> |.|^2 -> flat argmax, looped over k1 row tiles to
  bound VMEM liveness, all on-chip. Only (max, argmax) scalars leave.

HBM traffic per 128 x 1M sweep: ~130 MB (the overlap-rows window views +
constants) vs ~16 GB for the unfused path. MXU work is unchanged — the
kernel is matmul-bound, which is the point.

Precision ladder matches ops/fft.py: "bf16" (~1e-2 spectrum rel err,
peak-search grade), "bf16x3" (error-compensated 3-pass, ~1e-5), "f32"
(Precision.HIGHEST, ~5e-7). fast_xcorr routes here automatically for
unit/static-step shift sweeps on viable sizes; bins and tie-breaks match
FourStepFFT.call_permuted argmax semantics (k1-major first occurrence).

Measured (v5e, 1M-sample cutout x 128 shifts, bf16, batch=128): 11.3 ms per
sweep rep-differenced = 11.4 Gsample-shift/s, ~92% of the 197-Tflop/s bf16
MXU roofline for the sweep's 2.05 Tflop — 1.9x the unfused XLA path (5.8)
and ~26x the reference's published GPU number (0.44, benchmarks/README.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# probed on v5e: 100 MB scratch compiles+runs, 120 MB does not
_VMEM_CEILING = 96 * 1024 * 1024
_INT_MAX = np.int32(2147483647)


def _bf16_split_np(a64: np.ndarray):
    import ml_dtypes
    bf16 = np.dtype(ml_dtypes.bfloat16)
    hi = a64.astype(bf16)
    lo = (a64 - hi.astype(np.float64)).astype(bf16)
    return hi, lo


def _caf_kernel(z_re, z_im, cc_re, cc_im, tw_re, tw_im, w1r, w1i, w1r_lo,
                w1i_lo, w2r, w2i, w2r_lo, w2i_lo, w1s, w2s, flatc, out_max,
                out_idx, *, n1: int, n2: int, k1t: int, step: int,
                mode: str):
    """One shift: full modulate -> two-stage DFT -> |.|^2 -> argmax.

    z_*: (1, n1, n2 + (B-1)*step) shared window planes for this chunk.
    cc_*: (n1, n2) conjugated template planes. tw_*: (n1, n2) twiddle planes.
    w1*: (n1, n1) stage-1 DFT planes; w2*: (n2, n2) TRANSPOSED stage-2 DFT
    planes (contraction-ready); *_lo: bf16 low parts (bf16x3) or (1, 1)
    dummies. w1s/w2s: Karatsuba sum planes bf16(Re+Im) (bf16 mode) or
    dummies. out_*: (chunks, B) SMEM scalars per shift.

    bf16 mode runs each complex matmul as THREE real MXU passes (Karatsuba:
    t1 = Wr@xr, t2 = Wi@xi, t3 = (Wr+Wi)@(xr+xi); Re = t1-t2, Im =
    t3-t1-t2) instead of four — the constant-side sums are precomputed on
    host, the data-side sum is one VPU add. 25% less MXU work on a
    matmul-bound kernel; error growth ~2x at bf16 peak-search grade (the
    winning shift is re-verified exactly by the caller's tone-dot refine).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci = pl.program_id(0)
    b = pl.program_id(1)

    # shift b's window sits step*b lanes into the shared chunk tile. Mosaic
    # needs lane-slice starts provably 128-aligned, so extract via dynamic
    # rotate: roll(z, s)[j] = z[(j - s) mod W] (right rotation), hence a
    # left rotation by k = b*step is shift = (W - k) mod W; the kept columns
    # [0, n2) never read wrapped lanes since n2 - 1 + k < W.
    w = z_re.shape[2]
    amt = jax.lax.rem(jnp.int32(w) - b * step, jnp.int32(w))
    zr = pltpu.roll(z_re[0], amt, 1)[:, :n2]
    zi = pltpu.roll(z_im[0], amt, 1)[:, :n2]
    pr = zr * cc_re[:, :] - zi * cc_im[:, :]
    pi = zr * cc_im[:, :] + zi * cc_re[:, :]

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)

    if mode == "bf16x3":
        pr_hi = pr.astype(jnp.bfloat16)
        pr_lo = (pr - pr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pi_hi = pi.astype(jnp.bfloat16)
        pi_lo = (pi - pi_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    elif mode == "bf16":
        prb = pr.astype(jnp.bfloat16)
        pib = pi.astype(jnp.bfloat16)
        psb = (pr + pi).astype(jnp.bfloat16)

    best_m = jnp.full((), -1.0, jnp.float32)
    best_i = jnp.full((), _INT_MAX, jnp.int32)
    # k1 row tiles bound the liveness of the f1/g/r2/mag intermediates
    for tk in range(n1 // k1t):
        rows = slice(tk * k1t, (tk + 1) * k1t)
        if mode == "f32":
            f1r = dot32(w1r[rows, :], pr) - dot32(w1i[rows, :], pi)
            f1i = dot32(w1r[rows, :], pi) + dot32(w1i[rows, :], pr)
        elif mode == "bf16x3":
            def mm1(whi, wlo, xhi, xlo):
                return (dot(whi[rows, :], xhi) + dot(wlo[rows, :], xhi)) \
                    + dot(whi[rows, :], xlo)
            f1r = mm1(w1r, w1r_lo, pr_hi, pr_lo) - mm1(w1i, w1i_lo, pi_hi,
                                                       pi_lo)
            f1i = mm1(w1r, w1r_lo, pi_hi, pi_lo) + mm1(w1i, w1i_lo, pr_hi,
                                                       pr_lo)
        else:
            t1 = dot(w1r[rows, :], prb)
            t2 = dot(w1i[rows, :], pib)
            t3 = dot(w1s[rows, :], psb)
            f1r = t1 - t2
            f1i = t3 - t1 - t2

        gr = f1r * tw_re[rows, :] - f1i * tw_im[rows, :]
        gi = f1r * tw_im[rows, :] + f1i * tw_re[rows, :]

        if mode == "f32":
            rr = dot32(gr, w2r[:, :]) - dot32(gi, w2i[:, :])
            ri = dot32(gr, w2i[:, :]) + dot32(gi, w2r[:, :])
        elif mode == "bf16x3":
            gr_hi = gr.astype(jnp.bfloat16)
            gr_lo = (gr - gr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            gi_hi = gi.astype(jnp.bfloat16)
            gi_lo = (gi - gi_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def mm2(xhi, xlo, whi, wlo):
                return (dot(xhi, whi[:, :]) + dot(xhi, wlo[:, :])) \
                    + dot(xlo, whi[:, :])
            rr = mm2(gr_hi, gr_lo, w2r, w2r_lo) - mm2(gi_hi, gi_lo, w2i,
                                                      w2i_lo)
            ri = mm2(gr_hi, gr_lo, w2i, w2i_lo) + mm2(gi_hi, gi_lo, w2r,
                                                      w2r_lo)
        else:
            s1 = dot(gr.astype(jnp.bfloat16), w2r[:, :])
            s2 = dot(gi.astype(jnp.bfloat16), w2i[:, :])
            s3 = dot((gr + gi).astype(jnp.bfloat16), w2s[:, :])
            rr = s1 - s2
            ri = s3 - s1 - s2

        mag = rr * rr + ri * ri                       # (k1t, n2)
        tmax = jnp.max(mag)
        # k1-major permuted positions from a resident constant table: the
        # in-loop iota+mul+add build measured ~2% of the kernel
        # (benchmarks/exp_1m_phases.py full vs full-opt)
        tidx = jnp.min(jnp.where(mag >= tmax, flatc[rows, :], _INT_MAX))
        take = tmax > best_m
        best_i = jnp.where(take, tidx, best_i)
        best_m = jnp.where(take, tmax, best_m)

    out_max[ci, b] = best_m
    out_idx[ci, b] = best_i


def _vmem_estimate(n1: int, n2: int, k1t: int, halo: int, mode: str) -> int:
    f32 = 4
    wb = 4 if mode == "f32" else 2
    nw = 4 if mode == "bf16x3" else (3 if mode == "bf16" else 2)
    wcols = -(-(n2 + halo) // 128) * 128
    z = 2 * n1 * wcols * f32 * 2                # double-buffered chunk tiles
    cc = 2 * n1 * n2 * f32
    tw = 2 * n1 * n2 * f32
    w1 = nw * n1 * n1 * wb                      # bf16: +Karatsuba sum plane
    w2 = nw * n2 * n2 * wb
    pdt = 2 * n1 * n2 * (f32 + (0 if mode == "f32" else
                                2 * (2 if mode == "bf16x3" else 1))) \
        + (n1 * n2 * 2 if mode == "bf16" else 0)    # psum plane
    tile = 2 * k1t * n2 * f32 * 3               # f1, g, r2/mag liveness
    flat = n1 * n2 * 4                          # argmax flat-index constant
    return z + cc + tw + w1 + w2 + pdt + tile + flat


class FusedXcorrPlan:
    """Host-side constants + geometry for the fused CAF-peak kernel."""

    def __init__(self, n: int, batch: int = 16, step: int = 1,
                 mode: str = "bf16"):
        from pydsproutines_tpu.ops.fft import best_two_factor
        self.n, self.batch, self.step, self.mode = n, batch, step, mode
        factors = best_two_factor(n)
        self.viable = factors is not None and n >= 4096
        if not self.viable:
            return
        self.n1, self.n2 = factors
        halo = (batch - 1) * step
        if halo > self.n2:
            # the two-reshape window build needs the halo within one row
            self.viable = False
            return
        divs = sorted({d for d in range(8, self.n1 + 1, 8)
                       if self.n1 % d == 0} | {self.n1})
        # largest k1 row tile whose liveness fits VMEM (bigger tiles = fewer,
        # better-shaped matmuls)
        fitting = [d for d in divs if _vmem_estimate(
            self.n1, self.n2, d, halo, mode) <= _VMEM_CEILING]
        self.viable = bool(fitting)
        if not self.viable:
            return
        self.k1t = fitting[-1]

        n1, n2 = self.n1, self.n2
        k1 = np.arange(n1, dtype=np.float64)
        j = np.arange(n2, dtype=np.float64)
        k2 = np.arange(n2, dtype=np.float64)
        w1_64 = np.exp(-2j * np.pi * np.mod(np.outer(k1, k1), n1) / n1)
        # stage-2 matrix pre-transposed to (j, k2) for direct contraction
        w2t_64 = np.exp(-2j * np.pi * np.mod(np.outer(j, k2), n2) / n2)
        tw_64 = np.exp(-2j * np.pi * np.mod(np.outer(k1, j), n) / n)
        self.tw_re = tw_64.real.astype(np.float32)
        self.tw_im = tw_64.imag.astype(np.float32)
        self.flatc = (np.arange(n1)[:, None] * n2
                      + np.arange(n2)[None, :]).astype(np.int32)
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
        dummy = np.zeros((1, 1), bf16)
        self.w1s = self.w2s = dummy
        if mode == "f32":
            self.w1r = w1_64.real.astype(np.float32)
            self.w1i = w1_64.imag.astype(np.float32)
            self.w2r = w2t_64.real.astype(np.float32)
            self.w2i = w2t_64.imag.astype(np.float32)
            self.w1r_lo = self.w1i_lo = dummy
            self.w2r_lo = self.w2i_lo = dummy
        else:
            self.w1r, self.w1r_lo = _bf16_split_np(w1_64.real)
            self.w1i, self.w1i_lo = _bf16_split_np(w1_64.imag)
            self.w2r, self.w2r_lo = _bf16_split_np(w2t_64.real)
            self.w2i, self.w2i_lo = _bf16_split_np(w2t_64.imag)
            if mode != "bf16x3":
                self.w1r_lo = self.w1i_lo = dummy
                self.w2r_lo = self.w2i_lo = dummy
            if mode == "bf16":
                # Karatsuba sum planes, rounded from the f64 sum
                self.w1s = (w1_64.real + w1_64.imag).astype(bf16)
                self.w2s = (w2t_64.real + w2t_64.imag).astype(bf16)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "k1t", "step",
                                             "batch", "mode", "interpret"))
def _caf_peak_pallas(z_re, z_im, cc_re, cc_im, tw_re, tw_im, w1r, w1i,
                     w1r_lo, w1i_lo, w2r, w2i, w2r_lo, w2i_lo, w1s, w2s,
                     flatc, *, n1, n2, k1t, step, batch, mode,
                     interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks, _, wcols = z_re.shape
    const = pl.BlockSpec(memory_space=pltpu.VMEM)   # whole array, resident
    z_spec = pl.BlockSpec((1, n1, wcols), lambda ci, b: (ci, 0, 0),
                          memory_space=pltpu.VMEM)
    passes = {"bf16": 6, "bf16x3": 24, "f32": 8}[mode]
    flops = passes * nchunks * batch * (n1 * n1 * n2 + n1 * n2 * n2)
    return pl.pallas_call(
        functools.partial(_caf_kernel, n1=n1, n2=n2, k1t=k1t, step=step,
                          mode=mode),
        grid=(nchunks, batch),
        in_specs=[z_spec, z_spec] + [const] * 15,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nchunks, batch), jnp.float32),
                   jax.ShapeDtypeStruct((nchunks, batch), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * 4 * (z_re.size + cc_re.size + tw_re.size),
            transcendentals=0),
        interpret=interpret,
    )(z_re, z_im, cc_re, cc_im, tw_re, tw_im, w1r, w1i, w1r_lo, w1i_lo,
      w2r, w2i, w2r_lo, w2i_lo, w1s, w2s, flatc)


_PLAN_CACHE: dict = {}


def get_fused_plan(n: int, batch: int = 16, step: int = 1,
                   mode: str = "bf16") -> FusedXcorrPlan:
    key = (n, batch, step, mode)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = FusedXcorrPlan(n, batch, step, mode)
    return _PLAN_CACHE[key]


def fused_freq_scan_peak(cutout_conj, rx_padded, start0, nchunks: int,
                         plan: FusedXcorrPlan, interpret: bool = False):
    """Raw peak search: (peak |spectrum|^2, true bin) for every shift
    ``start0 + step*i`` across ``nchunks`` chunks of ``plan.batch`` shifts.
    ``rx_padded`` must cover [start0, start0 + (nchunks-1)*batch*step + n +
    halo). QF^2 normalization is the caller's."""
    n1, n2, batch, step = plan.n1, plan.n2, plan.batch, plan.step
    halo = (batch - 1) * step
    cc = jnp.asarray(cutout_conj)
    cc_re = cc.real.astype(jnp.float32).reshape(n1, n2)
    cc_im = cc.imag.astype(jnp.float32).reshape(n1, n2)
    rre = jnp.real(rx_padded).astype(jnp.float32)
    rim = jnp.imag(rx_padded).astype(jnp.float32)

    # overlap-rows window views: chunk ci, row r = rx[s0 + ci*B*step + r*n2 :
    # + n2+halo]. ONE dynamic slice hoists the whole sweep span; every chunk
    # tile is then just TWO static-slice reshapes concatenated — cols [0, n2)
    # are reshape(W[base : base+n]) exactly, and the halo cols are the next
    # row's head, reshape(W[base+n2 : base+n2+n])[:, :halo]. (Per-row dynamic
    # slices measured ~25 ms/sweep of gather time on v5e — the bottleneck of
    # the first fused attempt; a 1000-piece static-slice stack still cost a
    # fat concat.) Columns are padded to a lane multiple so the in-kernel
    # dynamic rotate stays exact. Requires halo <= n2 (the plan guarantees
    # batch*step <= n2 + 1).
    wcols = -(-(n2 + halo) // 128) * 128
    span = (nchunks - 1) * batch * step + n1 * n2 + n2

    def build_all(plane):
        w = jax.lax.dynamic_slice(plane, (jnp.asarray(start0),), (span,))
        chunks = []
        for ci in range(nchunks):
            base = ci * batch * step
            a = jax.lax.slice(w, (base,), (base + n1 * n2,)).reshape(n1, n2)
            b = jax.lax.slice(w, (base + n2,),
                              (base + n2 + n1 * n2,)).reshape(n1, n2)
            chunks.append(jnp.concatenate(
                [a, b[:, :halo],
                 jnp.zeros((n1, wcols - n2 - halo), plane.dtype)], axis=1))
        return jnp.stack(chunks)

    z_re = build_all(rre)
    z_im = build_all(rim)

    maxv, flat = _caf_peak_pallas(
        z_re, z_im, cc_re, cc_im,
        jnp.asarray(plan.tw_re), jnp.asarray(plan.tw_im),
        jnp.asarray(plan.w1r), jnp.asarray(plan.w1i),
        jnp.asarray(plan.w1r_lo), jnp.asarray(plan.w1i_lo),
        jnp.asarray(plan.w2r), jnp.asarray(plan.w2i),
        jnp.asarray(plan.w2r_lo), jnp.asarray(plan.w2i_lo),
        jnp.asarray(plan.w1s), jnp.asarray(plan.w2s),
        jnp.asarray(plan.flatc),
        n1=n1, n2=n2, k1t=plan.k1t, step=step, batch=batch, mode=plan.mode,
        interpret=interpret)
    # permuted position (k1-major) -> true bin k1 + n1*k2
    k1 = flat // n2
    k2 = flat % n2
    return maxv, k1 + n1 * k2


def fused_freq_scan_xcorr(cutout, rx, shifts0: int, num_shifts: int,
                          batch: int = 128, step: int = 1, mode: str = "bf16",
                          interpret: bool = False):
    """QF^2 + peak bin for shifts ``shifts0 + step*i``, i in [0, num_shifts)
    via the single-kernel pipeline (standalone wrapper; fast_xcorr routes
    here automatically when viable). Semantics match
    fast_xcorr(freqsearch=True, output_caf=False, abs_result=True)."""
    n = int(cutout.shape[-1])
    plan = get_fused_plan(n, batch, step, mode)
    if not plan.viable:
        raise ValueError(f"no viable fused plan for n={n}")
    nchunks = -(-num_shifts // batch)
    need = shifts0 + (nchunks - 1) * batch * step + n + plan.n2 + 128
    rx = jnp.asarray(rx)
    rxp = jnp.pad(rx, (0, max(0, need - int(rx.shape[-1]))))
    cc = jnp.conj(jnp.asarray(cutout))

    maxv, bins = fused_freq_scan_peak(cc, rxp, shifts0, nchunks, plan,
                                      interpret=interpret)
    maxv = maxv.reshape(-1)[:num_shifts]
    bins = bins.reshape(-1)[:num_shifts]

    rre = rxp.real.astype(jnp.float32)
    rim = rxp.imag.astype(jnp.float32)
    power = jnp.concatenate([jnp.zeros(1, jnp.float32),
                             jnp.cumsum(rre * rre + rim * rim)])
    shifts = shifts0 + jnp.arange(num_shifts) * step
    rx_norm_sq = power[shifts + n] - power[shifts]
    cutout_norm_sq = jnp.sum(cc.real ** 2 + cc.imag ** 2).astype(jnp.float32)
    qf2 = maxv / cutout_norm_sq / rx_norm_sq
    return qf2, bins.astype(jnp.uint32)
