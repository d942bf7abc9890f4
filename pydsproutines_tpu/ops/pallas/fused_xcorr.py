"""Fused frequency-scanning xcorr: Pallas two-kernel pipeline.

The XLA formulation of fastXcorr's freq scan (ops/xcorr.py) moves ~2 GB of
HBM per 16-shift chunk at n=1M: gathered product write+read, two matmul-FFT
stage passes, and a full-spectrum magnitude/argmax read. Per the v5e stage
timings that pins the op at the HBM roofline, not the MXU. This module
removes the two biggest passes for the peak-search path (freqsearch=True,
output_caf=False, unit-step shifts):

  kernel 1  gather+modulate+DFT-stage-1+twiddle: reads each input sample
            from a small (n1, n2 + B) halo matrix (~5 MB instead of a
            256 MB gathered-product batch), multiplies by the conjugated
            template tile, contracts with the VMEM-resident stage-1 DFT
            matrix on the MXU, applies the twiddle, and writes the
            intermediate g = (B, n1, n2) planes once.

  kernel 2  DFT-stage-2+|.|^2+argmax: contracts g row-tiles with the
            VMEM-resident stage-2 DFT matrix and reduces magnitude + flat
            argmax entirely in VMEM — the length-n spectrum per shift never
            touches HBM. Argmax uses the max-then-match idiom (equality
            mask + iota min-reduce) for first-occurrence semantics.

Output bins are in the matmul FFT's permuted layout (k1-major); the true
frequency bin is k1 + n1*k2, identical to FourStepFFT.permutation. Reference
semantics: xcorrRoutines.py:460 fastXcorr freq scan (QF^2 + peak bin).

Complex data moves as separate re/im float32 planes (no complex in Mosaic).

STATUS: experimental. Semantics are exact (interpret-mode parity tests vs
fast_xcorr), but the v5e-measured wall time is far off the XLA path — the
XLA-side per-shift window gather (16K dynamic slices) dominates, and compile
times through the remote AOT compiler are ~18 min. The production freq-scan
path remains ops/xcorr.fast_xcorr (5.8 Gsample-shift/s on v5e); this module
documents the fusion structure for a future round of kernel work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops.fft import best_two_factor


def _pad2(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), a.dtype)
    out[:a.shape[0], :a.shape[1]] = a
    return out


class FusedXcorrPlan:
    """Padded stage matrices + geometry for the fused freq-scan kernels."""

    def __init__(self, n: int, batch: int, tile_m: int = 128,
                 tile_k: int = 256, mxu_dtype=np.float32):
        factors = best_two_factor(n)
        self.viable = factors is not None and n >= 4096
        if not self.viable:
            return
        self.n = n
        self.n1, self.n2 = factors
        self.batch = batch
        self.tile_m = tile_m
        self.tile_k = tile_k
        self.n1p = -(-self.n1 // max(128, tile_k)) * max(128, tile_k)
        self.n2p = -(-self.n2 // tile_m) * tile_m
        # halo matrix columns: per-row window n2p + batch offsets + slack so
        # every (m0 + b, tile_m) column slice stays in bounds
        self.zcols = self.n2p + 2 * tile_m
        k1 = np.arange(self.n1, dtype=np.float64)
        w1 = np.exp(-2j * np.pi * np.mod(np.outer(k1, k1), self.n1)
                    / self.n1)
        k2 = np.arange(self.n2, dtype=np.float64)
        w2 = np.exp(-2j * np.pi * np.mod(np.outer(k2, k2), self.n2)
                    / self.n2)
        j = np.arange(self.n2, dtype=np.float64)
        tw = np.exp(-2j * np.pi * np.mod(np.outer(k1, j), n) / n)
        # stage matrices may be stored bf16: XLA's DEFAULT matmul precision
        # rounds f32 operands to bf16 on the MXU anyway, so this matches the
        # XLA path's numerics while halving VMEM residency
        import jax.numpy as _jnp
        md = _jnp.bfloat16 if mxu_dtype == "bfloat16" else np.float32
        self.mxu_dtype = md
        self.w1_re = np.asarray(
            _pad2(w1.real.astype(np.float32), self.n1p, self.n1p)).astype(md)
        self.w1_im = np.asarray(
            _pad2(w1.imag.astype(np.float32), self.n1p, self.n1p)).astype(md)
        self.w2_re = np.asarray(
            _pad2(w2.real.astype(np.float32), self.n2p, self.n2p)).astype(md)
        self.w2_im = np.asarray(
            _pad2(w2.imag.astype(np.float32), self.n2p, self.n2p)).astype(md)
        self.tw_re = _pad2(tw.real.astype(np.float32), self.n1p, self.n2p)
        self.tw_im = _pad2(tw.imag.astype(np.float32), self.n1p, self.n2p)


def _stage1_kernel(zre, zim, ccre, ccim, w1re, w1im, twre, twim,
                   gre_out, gim_out, *, tile_m: int, n1p: int):
    import jax.experimental.pallas as pl

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ztr = zre[0, :, :]                                # (n1p, tile_m)
    zti = zim[0, :, :]
    ctr = ccre[:, :]
    cti = ccim[:, :]
    # pdt = z * cc  (cc already conjugated on host)
    md = w1re.dtype
    pre = (ztr * ctr - zti * cti).astype(md)
    pim = (ztr * cti + zti * ctr).astype(md)
    # f1 = W1 @ pdt
    f1re = dot(w1re[:, :], pre) - dot(w1im[:, :], pim)
    f1im = dot(w1re[:, :], pim) + dot(w1im[:, :], pre)
    # g = f1 * tw
    ttr = twre[:, :]
    tti = twim[:, :]
    gre_out[0, :, :] = f1re * ttr - f1im * tti
    gim_out[0, :, :] = f1re * tti + f1im * ttr


def _stage2_kernel(gre, gim, w2re, w2im, out_max, out_idx,
                   run_max, run_idx, *, tile_k: int, n2p: int):
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    dot_t = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),   # contract minor dims
        preferred_element_type=jnp.float32)
    md = w2re.dtype
    gr = gre[0, :, :].astype(md)                      # (tile_k, n2p)
    gi = gim[0, :, :].astype(md)
    # h[k1, k2] = sum_m g[k1, m] * w2[k2, m]
    hre = dot_t(gr, w2re[:, :]) - dot_t(gi, w2im[:, :])
    him = dot_t(gr, w2im[:, :]) + dot_t(gi, w2re[:, :])
    mag = hre * hre + him * him                       # (tile_k, n2p)
    tmax = jnp.max(mag)
    # first-occurrence flat index within this tile (k1-major)
    rows = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    flat = (ki * tile_k + rows) * n2p + cols
    tidx = jnp.min(jnp.where(mag >= tmax, flat, jnp.int32(2147483647)))

    @pl.when(ki == 0)
    def _init():
        run_max[0, 0] = tmax
        run_idx[0, 0] = tidx

    @pl.when(jnp.logical_and(ki > 0, tmax > run_max[0, 0]))
    def _update():
        run_max[0, 0] = tmax
        run_idx[0, 0] = tidx

    @pl.when(ki == nk - 1)
    def _emit():
        out_max[b, 0] = run_max[0, 0]
        out_idx[b, 0] = run_idx[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("n1", "n2", "n1p", "n2p", "zcols", "batch", "tile_m",
                     "tile_k", "interpret"))
def _fused_chunk(window_re, window_im, consts, *, n1, n2, n1p, n2p, zcols,
                 batch, tile_m, tile_k, interpret=False):
    """One chunk: window = rx[s0 : s0 + (n1-1)*n2 + zcols] planes; returns
    (maxval (B,), true_bin (B,) uint32)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # per-shift window matrices: zmat3[b, r, :] = window[b + r*n2 : +n2p]
    # (built in XLA — float32 planes are half the size of the complex
    # gathered-product batch the unfused path materializes, and the cc
    # multiply + twiddle + stage-2 spectrum never touch HBM at all)
    bb, rr = jnp.meshgrid(jnp.arange(batch), jnp.arange(n1) * n2,
                          indexing="ij")
    starts = (bb + rr).reshape(-1)
    zre = jax.vmap(lambda st: jax.lax.dynamic_slice(
        window_re, (st,), (n2p,)))(starts).reshape(batch, n1, n2p)
    zim = jax.vmap(lambda st: jax.lax.dynamic_slice(
        window_im, (st,), (n2p,)))(starts).reshape(batch, n1, n2p)
    zre = jnp.pad(zre, ((0, 0), (0, n1p - n1), (0, 0)))
    zim = jnp.pad(zim, ((0, 0), (0, n1p - n1), (0, 0)))

    z_spec = pl.BlockSpec((1, n1p, tile_m), lambda mi, b: (b, 0, mi))
    tile_spec = pl.BlockSpec((n1p, tile_m), lambda mi, b: (0, mi))
    const_spec1 = pl.BlockSpec((n1p, n1p), lambda mi, b: (0, 0))
    grid1 = (n2p // tile_m, batch)        # b innermost: cc/tw tiles cached
    g_shape = jax.ShapeDtypeStruct((batch, n1p, n2p), jnp.float32)
    gre, gim = pl.pallas_call(
        functools.partial(_stage1_kernel, tile_m=tile_m, n1p=n1p),
        grid=grid1,
        in_specs=[
            z_spec, z_spec,                           # per-shift z tiles
            tile_spec, tile_spec,                     # cc tiles
            const_spec1, const_spec1,                 # w1 (resident block)
            tile_spec, tile_spec,                     # tw tiles
        ],
        out_specs=[
            pl.BlockSpec((1, n1p, tile_m), lambda mi, b: (b, 0, mi)),
            pl.BlockSpec((1, n1p, tile_m), lambda mi, b: (b, 0, mi)),
        ],
        out_shape=[g_shape, g_shape],
        interpret=interpret,
    )(zre, zim, consts["cc_re"], consts["cc_im"],
      consts["w1_re"], consts["w1_im"], consts["tw_re"], consts["tw_im"])

    const_spec2 = pl.BlockSpec((n2p, n2p), lambda b, ki: (0, 0))
    grid2 = (batch, n1p // tile_k)
    out_max, out_idx = pl.pallas_call(
        functools.partial(_stage2_kernel, tile_k=tile_k, n2p=n2p),
        grid=grid2,
        in_specs=[
            pl.BlockSpec((1, tile_k, n2p), lambda b, ki: (b, ki, 0)),
            pl.BlockSpec((1, tile_k, n2p), lambda b, ki: (b, ki, 0)),
            const_spec2, const_spec2,                 # w2 (resident block)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full (batch, 1) array
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(gre, gim, consts["w2_re"], consts["w2_im"])

    flat = out_idx[:, 0]
    k1 = flat // n2p
    k2 = flat % n2p
    true_bin = (k1 + n1 * k2).astype(jnp.uint32)
    return out_max[:, 0], true_bin


def make_consts(plan: FusedXcorrPlan, cutout_conj) -> dict:
    """Constant dict for _fused_chunk. ``cutout_conj`` is the conjugated
    length-n template. Host numpy templates are split to re/im planes on the
    host (no complex host->device transfer — the axon transport lacks it)."""
    if isinstance(cutout_conj, np.ndarray):
        cc_re = np.ascontiguousarray(
            cutout_conj.real.astype(np.float32)).reshape(plan.n1, plan.n2)
        cc_im = np.ascontiguousarray(
            cutout_conj.imag.astype(np.float32)).reshape(plan.n1, plan.n2)
        cc_re = _pad2(cc_re, plan.n1p, plan.n2p)
        cc_im = _pad2(cc_im, plan.n1p, plan.n2p)
    else:
        cc = jnp.asarray(cutout_conj)
        cc_re = jnp.reshape(cc.real.astype(jnp.float32),
                            (plan.n1, plan.n2))
        cc_im = jnp.reshape(cc.imag.astype(jnp.float32),
                            (plan.n1, plan.n2))
        cc_re = jnp.pad(cc_re, ((0, plan.n1p - plan.n1),
                                (0, plan.n2p - plan.n2)))
        cc_im = jnp.pad(cc_im, ((0, plan.n1p - plan.n1),
                                (0, plan.n2p - plan.n2)))
    return {
        "cc_re": cc_re, "cc_im": cc_im,
        "w1_re": plan.w1_re, "w1_im": plan.w1_im,
        "tw_re": plan.tw_re, "tw_im": plan.tw_im,
        "w2_re": plan.w2_re, "w2_im": plan.w2_im,
    }


def fused_freq_scan_xcorr(cutout, rx, shifts0: int, num_shifts: int,
                          batch: int = 16, tile_m: int = 128,
                          tile_k: int = 256, mxu_dtype=np.float32,
                          interpret: bool = False):
    """QF^2 + peak bin for consecutive shifts [shifts0, shifts0+num_shifts)
    via the fused Pallas pipeline. Returns (qf2 (num_shifts,), bins uint32).

    Semantics match fast_xcorr(freqsearch=True, output_caf=False,
    abs_result=True) with unit-step shifts.
    """
    n = int(cutout.shape[-1])
    plan = FusedXcorrPlan(n, batch, tile_m, tile_k, mxu_dtype)
    if not plan.viable:
        raise ValueError(f"no viable two-factor plan for n={n}")
    nchunks = -(-num_shifts // batch)
    wlen = plan.batch + (plan.n1 - 1) * plan.n2 + plan.n2p
    need = shifts0 + (nchunks - 1) * batch + wlen
    # host numpy inputs: conjugate/pad/split on host (no complex transfers)
    if isinstance(rx, np.ndarray):
        rxp = np.pad(rx, (0, max(0, need - int(rx.shape[-1]))))
        rre = jnp.asarray(np.ascontiguousarray(rxp.real.astype(np.float32)))
        rim = jnp.asarray(np.ascontiguousarray(rxp.imag.astype(np.float32)))
    else:
        rxp = jnp.pad(rx, (0, max(0, need - int(rx.shape[-1]))))
        rre = rxp.real.astype(jnp.float32)
        rim = rxp.imag.astype(jnp.float32)
    cc_host = np.conj(cutout) if isinstance(cutout, np.ndarray) \
        else jnp.conj(cutout)
    consts = make_consts(plan, cc_host)
    cutout_norm_sq = jnp.sum(
        jnp.asarray(consts["cc_re"]) ** 2
        + jnp.asarray(consts["cc_im"]) ** 2).astype(jnp.float32)
    power = jnp.concatenate([
        jnp.zeros(1, jnp.float32),
        jnp.cumsum(rre * rre + rim * rim)])

    def chunk(s0):
        wre = jax.lax.dynamic_slice(rre, (s0,), (wlen,))
        wim = jax.lax.dynamic_slice(rim, (s0,), (wlen,))
        return _fused_chunk(wre, wim, consts, n1=plan.n1, n2=plan.n2,
                            n1p=plan.n1p, n2p=plan.n2p, zcols=plan.zcols,
                            batch=batch, tile_m=tile_m, tile_k=tile_k,
                            interpret=interpret)

    starts = shifts0 + jnp.arange(nchunks) * batch
    maxv, bins = jax.lax.map(chunk, starts)
    maxv = maxv.reshape(-1)[:num_shifts]
    bins = bins.reshape(-1)[:num_shifts]
    shifts = shifts0 + jnp.arange(num_shifts)
    rx_norm_sq = power[shifts + n] - power[shifts]
    qf2 = maxv / cutout_norm_sq / rx_norm_sq
    return qf2, bins
