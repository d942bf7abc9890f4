"""Cross-correlation / CAF (Complex Ambiguity Function) search.

Re-expresses the reference's xcorrRoutines (/root/reference/xcorrRoutines.py:
fastXcorr :460, cztXcorr :413, fineFreqTimeSearch :583, makeTimeScanSteervec
:670, calcQF2 :833, QF2/SNR conversions :723-772, theoreticalMultiPeak :775)
as batched jax pipelines.

TPU-first design (SURVEY.md §7.4): instead of a per-shift python loop (CPU
reference) or slice-copy CUDA kernels + cuFFT batches (GPU reference), shifts
are gathered into a (batch, N) matrix with vmap'd dynamic slices, multiplied by
the conjugated template, pushed through one batched FFT/CZT, and reduced with a
fused |.|^2-argmax — all inside a single jit. Long shift lists stream through
``lax.scan`` chunks with static shapes so nothing recompiles. Sharding over
shifts across a device mesh lives in pydsproutines_tpu.parallel.xcorr.

QF^2 convention: result = |peak|^2 / ||rx slice||^2 / ||cutout||^2, a
normalized 0..1 correlation power.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops.fft import get_fft_plan
from pydsproutines_tpu.ops.spectral import CZT
from pydsproutines_tpu.utils.dtypes import real_dtype_for
from pydsproutines_tpu.utils.freq import make_freq


# ---------------------------------------------------------------------------
# Core batched shift-gather helpers
# ---------------------------------------------------------------------------

def gather_shift_slices(rx: jnp.ndarray, shifts: jnp.ndarray, n: int,
                        step: int | None = None) -> jnp.ndarray:
    """Gather rx[s:s+n] for each s in shifts into a (len(shifts), n) matrix.

    The TPU equivalent of the reference's copySlicesToMatrix_32fc CUDA kernel
    (/root/reference/custom_kernels/copying.cu:9).

    When the shifts are an arithmetic progression with static ``step``, one
    dynamic slice grabs the covering window and the rows are cheap static
    slices (measured ~3x faster than the generic vmap gather on v5e).
    """
    if step is not None:
        b = shifts.shape[0]
        window = jax.lax.dynamic_slice(rx, (shifts[0],),
                                       ((b - 1) * step + n,))
        return jnp.stack([jax.lax.slice(window, (i * step,), (i * step + n,))
                          for i in range(b)])
    return jax.vmap(lambda s: jax.lax.dynamic_slice(rx, (s,), (n,)))(shifts)


def _abs_sq(x: jnp.ndarray) -> jnp.ndarray:
    return x.real * x.real + x.imag * x.imag


def argmax_and_max_last(m: jnp.ndarray):
    """(argmax, max) over the last axis; two-stage reduction for large
    128-aligned rows (direct jnp.argmax over a multi-MiB minor axis measured
    ~1.6x slower on v5e). Tie behavior matches jnp.argmax (first occurrence).
    """
    n = m.shape[-1]
    if n % 128 == 0 and n >= 16384:
        m3 = m.reshape(m.shape[:-1] + (n // 128, 128))
        colmax = jnp.max(m3, axis=-1)
        j = jnp.argmax(colmax, axis=-1)
        rows = jnp.take_along_axis(m3, j[..., None, None], axis=-2)
        k = jnp.argmax(rows[..., 0, :], axis=-1)
        return j * 128 + k, jnp.max(colmax, axis=-1)
    return jnp.argmax(m, axis=-1), jnp.max(m, axis=-1)


def _chunked_map(fn, shifts: jnp.ndarray, batch_size: int,
                 step: int | None = None):
    """Apply ``fn`` (a vmappable function of a shift-chunk array) over shifts
    in static-shape chunks of ``batch_size``, concatenating results.

    The last chunk is padded (with the continued progression when ``step`` is
    given, else by repeating the final shift); padded results are trimmed, so
    one compiled program serves any number of shifts.
    """
    k = shifts.shape[0]
    nchunks = -(-k // batch_size)
    pad = nchunks * batch_size - k
    if step is not None:
        tail = shifts[-1] + step * jnp.arange(1, pad + 1, dtype=shifts.dtype)
    else:
        tail = jnp.broadcast_to(shifts[-1:], (pad,))
    padded = jnp.concatenate([shifts, tail])
    chunks = padded.reshape(nchunks, batch_size)
    out = jax.lax.map(fn, chunks)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((nchunks * batch_size,) + a.shape[2:])[:k], out)


def _uniform_step(shifts) -> int | None:
    """Detect a static arithmetic progression in a host-side shifts array.

    Multi-process global arrays cannot be np.asarray'd (only local shards
    are addressable); the LOCAL shard suffices — shard_map hands each device
    a contiguous block, so a uniform global progression is uniform per
    block, which is all the gather tiers need."""
    try:
        s = np.asarray(shifts)
    except Exception:
        try:
            s = np.asarray(shifts.addressable_shards[0].data)
        except Exception:
            return None
    if s.ndim != 1 or s.size < 2 or not np.issubdtype(s.dtype, np.integer):
        return None if s.size > 1 else 1
    d = np.diff(s)
    if np.all(d == d[0]) and d[0] > 0:
        return int(d[0])
    return None


# ---------------------------------------------------------------------------
# fastXcorr
# ---------------------------------------------------------------------------

# MXU precision for the FFT stages of the peak search (spectrum rel err on
# v5e: bf16 ~1e-2, bf16x3 ~1e-5, f32 ~5e-7); see ops/pallas/fft_peak.py.
_DEFAULT_FFT_MODE = os.environ.get("PDSP_FFT_PRECISION", "bf16")

import logging

_log = logging.getLogger("pydsproutines_tpu.xcorr")


def select_xcorr_path(n: int, rx_len: int, dtype, freqsearch: bool,
                      output_caf: bool, abs_result: bool, batch_size: int,
                      step: int | None, fft_mode: str = _DEFAULT_FFT_MODE,
                      platform: str = "tpu") -> tuple[str, str]:
    """The compile-time routing decision of fast_xcorr, exposed for
    observability (VERDICT: silent fused-path fallbacks). Returns
    (path, reason), where path is one of:

      "dot"        no frequency search: plain sliding dot products
      "caf"        full CAF output: batched plan FFT, no peak fusion
      "fused"      single-kernel Pallas pipeline (modulate -> 2-stage DFT ->
                   |.|^2 -> argmax all in VMEM) — the fast path
      "fused3"     two-kernel three-stage Pallas pipeline for big composite n
                   (e.g. 10M): stage-1 strips -> transposed bf16 HBM scratch
                   -> per-k0 stage-2/3 + peak, no XLA inter-stage round trips
      "planes"     multi-stage bf16-planes pipeline with the fused last-stage
                   peak kernel (big composite n without a lane-exact triple)
      "peak-kernel" chunked gather + fused last-stage Pallas peak kernel
      "permuted"   chunked gather + permuted-spectrum argmax (no Pallas)
      "naive"      jnp.fft.fft fallback (non-viable plan sizes)

    ``reason`` explains why faster paths were skipped. fast_xcorr logs this
    at DEBUG, and at WARNING when a fused plan exists for n but the sweep's
    (batch, step) geometry silently disqualifies it."""
    from pydsproutines_tpu.ops.fft import get_fft_plan

    if not freqsearch:
        return "dot", "freqsearch=False"
    if output_caf:
        return "caf", "full CAF output requested (no peak fusion possible)"
    if platform != "tpu":
        # Pallas tiers are Mosaic-only: on CPU/GPU backends (e.g. the gloo
        # multi-process cluster) route to the pure-XLA formulations. The
        # default platform="tpu" keeps this function's observability
        # contract (what WOULD run on the target hardware); the jitted impl
        # passes its actual backend.
        from pydsproutines_tpu.ops.fft import get_fft_plan as _gp
        plan = _gp(n, str(np.dtype(dtype)))
        reason = f"platform {platform} != tpu: Pallas tiers disabled " \
                 "(pass interpret=True to emulate)"
        return ("permuted" if plan.viable else "naive"), reason
    if not abs_result:
        reason = "abs_result=False keeps complex peaks (no |.|^2 fusion)"
    elif np.dtype(dtype) != np.dtype(np.complex64):
        reason = f"dtype {np.dtype(dtype)} is the parity tier (complex64 " \
                 f"engages the fused kernels)"
    elif n * 1024 < rx_len:
        reason = "window/total ratio too small for the cumsum energy path"
    else:
        reason = ""
    fft_plan = get_fft_plan(n, str(np.dtype(dtype)))
    if not reason:
        if step is not None:
            from pydsproutines_tpu.ops.pallas.fused_xcorr import (
                get_fused_plan)
            plan = get_fused_plan(n, batch_size, step, fft_mode)
            if plan.viable:
                return "fused", ""
            # diagnose why: a viable n whose sweep geometry disqualifies it
            # is the silent-fallback case worth warning about
            from pydsproutines_tpu.ops.fft import best_two_factor
            two = best_two_factor(n)
            if two is not None and n >= 4096:
                halo = (batch_size - 1) * step
                if halo > two[1]:
                    reason = (f"fused plan exists for n={n} but batch*step "
                              f"halo {halo} exceeds n2={two[1]} — reduce "
                              f"batch_size (<= {two[1] // step + 1})")
                else:
                    reason = (f"fused plan for n={n} does not fit VMEM at "
                              f"batch={batch_size}, mode={fft_mode}")
            else:
                reason = f"n={n} has no two-factor split (fused kernel n/a)"
        else:
            reason = "shifts are not a uniform progression"
        if (n >= (1 << 21) and fft_mode in ("bf16", "f32")
                and step is not None):
            # big-n three-stage fused chain: uniform-step sweeps only (the
            # per-shift window is an in-kernel lane roll of one chunk
            # slice), needs a lane-exact factor triple
            from pydsproutines_tpu.ops.pallas.fused_caf3 import get_caf3_plan
            if get_caf3_plan(n, fft_mode).viable:
                return "fused3", reason
            reason += f"; no lane-exact factor triple for n={n}"
        if (fft_plan.viable and len(fft_plan.factors) >= 3
                and fft_mode == "bf16" and fft_plan.peak_viable(fft_mode)):
            return "planes", reason
    if fft_plan.viable and np.dtype(dtype) == np.dtype(np.complex64) \
            and abs_result and fft_plan.peak_viable(fft_mode):
        return "peak-kernel", reason
    if fft_plan.viable:
        return "permuted", reason
    return "naive", (reason + "; " if reason else "") + \
        f"no viable matmul-FFT plan for n={n}"


@functools.partial(
    jax.jit,
    static_argnames=("n", "freqsearch", "output_caf", "abs_result",
                     "batch_size", "step", "fft_mode", "interpret"),
)
def _fast_xcorr_impl(cutout, rx, shifts, *, n, freqsearch, output_caf,
                     abs_result, batch_size, step=None,
                     fft_mode=_DEFAULT_FFT_MODE, interpret=False):
    rdt = real_dtype_for(cutout.dtype)
    cutout_norm_sq = jnp.sum(_abs_sq(cutout)).astype(rdt)
    cutout_norm = jnp.sqrt(cutout_norm_sq)
    cutout_conj = jnp.conj(cutout)
    fft_plan = get_fft_plan(n, str(np.dtype(cutout.dtype)))
    # windowed rx energies from one prefix sum instead of reducing every
    # gathered slice — saves a full pass over the (batch, n) batch. Gated on
    # window/total ratio: the f32 running sum's absolute error scales with
    # the total, so short windows against long captures keep the exact path
    # (relative error ~ eps * rxlen / n).
    use_cumsum = n * 1024 >= rx.shape[-1]
    if use_cumsum:
        power_cumsum = jnp.concatenate([
            jnp.zeros(1, rdt), jnp.cumsum(_abs_sq(rx).astype(rdt))])

    # routing decision shared with select_xcorr_path (the observability
    # surface): every condition below is compile-time static
    exec_platform = "tpu" if interpret else jax.devices()[0].platform
    path, _ = select_xcorr_path(n, int(rx.shape[-1]), cutout.dtype,
                                freqsearch, output_caf, abs_result,
                                batch_size, step, fft_mode,
                                platform=exec_platform)

    def _refine_peak_f32(qf2, bins):
        """bf16 sweeps re-verify the WINNING shift at full precision: the
        spectrum is evaluated EXACTLY at the chosen bin and its +-2
        neighbours by direct tone dots (sum pdt[t] * e^{-2pi i k t / n}),
        and the best value+bin spliced back in. A user thresholding the peak
        QF^2 near the detection margin then sees f32-grade numbers, while
        the sweep keeps bf16 throughput (round-2 review: the bf16 default
        was a silent ~1e-2-relative footgun on peak values). Cost is one
        pass over the winning window (~25 us at n=1M) vs ~0.5 ms for a full
        f32 spectrum-peak recompute. Non-winning elements remain bf16-grade.

        The tone factors over t = m*S + s (S | n, S ~ sqrt(n)) as
        e^{-2pi i k t / n} = B1[m] * B2[s], so the dot is ONE pass over pdt
        reshaped (n/S, S) against a (S, nb) tone block plus an O(n/S)
        contraction — no (nb, n) phase matrix is ever built (it cost ~int32
        mod passes over 5n elements). Phase integers stay overflow-free in
        int32: (k*m*S) mod n = S*((k*m) mod L1) and (k*s) mod n =
        [k1*s + L1*((k2*s) mod S)] mod n with k = k1 + L1*k2, L1 = n/S —
        every product < max(S, L1)^2 < 2^31.
        """
        i = jnp.argmax(qf2)
        s = shifts[i]
        win = jax.lax.dynamic_slice(rx, (s,), (n,))
        pdt = win * cutout_conj
        # S: divisor of n nearest sqrt(n) (host-side; n is static)
        divs = [d for d in range(1, int(np.sqrt(n)) + 1) if n % d == 0]
        S = max(n // divs[-1], divs[-1])
        L1 = n // S                                  # both S, L1 <= ~46341
        k0 = bins[i].astype(jnp.int32)
        nb = 5                                       # bins k0-2 .. k0+2
        ks = (k0 + jnp.arange(-(nb // 2), nb // 2 + 1)) % n   # (nb,)
        k1 = ks % L1
        k2 = ks // L1
        m_idx = jnp.arange(L1, dtype=jnp.int32)
        s_idx = jnp.arange(S, dtype=jnp.int32)
        ang1 = (-2.0 * np.pi / n) * (
            S * ((k1[:, None] * m_idx[None, :]) % L1)).astype(rdt)  # (nb,L1)
        ph2 = (k1[:, None] * s_idx[None, :]
               + L1 * ((k2[:, None] * s_idx[None, :]) % S)) % n
        ang2 = (-2.0 * np.pi / n) * ph2.astype(rdt)              # (nb, S)
        b1r, b1i = jnp.cos(ang1), jnp.sin(ang1)
        b2r, b2i = jnp.cos(ang2), jnp.sin(ang2)
        p2r = jnp.real(pdt).astype(rdt).reshape(L1, S)
        p2i = jnp.imag(pdt).astype(rdt).reshape(L1, S)
        mm = functools.partial(jnp.matmul,
                               precision=jax.lax.Precision.HIGHEST)
        ir = mm(p2r, b2r.T) - mm(p2i, b2i.T)         # (L1, nb)
        ii = mm(p2r, b2i.T) + mm(p2i, b2r.T)
        vr = jnp.sum(b1r.T * ir - b1i.T * ii, axis=0)            # (nb,)
        vi = jnp.sum(b1r.T * ii + b1i.T * ir, axis=0)
        mag = vr * vr + vi * vi
        j = jnp.argmax(mag)
        rns = (power_cumsum[s + n] - power_cumsum[s]) if use_cumsum \
            else jnp.sum(_abs_sq(win)).astype(rdt)
        q = mag[j] / cutout_norm_sq / rns
        return (qf2.at[i].set(q.astype(qf2.dtype)),
                bins.at[i].set(ks[j].astype(jnp.uint32)))

    refine = (freqsearch and not output_caf and abs_result
              and fft_mode == "bf16" and n < 2**31)

    # single-kernel Pallas CAF peak search: the whole modulate -> two-stage
    # DFT -> |.|^2 -> argmax pipeline stays in VMEM; only (max, bin) scalars
    # come back (ops/pallas/fused_xcorr.py). Engages for uniform-step shift
    # sweeps on two-factor sizes at complex64.
    if path == "fused":
        from pydsproutines_tpu.ops.pallas.fused_xcorr import (
            fused_freq_scan_peak, get_fused_plan)
        plan = get_fused_plan(n, batch_size, step, fft_mode)
        k = shifts.shape[0]
        nchunks = -(-k // batch_size)
        # padded tail shifts of the last chunk (and the window build's
        # extra n2-row lookahead) may run past the caller's validated
        # range; cover them explicitly
        rxp = jnp.pad(rx, (0, batch_size * step + plan.n2 + 128))
        maxv, bins = fused_freq_scan_peak(cutout_conj, rxp, shifts[0],
                                          nchunks, plan,
                                          interpret=interpret)
        maxv = maxv.reshape(-1)[:k]
        bins = bins.reshape(-1)[:k]
        rx_norm_sq = power_cumsum[shifts + n] - power_cumsum[shifts]
        out = (maxv / cutout_norm_sq / rx_norm_sq, bins.astype(jnp.uint32))
        return _refine_peak_f32(*out) if refine else out

    # big-n three-stage fused chain (ops/pallas/fused_caf3.py): per shift,
    # kernel A (modulate + stage-1 strips -> transposed bf16 HBM scratch)
    # then kernel B (per-k0 stage-2/3 + |.|^2 + argmax). ~200 MB HBM per
    # 10M shift vs ~480 for the XLA planes path, on 128-aligned matmuls.
    if path == "fused3":
        from pydsproutines_tpu.ops.pallas.fused_caf3 import (
            caf3_chunk_size, caf3_sweep, get_caf3_plan)
        plan3 = get_caf3_plan(n, fft_mode)
        idt = jnp.bfloat16 if plan3.mode == "bf16" else jnp.float32
        k = shifts.shape[0]
        bc = min(caf3_chunk_size(plan3, step), k)
        nchunks = -(-k // bc)
        # one dynamic slice per bc-shift chunk; pad rx to cover the last
        # chunk's span (chunk windows + f2-lane roll halo)
        need = (nchunks * bc - 1) * step + n + plan3.f2 + 8
        rxr3 = jnp.pad(jnp.real(rx).astype(idt),
                       (0, max(0, need - int(rx.shape[-1]))))
        rxi3 = jnp.pad(jnp.imag(rx).astype(idt),
                       (0, max(0, need - int(rx.shape[-1]))))
        ccr3 = jnp.real(cutout_conj).astype(idt)
        cci3 = jnp.imag(cutout_conj).astype(idt)

        def one_chunk(ci):
            return caf3_sweep(rxr3, rxi3, ccr3, cci3,
                              shifts[0] + ci * (bc * step), bc, step,
                              plan3, interpret=interpret)

        pmax, bins = jax.lax.map(one_chunk, jnp.arange(nchunks))
        pmax = pmax.reshape(-1)[:k]
        bins = bins.reshape(-1)[:k]
        if use_cumsum:
            rx_norm_sq = power_cumsum[shifts + n] - power_cumsum[shifts]
        else:
            rx_norm_sq = jax.lax.map(
                lambda s: jnp.sum(_abs_sq(jax.lax.dynamic_slice(
                    rx, (s,), (n,)))).astype(rdt), shifts)
        out = (pmax / cutout_norm_sq / rx_norm_sq, bins)
        return _refine_peak_f32(*out) if refine else out

    # multi-stage plans (big composite n, e.g. 10M = 200*200*250): per-shift
    # planes pipeline. The batched slice gather dominates at this scale
    # (measured 22 of 38 ms per 16-shift chunk on v5e) — with one shift per
    # step the window is a single dynamic_slice and a free reshape. All
    # inter-stage intermediates are stored as bf16 planes (half the HBM
    # traffic; the MXU consumes bf16 in this mode regardless) and the last
    # stage + |.|^2 + argmax fuse in the Pallas kernel.
    if path == "planes":
        # stage matrices + digit twiddle planes stay HOST numpy so they embed
        # as program constants: XLA const-folds the digit-twiddle products
        # once at compile instead of recomputing/re-reading per map step
        # (measured 0.97 ms/shift with device-array mats vs 0.39 embedded at
        # n=1e7 on v5e). All are small since the digit factorization removed
        # the O(n) twiddle matrix. The rx / template planes are pre-cast to
        # bf16 outside the shift map (halves the modulate's HBM reads).
        mats = fft_plan._mats_planes(fft_mode)
        rxr = jnp.real(rx).astype(jnp.bfloat16)
        rxi = jnp.imag(rx).astype(jnp.bfloat16)
        ccr = jnp.real(cutout_conj).astype(jnp.bfloat16)
        cci = jnp.imag(cutout_conj).astype(jnp.bfloat16)

        def one_shift(s):
            xr = jax.lax.dynamic_slice(rxr, (s,), (n,))
            xi = jax.lax.dynamic_slice(rxi, (s,), (n,))
            pr = xr * ccr - xi * cci
            pi = xr * cci + xi * ccr
            pmax, ibin = fft_plan.call_peak_planes(
                pr[None, :], pi[None, :], mode=fft_mode,
                interpret=interpret, mats=mats)
            return pmax[0], ibin[0]

        pmax, bins = jax.lax.map(one_shift, shifts)
        rx_norm_sq = power_cumsum[shifts + n] - power_cumsum[shifts]
        out = (pmax / cutout_norm_sq / rx_norm_sq, bins.astype(jnp.uint32))
        return _refine_peak_f32(*out) if refine else out

    def chunk_fn(chunk):
        if use_cumsum:
            rx_norm_sq = power_cumsum[chunk + n] - power_cumsum[chunk]
            slices = gather_shift_slices(rx, chunk, n, step)
        else:
            slices = gather_shift_slices(rx, chunk, n, step)
            rx_norm_sq = jnp.sum(_abs_sq(slices), axis=-1)
        if not freqsearch:
            # vdot semantics: sum(conj(rx_slice) * cutout)
            prod = jnp.sum(jnp.conj(slices) * cutout, axis=-1)
            if abs_result:
                return _abs_sq(prod) / cutout_norm_sq / rx_norm_sq
            return prod / cutout_norm / jnp.sqrt(rx_norm_sq)
        pdt = slices * cutout_conj
        if output_caf:
            pdtfft = fft_plan(pdt)
            mag_sq = _abs_sq(pdtfft)
            if abs_result:
                return mag_sq / cutout_norm_sq / rx_norm_sq[:, None]
            return pdtfft / cutout_norm / jnp.sqrt(rx_norm_sq)[:, None]
        if path == "peak-kernel":
            # fused Pallas path: twiddle+stage2+|.|^2+argmax in one kernel;
            # the (batch, n) spectrum never round-trips HBM
            pmax, ibin = fft_plan.call_peak(pdt, mode=fft_mode,
                                            interpret=interpret)
            return (pmax / cutout_norm_sq / rx_norm_sq,
                    ibin.astype(jnp.uint32))
        if fft_plan.viable:
            # peak search doesn't need bin order: argmax the permuted
            # spectrum (skips the inter-stage transpose pass) and remap only
            # the winning index through the plan's permutation table
            pdtfft = fft_plan.call_permuted(pdt)
            perm = jnp.asarray(fft_plan.permutation)
        else:
            pdtfft = fft_plan(pdt)
            perm = None
        mag_sq = _abs_sq(pdtfft)
        imax, pmax = argmax_and_max_last(mag_sq)
        imax_true = perm[imax] if perm is not None else imax
        if abs_result:
            return (pmax / cutout_norm_sq / rx_norm_sq,
                    imax_true.astype(jnp.uint32))
        # peak value lives at the *storage* index; report the true bin
        peak = jnp.take_along_axis(pdtfft, imax[:, None], axis=-1)[:, 0]
        return (peak / cutout_norm / jnp.sqrt(rx_norm_sq),
                imax_true.astype(jnp.uint32))

    out = _chunked_map(chunk_fn, shifts, batch_size, step)
    if refine and freqsearch and not output_caf and abs_result:
        out = _refine_peak_f32(*out)
    return out


def fast_xcorr(cutout: jnp.ndarray, rx: jnp.ndarray, freqsearch: bool = False,
               output_caf: bool = False, shifts=None, abs_result: bool = True,
               batch_size: int = 128, precision: str | None = None,
               step: int | None = None):
    """Sliding-window normalized xcorr with optional per-shift frequency scan
    (reference fastXcorr, xcorrRoutines.py:460).

    Parameters mirror the reference. Returns:
      * no freqsearch: QF^2 array (or complex QF when ``abs_result=False``)
      * freqsearch, no CAF: (QF^2 array, uint32 peak-frequency bin per shift)
      * freqsearch + output_caf: full (num_shifts, len(cutout)) CAF

    ``batch_size`` controls the static chunk of shifts processed per step of
    the internal ``lax.map`` stream (the reference GPU BATCH loop,
    xcorrRoutines.py:84-151). ``precision`` selects the MXU mode of the
    large-N FFT stages: "bf16" (fastest, spectrum rel err ~1e-2 — peak-search
    grade), "bf16x3" (~1e-5 — parity grade), or "f32" (~5e-7); default from
    $PDSP_FFT_PRECISION, else "bf16". ``step`` declares the shifts' uniform
    stride when calling from INSIDE a jit (traced shifts are host-opaque and
    would silently take the generic-gather tier).

    In the default "bf16" mode, peak searches automatically re-verify the
    WINNING shift in f32 (the peak's QF^2 value and frequency bin are exact
    to f32 grade; other shifts' values stay bf16 ~1e-2-relative). Use
    precision="bf16x3"/"f32" when every element must be parity-grade.
    """
    if cutout.shape[-1] > rx.shape[-1]:
        raise ValueError(
            f"cutout (len {cutout.shape[-1]}) is longer than rx (len {rx.shape[-1]})")
    if shifts is None:
        shifts = jnp.arange(rx.shape[-1] - cutout.shape[-1] + 1)
        step = 1
    if step is None:
        # NOTE: traced shift arrays (calls from inside a jit) cannot be
        # inspected host-side, so the uniform stride is undetectable and the
        # sweep takes the generic tier — declare ``step=`` explicitly there.
        step = _uniform_step(shifts)
    shifts = jnp.asarray(shifts)
    if shifts.shape[0] == 0:
        raise ValueError("shifts must be non-empty")
    try:  # host-side validation when shifts are concrete
        max_shift = int(np.max(np.asarray(shifts)))
        if max_shift + cutout.shape[-1] > rx.shape[-1]:
            raise ValueError(
                f"max shift {max_shift} + cutout length {cutout.shape[-1]} "
                f"exceeds rx length {rx.shape[-1]}")
    except TypeError:
        pass  # traced shifts: caller must guarantee range
    batch_size = int(min(batch_size, shifts.shape[0]))
    path, reason = select_xcorr_path(
        int(cutout.shape[-1]), int(rx.shape[-1]), cutout.dtype,
        bool(freqsearch), bool(output_caf), bool(abs_result), batch_size,
        step, precision or _DEFAULT_FFT_MODE)
    if reason.startswith("fused plan"):
        # a fused plan exists for this n but the sweep geometry silently
        # disqualified it — the one fallback users keep hitting unknowingly
        _log.warning("fast_xcorr n=%d: %s path (%s)",
                     int(cutout.shape[-1]), path, reason)
    else:
        _log.debug("fast_xcorr n=%d: %s path%s", int(cutout.shape[-1]), path,
                   f" ({reason})" if reason else "")
    return _fast_xcorr_impl(
        cutout, rx, shifts, n=cutout.shape[-1], freqsearch=bool(freqsearch),
        output_caf=bool(output_caf), abs_result=bool(abs_result),
        batch_size=batch_size, step=step,
        fft_mode=precision or _DEFAULT_FFT_MODE,
        interpret=jax.devices()[0].platform != "tpu")


# ---------------------------------------------------------------------------
# cztXcorr — frequency scan on an arbitrary CZT grid
# ---------------------------------------------------------------------------

def czt_xcorr(cutout: jnp.ndarray, rx: jnp.ndarray, f_search_min: float,
              f_search_max: float, fs: float, czt_step: float = 0.1,
              output_caf: bool = False, shifts=None, batch_size: int = 128):
    """Sliding xcorr with a CZT fine-frequency scan (reference cztXcorr,
    xcorrRoutines.py:413).

    Returns (caf, f_search) when ``output_caf`` else (complex peak values,
    peak frequency in Hz per shift).
    """
    n = cutout.shape[-1]
    from pydsproutines_tpu.ops.spectral import get_czt_plan
    plan = get_czt_plan(n, float(f_search_min), float(f_search_max),
                        float(czt_step), float(fs), str(jnp.dtype(cutout.dtype)))
    f_search_np = plan.freqs().astype(np.dtype(real_dtype_for(cutout.dtype)))
    if n > rx.shape[-1]:
        raise ValueError(f"cutout (len {n}) is longer than rx (len {rx.shape[-1]})")
    if shifts is None:
        shifts = jnp.arange(rx.shape[-1] - n + 1)
    shifts = jnp.asarray(shifts)
    if shifts.shape[0] == 0:
        raise ValueError("shifts must be non-empty")
    batch_size = int(min(batch_size, shifts.shape[0]))

    out = _czt_xcorr_fn(plan, f_search_np, bool(output_caf),
                        batch_size)(cutout, rx, shifts)
    if output_caf:
        return out, jnp.asarray(f_search_np)
    return out


def _czt_xcorr_fn(plan: CZT, f_search_np: np.ndarray, output_caf: bool,
                  batch_size: int):
    """Per-plan jitted sweep closure; the complex chirp constants are embedded
    as program constants (axon transport cannot move complex arrays)."""
    key = ("xc", output_caf, batch_size)
    fn = plan.__dict__.setdefault("_xc_fns", {}).get(key)
    if fn is not None:
        return fn
    aa, fv, ww_tail = plan.aa, plan.fv, plan.ww_tail
    n, k, nfft = plan.m, plan.k, plan.nfft

    def _impl(cutout, rx, shifts):
        rdt = real_dtype_for(cutout.dtype)
        cutout_norm_sq = jnp.sum(_abs_sq(cutout)).astype(rdt)
        cutout_norm = jnp.sqrt(cutout_norm_sq)
        cutout_conj = jnp.conj(cutout)

        def czt_rows(pdt):
            fy = jnp.fft.fft(pdt * aa, n=nfft, axis=-1)
            g = jnp.fft.ifft(fy * fv, axis=-1)
            return g[..., n - 1: n + k - 1] * ww_tail

        def chunk_fn(chunk):
            slices = gather_shift_slices(rx, chunk, n)
            rx_norm_sq = jnp.sum(_abs_sq(slices), axis=-1)
            pdtczt = czt_rows(slices * cutout_conj)
            mag = _abs_sq(pdtczt)
            if output_caf:
                return mag / rx_norm_sq[:, None] / cutout_norm_sq
            mi = jnp.argmax(mag, axis=-1)
            peak = jnp.take_along_axis(pdtczt, mi[:, None], axis=-1)[:, 0]
            result = peak / jnp.sqrt(rx_norm_sq) / cutout_norm
            return result, jnp.asarray(f_search_np)[mi]

        return _chunked_map(chunk_fn, shifts, batch_size)

    fn = plan._xc_fns.setdefault(key, jax.jit(_impl))
    return fn


# ---------------------------------------------------------------------------
# Fine time/frequency refinement
# ---------------------------------------------------------------------------

def make_time_scan_steervec(td_scan_range: jnp.ndarray, fs: float,
                            siglen: int, dtype=jnp.complex64) -> jnp.ndarray:
    """Steering-vector matrix exp(1j*2*pi*f*td) over the FFT frequency axis
    (reference makeTimeScanSteervec, xcorrRoutines.py:670)."""
    rdt = real_dtype_for(dtype)
    f = make_freq(siglen, fs, dtype=rdt)
    td = jnp.asarray(td_scan_range, dtype=rdt)
    return jnp.exp(1j * 2 * jnp.pi * f[None, :] * td[:, None]).astype(dtype)


def fine_freq_time_search(x_aligned: jnp.ndarray, y_aligned: jnp.ndarray,
                          fine_res, freqfound: float, freq_res: float,
                          fs: float, td_scan_range, steeringvec=None,
                          td_scan_freq_bounds=None):
    """Two-pass fine frequency then sub-sample time alignment (reference
    fineFreqTimeSearch, xcorrRoutines.py:583).

    Convention: positive timediff means y_aligned is LATER than x_aligned.
    Returns (fine_freq_found, timediff, cost_vec).
    """
    n = x_aligned.shape[-1]
    rdt = real_dtype_for(x_aligned.dtype)
    cdt = x_aligned.dtype
    nn = jnp.arange(n, dtype=rdt)
    freqfound = jnp.asarray(freqfound, dtype=rdt)

    fine_res = list(np.atleast_1d(fine_res)) if fine_res is not None else []
    fine_freq_found = None
    if len(fine_res) > 0:
        precomputed = jnp.conj(y_aligned) * x_aligned
        best_shift = jnp.ones(n, dtype=cdt)
        for res in fine_res:
            num = int(np.ceil(2.0 * freq_res / res))
            offsets = jnp.arange(num, dtype=rdt) * res - freq_res
            fine_freqs = freqfound + offsets
            # fineshifts[j] = exp(-1j*2*pi*f_j*n/fs); pp[j] = vdot(precomputed, shift_j)
            shifts_mat = jnp.exp(
                (-1j * 2 * jnp.pi / fs) * fine_freqs[:, None] * nn[None, :]
            ).astype(cdt)
            pp = shifts_mat @ jnp.conj(precomputed)
            i = jnp.argmax(jnp.abs(pp))
            freqfound = fine_freqs[i]
            best_shift = shifts_mat[i]
        fine_freq_found = freqfound
        # Align x to y's tone: y*conj(x) ~ e^{j*2*pi*fhat*t}, so x needs
        # e^{+j*2*pi*fhat*t} = conj(best_shift). (Deviation from the literal
        # reference, which multiplies by best_shift itself — xcorrRoutines.py
        # :637 — doubling the tone mismatch and biasing the subsequent
        # sub-sample delay; verified against scenes with known Doppler+tau.)
        x_aligned = x_aligned * jnp.conj(best_shift)

    if steeringvec is None:
        steeringvec = make_time_scan_steervec(td_scan_range, fs, n, dtype=cdt)
    td_scan_range = jnp.asarray(td_scan_range)

    x_fft = jnp.fft.fft(x_aligned)
    y_fft = jnp.fft.fft(y_aligned)
    rx_vec = x_fft * jnp.conj(y_fft)
    if td_scan_freq_bounds is not None:
        fvec = make_freq(n, fs, dtype=rdt)
        mask = (fvec >= td_scan_freq_bounds[0]) & (fvec < td_scan_freq_bounds[1])
        rx_vec = jnp.where(mask, rx_vec, 0)
    cost_vec = (steeringvec.conj() @ rx_vec) / jnp.linalg.norm(x_fft) / jnp.linalg.norm(y_fft)
    idx_td = jnp.argmax(jnp.abs(cost_vec))
    timediff = td_scan_range[idx_td]
    return fine_freq_found, timediff, cost_vec


class GenXcorr:
    """Cached steering-vector fine time-offset estimator (reference GenXcorr,
    xcorrRoutines.py:679)."""

    def __init__(self, td_scan_range, fs: float, siglen: int, dtype=jnp.complex64):
        self.td_scan_range = jnp.asarray(td_scan_range)
        self.fs = fs
        self.siglen = siglen
        self.steeringvec = make_time_scan_steervec(td_scan_range, fs, siglen, dtype)
        self.td_scan_freq_bounds = None

    def set_td_scan_freq_bounds(self, bounds):
        self.td_scan_freq_bounds = bounds

    def xcorr(self, x: jnp.ndarray, y: jnp.ndarray):
        _, timediff, cost_vec = fine_freq_time_search(
            x, y, [], 0.0, 0.0, self.fs, self.td_scan_range,
            steeringvec=self.steeringvec,
            td_scan_freq_bounds=self.td_scan_freq_bounds)
        return timediff, cost_vec


# ---------------------------------------------------------------------------
# QF^2 / SNR conversions and accuracy bounds (Stein)
# ---------------------------------------------------------------------------

def calc_qf2(x: jnp.ndarray, y: jnp.ndarray):
    """QF^2 of two aligned equal-length arrays; row-wise for 2-D inputs
    (reference calcQF2, xcorrRoutines.py:833)."""
    if x.ndim == 1:
        xe = jnp.sum(_abs_sq(x))
        ye = jnp.sum(_abs_sq(y))
        return _abs_sq(jnp.vdot(x, y)) / xe / ye
    xe = jnp.sum(_abs_sq(x), axis=1)
    ye = jnp.sum(_abs_sq(y), axis=1)
    return _abs_sq(jnp.sum(x * jnp.conj(y), axis=1)) / xe / ye


def convert_qf2_to_snr(qf2):
    """For xcorr against a pure (noiseless) template."""
    return qf2 / (1.0 - qf2)


def convert_qf2_to_eff_snr(qf2):
    """For xcorr of two noisy signals."""
    return 2.0 * qf2 / (1.0 - qf2)


def convert_eff_snr_to_qf2(eff_snr):
    return eff_snr / (2.0 + eff_snr)


def expected_eff_snr(snr1, snr2=np.inf, osr: float = 1):
    """Stein's effective SNR 1/(0.5*(1/y1 + 1/y2 + 1/(y1*y2))), scaled by OSR
    (reference expectedEffSNR, xcorrRoutines.py:738)."""
    y = 1.0 / (0.5 * (1.0 / snr1 + 1.0 / snr2 + 1.0 / (snr1 * snr2)))
    return y / osr


def sigma_dto(signal_bw, noise_bw, integ_time, eff_snr):
    """Stein DTO standard deviation (xcorrRoutines.py:758)."""
    beta = np.pi / np.sqrt(3.0) * signal_bw
    return 1.0 / beta / np.sqrt(noise_bw * integ_time * eff_snr)


def sigma_dfo(noise_bw, integ_time, eff_snr):
    """Stein DFO standard deviation (xcorrRoutines.py:767)."""
    return 0.55 / integ_time / np.sqrt(noise_bw * integ_time * eff_snr)


def theoretical_multi_peak(start_idx1, start_idx2, snr_linear_1=None,
                           snr_linear_2=None):
    """Expected xcorr peak offsets (and effective SNRs) from multiple signal
    copies in two receivers (reference theoreticalMultiPeak,
    xcorrRoutines.py:775). Host-side numpy (dynamic unique)."""
    start_idx1 = np.asarray(start_idx1)
    start_idx2 = np.asarray(start_idx2)
    mat = start_idx2[:, None] - start_idx1[None, :]
    if snr_linear_1 is None and snr_linear_2 is None:
        return np.unique(mat.flatten())
    snr_linear_2 = np.asarray(snr_linear_2)
    tmp = 0.5 * (1.0 / snr_linear_1 + 1.0 / snr_linear_2[:, None]
                 + 1.0 / (snr_linear_1 * snr_linear_2[:, None]))
    eff = np.broadcast_to(1.0 / tmp, mat.shape)
    u, indices = np.unique(mat.flatten(), return_index=True)
    return u, eff.flatten()[indices]


def argmax2d(m: jnp.ndarray):
    """2-D indices of the matrix maximum (reference argmax2d,
    xcorrRoutines.py:815)."""
    idx = jnp.argmax(m)
    return jnp.unravel_index(idx, m.shape)


def compute_fast_xcorr_complexity(n, k=1):
    """Operation-count model of the freq-scanning sliding xcorr — K shifts,
    one length-N FFT each (reference computeFastXcorrComplexity,
    xcorrRoutines.py:2084)."""
    return k * n * np.log2(n)


def compute_group_xcorr_czt_complexity(m, group_len, czt_points, k=1):
    """Operation-count model of the CZT group xcorr — K shifts x m groups,
    each a Bluestein CZT costing two FFTs of the next fast length covering
    group_len + czt_points (reference computeGroupXcorrCZTcomplexity,
    xcorrRoutines.py:2099)."""
    from pydsproutines_tpu.utils.fftlen import next_fast_len
    lc = next_fast_len(int(group_len + czt_points))
    return k * m * 2 * lc * np.log2(lc)
