"""MXU-friendly FFTs: the four-step (Bailey) matmul DFT.

XLA's TPU FFT is far from the HBM roofline for large 1-D transforms (measured
on v5e: 90 ms for 16 x 1e6-point complex64, 22 ms for 16 x 2^20). Decomposing
an N = N1*N2 transform into batched (N1 x N1) and (N2 x N2) DFT matrix
multiplies + a twiddle puts the work on the MXU instead: measured 11 ms for
the same 16 x 2^20 batch — and it handles *any* composite N exactly (the
reference's CUDA path relies on cuFFT for arbitrary 7-smooth sizes;
/root/reference/benchmarks/README.md sizes are 1e6 = 1000*1000).

Derivation (n = n1*N2 + n2, k = k2*N1 + k1):
    X[k2*N1 + k1] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    sum_{n1} x[n1*N2 + n2] W_{N1}^{n1 k1}
i.e. reshape -> DFT over n1 (matmul) -> twiddle -> DFT over n2 (matmul) ->
transpose-flatten. Both matmuls batch over all rows at once.

The DFT/twiddle matrices are built on the host in float64 phase (mod 2*pi)
and stored complex64, as plan state (numpy, so jit embeds them as constants —
device-resident complex constants can't round-trip on the axon transport).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def best_two_factor(n: int, max_factor: int = 8192) -> tuple[int, int] | None:
    """Factor n = n1*n2 with n1 <= n2, n1 as close to sqrt(n) as possible.
    Returns None if no factorization fits under max_factor (e.g. primes)."""
    for n1 in range(int(math.isqrt(n)), 1, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= max_factor and n2 <= max_factor:
                return n1, n2
            return None
    return None


def factorize_for_mxu(n: int, max_factor: int = 1024,
                      min_factor: int = 16) -> list[int] | None:
    """Factor n into stage sizes for the matmul FFT. Total matmul FLOPs scale
    with N * sum(factors), so more, smaller factors are cheaper — bounded
    below by MXU tile efficiency (~128). Greedy: aim for ceil(log_512 n)
    stages of size ~n^(1/k), picking the divisor closest to target each step.
    Returns None when n has a prime factor > max_factor."""
    if n < 2:
        return None
    k = max(1, math.ceil(math.log(n) / math.log(512)))
    factors: list[int] = []
    rem = n
    while rem > max_factor:
        stages_left = max(2, k - len(factors))
        target = rem ** (1.0 / stages_left)
        best = None
        for d in range(2, max_factor + 1):
            if rem % d == 0 and d >= min_factor:
                if best is None or abs(d - target) < abs(best - target):
                    best = d
        if best is None:
            # no divisor in [min_factor, max_factor]: try any divisor >= 2
            for d in range(2, max_factor + 1):
                if rem % d == 0:
                    best = d
                    break
            if best is None:
                return None  # prime factor > max_factor
        factors.append(best)
        rem //= best
    factors.append(rem)
    return factors


def _dft_matrix(n: int, dtype=np.complex64) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    phase = np.mod(np.outer(k, k), n) * (2.0 * np.pi / n)
    return np.exp(-1j * phase).astype(dtype)


# On-device generation for big plans. Host-numpy stage matrices embed in the
# compiled program as constants, which breaks the remote-compile transport
# above ~10^7-point plans (HTTP 413 at n=1e7: ~240 MB of constants). Building
# them in-trace costs ~sum(ni^2 + n) transcendentals per call (sub-ms) and
# keeps the program tiny. Phase via exact int32 products (max factor 8192 ->
# products < 2^31) matches the host float64-mod construction to f32 rounding.

def _dft_matrix_dev(n: int) -> jnp.ndarray:
    k = jnp.arange(n, dtype=jnp.int32)
    m = (k[:, None] * k[None, :]) % n
    ph = m.astype(jnp.float32) * np.float32(-2.0 * np.pi / n)
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def _twiddle_dev(n1: int, rest: int, m: int) -> jnp.ndarray:
    k1 = jnp.arange(n1, dtype=jnp.int32)
    j = jnp.arange(rest, dtype=jnp.int32)
    mm = (k1[:, None] * j[None, :]) % m
    ph = mm.astype(jnp.float32) * np.float32(-2.0 * np.pi / m)
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def _dft_planes_dev(n: int):
    """(cos, sin) float32 planes of the n-point DFT matrix, built in-trace."""
    k = jnp.arange(n, dtype=jnp.int32)
    m = (k[:, None] * k[None, :]) % n
    ph = m.astype(jnp.float32) * np.float32(-2.0 * np.pi / n)
    return jnp.cos(ph), jnp.sin(ph)


def _twiddle_planes_dev(n1: int, rest: int, m: int):
    k1 = jnp.arange(n1, dtype=jnp.int32)
    j = jnp.arange(rest, dtype=jnp.int32)
    mm = (k1[:, None] * j[None, :]) % m
    ph = mm.astype(jnp.float32) * np.float32(-2.0 * np.pi / m)
    return jnp.cos(ph), jnp.sin(ph)


def _peak_winner(pmax, inner, rows: int, factors, lead):
    """Reduce the fused last-stage kernel's per-leading-digit-row winners to
    one (peak, true bin) per transform. Row-major (k0, ..., k_{L-3})
    flattening == permuted (k0-major) order, so first-occurrence argmax
    matches call_permuted tie-breaks. True bin reconstruction:
    k = k0 + f0*(k1 + f1*(... + f_{L-3} * inner_bin))."""
    if rows == 1:
        return pmax.reshape(lead), inner.reshape(lead)
    pmax = pmax.reshape((-1, rows))
    inner = inner.reshape((-1, rows))
    r_star = jnp.argmax(pmax, axis=-1)
    peak = jnp.take_along_axis(pmax, r_star[:, None], axis=-1)[:, 0]
    ib = jnp.take_along_axis(inner, r_star[:, None], axis=-1)[:, 0]
    true_bin = ib.astype(jnp.int32)
    rem = r_star.astype(jnp.int32)
    strides = []
    acc = 1
    for f in factors[1:-2][::-1]:
        acc *= f
        strides.append(acc)
    strides = strides[::-1] + [1]
    digits = []
    for f, st in zip(factors[:-2], strides):
        digits.append((rem // st) % f)
    for f, d in zip(factors[:-2][::-1], digits[::-1]):
        true_bin = d.astype(jnp.int32) + np.int32(f) * true_bin
    return peak.reshape(lead), true_bin.reshape(lead)


class FourStepFFT:
    """Plan for an exact N-point DFT via matmul stages (Cooley-Tukey with
    large mixed radices: N = n1*n2*...*nk, each stage a batched DFT-matrix
    multiply + twiddle).

    ``__call__`` matches jnp.fft.fft along the last axis for any leading batch
    shape. Check ``plan.viable`` before relying on it; fall back to
    jnp.fft.fft otherwise (prime or huge-factor N).
    """

    def __init__(self, n: int, dtype=jnp.complex64, max_factor: int = 8192,
                 factors: list[int] | None = None):
        self.n = int(n)
        self.dtype = np.dtype(dtype)
        if factors is None:
            # Up to ~2M points, two balanced factors measured fastest on v5e:
            # the kernel is HBM-bound there, so fewer passes beat the
            # matmul-FLOP savings of deeper factorizations (3-stage measured
            # 1.3x slower at n=1e6 despite 6x fewer FLOPs). Past that the
            # FLOP term (~n * sum(factors)) dominates — a 10M-point two-factor
            # plan spends 6325 MACs/sample vs ~650 for three stages — so big
            # sizes go multi-stage.
            two = best_two_factor(self.n, max_factor)
            if two is not None and sum(two) <= 3000:
                factors = list(two)
            else:
                multi = factorize_for_mxu(self.n, max_factor=1024)
                if multi is not None and (two is None or
                                          sum(multi) < sum(two)):
                    factors = multi
                else:
                    factors = list(two) if two is not None else None
        self.viable = factors is not None and self.n >= 4096 \
            and len(factors) >= 2
        if not self.viable and 128 <= self.n < 4096:
            # small-n single-stage tier (round 5): one (n, n) DFT-matrix
            # multiply rides the MXU where XLA's TPU FFT is launch-bound
            # (the receiver pipeline's n=1024 per-channel xcorr fell to
            # jnp.fft.fft). Output order is natural; permutation=identity.
            factors = [self.n]
            self.viable = True
        if not self.viable:
            self.factors = None
            return
        self.factors = factors
        # embedded host constants vs on-device generation: constants avoid
        # per-call regeneration, but above ~48 MB they break the remote
        # compile transport (and bloat every program). complex128 plans are
        # the CPU parity tier and always embed.
        const_bytes = self.dtype.itemsize * (
            sum(f * f for f in factors)
            + sum(self.n // int(np.prod(factors[:s]))
                  for s in range(len(factors) - 1)))
        self.device_gen = (const_bytes > 48 * 1024 * 1024
                           and self.dtype == np.dtype(np.complex64))
        if self.device_gen:
            self.stage_w = self.stage_tw = None
            return
        # per-stage DFT matrices and twiddles: at stage s with current
        # transform length m = prod(factors[s:]) split as n1 x rest,
        # TW[k1, j] = exp(-2j*pi*k1*j/m), j in [0, rest)
        self.stage_w: list[np.ndarray] = []
        self.stage_tw: list[np.ndarray] = []
        m = self.n
        for s, n1 in enumerate(factors[:-1]):
            rest = m // n1
            self.stage_w.append(_dft_matrix(n1, self.dtype))
            k1 = np.arange(n1, dtype=np.float64)
            j = np.arange(rest, dtype=np.float64)
            phase = np.mod(np.outer(k1, j), m) * (2.0 * np.pi / m)
            self.stage_tw.append(np.exp(-1j * phase).astype(self.dtype))
            m = rest
        self.stage_w.append(_dft_matrix(factors[-1], self.dtype))

    def _mats(self):
        """Stage matrices for use inside a trace: host constants, or
        generated on device for big plans."""
        if not self.device_gen:
            return self.stage_w, self.stage_tw
        w, tw = [], []
        m = self.n
        for n1 in self.factors[:-1]:
            rest = m // n1
            w.append(_dft_matrix_dev(n1))
            tw.append(_twiddle_dev(n1, rest, m))
            m = rest
        w.append(_dft_matrix_dev(self.factors[-1]))
        return w, tw

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.viable:
            return jnp.fft.fft(x, axis=-1)
        if not hasattr(self, "_fn"):
            factors = tuple(self.factors)
            # closure over host numpy stage matrices embeds them as program
            # constants (no per-call transfer; complex device constants can't
            # round-trip on the axon transport anyway); big plans instead
            # generate the matrices in-trace (see _mats)
            self._fn = jax.jit(
                lambda xx: _matmul_fft_stage(xx, factors, *self._mats(), 0))
        return self._fn(x)

    # -- permuted-output path: skips every inter-stage output transpose.
    # Bin k of the true spectrum sits at permuted position j with
    # k = permutation[j]; peak searches argmax the permuted spectrum and remap
    # the one winning index, saving a full HBM transpose pass per batch.

    def call_permuted(self, x: jnp.ndarray) -> jnp.ndarray:
        """DFT with digit-reversed output order (see ``permutation``)."""
        if not self.viable:
            return jnp.fft.fft(x, axis=-1)
        if not hasattr(self, "_fn_perm"):
            factors = tuple(self.factors)
            self._fn_perm = jax.jit(
                lambda xx: _matmul_fft_stage_permuted(
                    xx, factors, *self._mats(), 0))
        return self._fn_perm(x)

    @property
    def permutation(self) -> np.ndarray:
        """int32 host array: true bin index for each call_permuted position."""
        if not hasattr(self, "_perm"):
            self._perm = _fft_output_perm(self.factors).astype(np.int32)
        return self._perm

    # -- fused peak path: twiddle+final-stage+|.|^2+argmax in one Pallas
    # kernel, so the (batch, N) spectrum never round-trips HBM. Only the
    # winning (magnitude^2, bin) per transform comes back. Works for any
    # plan depth: stages 0..L-2 run as XLA einsums (permuted layout, no
    # transposes); the Pallas kernel absorbs the last twiddle + last-stage
    # matmul + magnitude + argmax, then a tiny XLA argmax picks the winner
    # across the leading-digit rows.

    def _peak_consts(self):
        """Host-side constants for the fused last-stage kernel: the
        (f_{L-2}, f_{L-1}) twiddle of the innermost two-factor split and the
        f_{L-1}-point DFT matrix. Small even when the plan itself is
        device-generated, so they are always built host-side."""
        if not hasattr(self, "_pk"):
            k1, j = self.factors[-2], self.factors[-1]
            m = k1 * j
            a = np.arange(k1, dtype=np.float64)
            bb = np.arange(j, dtype=np.float64)
            phase = np.mod(np.outer(a, bb), m) * (2.0 * np.pi / m)
            tw = np.exp(-1j * phase).astype(np.complex64)
            self._pk = (tw, _dft_matrix(j, np.complex64))
        return self._pk

    def peak_viable(self, mode: str = "bf16") -> bool:
        """True when call_peak can run: the innermost two factors' twiddle +
        stage matrix + row tiles fit the VMEM budget of the fused kernel."""
        if not self.viable or len(self.factors) < 2:
            return False
        from pydsproutines_tpu.ops.pallas.fft_peak import pick_row_tile
        k1, j = self.factors[-2], self.factors[-1]
        return pick_row_tile(k1, j, j, mode) is not None

    def call_peak(self, x: jnp.ndarray, mode: str = "bf16",
                  interpret: bool = False):
        """(peak |X[k]|^2, argmax bin k) over the DFT of each row of x,
        without materializing the spectrum. ``mode`` selects MXU precision
        ("bf16" ~1e-2 spectrum rel err / "bf16x3" ~1e-5 / "f32" ~5e-7).
        Tie semantics match argmax over the call_permuted layout.
        """
        from pydsproutines_tpu.ops.pallas.fft_peak import stage2_caf_peak
        factors = self.factors
        nstages = len(factors)
        prec = {"bf16": jax.lax.Precision.DEFAULT,
                "bf16x3": jax.lax.Precision.HIGH,
                "f32": jax.lax.Precision.HIGHEST}[mode]
        lead = x.shape[:-1]
        stage_w, stage_tw = self._mats()
        cur = x.reshape((-1, self.n))
        m = self.n
        # stages 0..L-3 with twiddles; stage L-2's einsum without its twiddle
        # (the kernel applies it)
        for s in range(nstages - 1):
            n1 = factors[s]
            rest = m // n1
            cur = cur.reshape(cur.shape[:-1] + (n1, rest))
            cur = jnp.einsum("kn,...nm->...km", jnp.asarray(stage_w[s]), cur,
                             precision=prec)
            if s < nstages - 2:
                cur = cur * jnp.asarray(stage_tw[s])
                m = rest
        # cur: (B, f0, ..., f_{L-3}, K1=f_{L-2}, J=f_{L-1})
        rows = 1
        for f in factors[:-2]:
            rows *= f
        tw_last, w_last = self._peak_consts()
        pmax, inner = stage2_caf_peak(
            cur.reshape((-1, factors[-2], factors[-1])), tw_last, w_last,
            factors[-2], mode=mode, interpret=interpret)
        return _peak_winner(pmax, inner, rows, factors, lead)

    def call_peak_planes(self, xr: jnp.ndarray, xi: jnp.ndarray,
                         mode: str = "bf16", interpret: bool = False,
                         mats=None):
        """As call_peak but over separate real/imag float32 planes (..., n).

        In "bf16" mode every inter-stage intermediate (and the stage
        matrices) is stored as bfloat16 planes: half the HBM traffic of the
        complex64 path at the same MXU math — the stage matmuls consume bf16
        regardless — with peak-search-grade accuracy (~1e-2 spectrum rel
        err). "f32" stores float32 planes with Precision.HIGHEST matmuls.
        ("bf16x3" is not offered here; use call_peak.)
        """
        from pydsproutines_tpu.ops.pallas.fft_peak import (
            stage2_caf_peak_planes)
        if mode not in ("bf16", "f32"):
            raise ValueError("call_peak_planes supports bf16/f32 only")
        factors = self.factors
        nstages = len(factors)
        store = jnp.bfloat16 if mode == "bf16" else jnp.float32
        prec = (jax.lax.Precision.HIGHEST if mode == "f32"
                else jax.lax.Precision.DEFAULT)
        ein = functools.partial(jnp.einsum, precision=prec,
                                preferred_element_type=jnp.float32)
        lead = xr.shape[:-1]
        cr = xr.reshape((-1, self.n)).astype(store)
        ci = xi.reshape((-1, self.n)).astype(store)
        # mats may be precomputed by the caller and closed over OUTSIDE a
        # lax.map/scan body: device-generated planes are loop-variant-looking
        # to XLA otherwise and get rebuilt every iteration (measured +0.7
        # ms/shift at n=1e7 on v5e)
        wr_l, wi_l, tw_digits = (mats if mats is not None
                                 else self._mats_planes(mode))
        m = self.n
        for s in range(nstages - 1):
            n1 = factors[s]
            rest = m // n1
            cr = cr.reshape(cr.shape[:-1] + (n1, rest))
            ci = ci.reshape(ci.shape[:-1] + (n1, rest))
            wr, wi = jnp.asarray(wr_l[s]), jnp.asarray(wi_l[s])
            fr = ein("kn,...nm->...km", wr, cr) \
                - ein("kn,...nm->...km", wi, ci)
            fi = ein("kn,...nm->...km", wr, ci) \
                + ein("kn,...nm->...km", wi, cr)
            if s < nstages - 2:
                # digit-factored twiddle: TW[k, j] with j = sum_d q_d*str_d
                # splits EXACTLY into prod_d A_d[k, q_d] of tiny (n1, f_d)
                # planes — the O(n1*rest) twiddle matrix is never read from
                # HBM (it cost ~40 MB/shift at n=1e7; measured 1.21 ->
                # 0.62 ms/shift on v5e). XLA fuses the broadcast product
                # into the multiply epilogue.
                digits = tuple(factors[s + 1:])
                frd = fr.reshape(fr.shape[:-1] + digits)
                fid = fi.reshape(fi.shape[:-1] + digits)
                twr = twi = None
                for d, (ar_h, ai_h) in enumerate(tw_digits[s]):
                    bshape = (n1,) + tuple(
                        digits[d] if i == d else 1
                        for i in range(len(digits)))
                    ar = jnp.asarray(ar_h).reshape(bshape)
                    ai = jnp.asarray(ai_h).reshape(bshape)
                    if twr is None:
                        twr, twi = ar, ai
                    else:
                        twr, twi = (twr * ar - twi * ai,
                                    twr * ai + twi * ar)
                cr = (frd * twr - fid * twi).astype(store).reshape(fr.shape)
                ci = (frd * twi + fid * twr).astype(store).reshape(fi.shape)
                m = rest
            else:
                cr, ci = fr.astype(store), fi.astype(store)
        rows = 1
        for f in factors[:-2]:
            rows *= f
        tw_last, w_last = self._peak_consts()
        pmax, inner = stage2_caf_peak_planes(
            cr.reshape((-1, factors[-2], factors[-1])),
            ci.reshape((-1, factors[-2], factors[-1])),
            tw_last, w_last, factors[-2], mode=mode, interpret=interpret)
        return _peak_winner(pmax, inner, rows, factors, lead)

    def _twiddle_digit_planes(self, s: int) -> list:
        """Digit factors of stage ``s``'s twiddle: TW[k, j] =
        exp(-2j*pi*k*j/m) over j in [0, rest) splits exactly into
        prod_d A_d[k, q_d] with A_d[k, q] = exp(-2j*pi*k*q*stride_d/m),
        j = sum_d q_d * stride_d over the remaining-factor digits — every
        A_d is a tiny (n1, f_d) pair of float32 planes, so the O(n1*rest)
        twiddle matrix never exists. Host-built (float64 phase mod 2*pi)."""
        factors = self.factors
        n1 = factors[s]
        m = self.n
        for f in factors[:s]:
            m //= f
        digits = factors[s + 1:]
        strides = []
        acc = 1
        for f in digits[::-1]:
            strides.append(acc)
            acc *= f
        strides = strides[::-1]
        k = np.arange(n1, dtype=np.float64)
        out = []
        for f, st in zip(digits, strides):
            q = np.arange(f, dtype=np.float64)
            ph = np.mod(np.outer(k, q * st), m) * (2.0 * np.pi / m)
            a = np.exp(-1j * ph)
            out.append((a.real.astype(np.float32),
                        a.imag.astype(np.float32)))
        return out

    def _mats_planes(self, mode: str):
        """Per-stage DFT-matrix planes plus digit-factored twiddle planes
        (wr list, wi list, tw_digits list-of-lists). Stage matrices are
        stored at the mode's storage dtype (bf16 for "bf16" — the MXU
        consumes bf16 regardless); twiddle digit planes stay float32 (they
        multiply float32 stage outputs and are tiny). Host-built always —
        the digit factorization removes the big constants that forced
        device-side generation for the twiddles; the stage DFT matrices of
        any viable plan are <= max_factor^2 each."""
        key = ("planes", mode)
        if not hasattr(self, "_planes_cache"):
            self._planes_cache = {}
        if key not in self._planes_cache:
            import ml_dtypes
            wdt = (np.dtype(ml_dtypes.bfloat16) if mode == "bf16"
                   else np.dtype(np.float32))
            if self.stage_w is not None:
                stage_w = self.stage_w
            else:
                stage_w = [_dft_matrix(f, np.complex64) for f in self.factors]
            wr = [w.real.astype(wdt) for w in stage_w]
            wi = [w.imag.astype(wdt) for w in stage_w]
            tw_digits = [self._twiddle_digit_planes(s)
                         for s in range(len(self.factors) - 1)]
            self._planes_cache[key] = (wr, wi, tw_digits)
        return self._planes_cache[key]


def _matmul_fft_stage(x, factors, stage_w, stage_tw, s):
    """Recursive stage: DFT of length prod(factors[s:]) along the last axis.
    Output in natural order."""
    n1 = factors[s]
    if s == len(factors) - 1:
        return jnp.einsum("kn,...n->...k", stage_w[s], x)
    m = x.shape[-1]
    rest = m // n1
    b = x.reshape(x.shape[:-1] + (n1, rest))
    f1 = jnp.einsum("kn,...nm->...km", stage_w[s], b)   # [..., k1, j]
    g = f1 * stage_tw[s]
    r = _matmul_fft_stage(g, factors, stage_w, stage_tw, s + 1)  # [..., k1, krest]
    # X[k1 + n1*krest] -> krest-major flatten
    return jnp.swapaxes(r, -1, -2).reshape(x.shape[:-1] + (m,))


def _matmul_fft_stage_permuted(x, factors, stage_w, stage_tw, s):
    """As _matmul_fft_stage but flattening k1-major (no transposes): position
    (k1, j) holds true bin k1 + n1 * perm_rest[j]."""
    n1 = factors[s]
    if s == len(factors) - 1:
        return jnp.einsum("kn,...n->...k", stage_w[s], x)
    m = x.shape[-1]
    rest = m // n1
    b = x.reshape(x.shape[:-1] + (n1, rest))
    f1 = jnp.einsum("kn,...nm->...km", stage_w[s], b)
    g = f1 * stage_tw[s]
    r = _matmul_fft_stage_permuted(g, factors, stage_w, stage_tw, s + 1)
    return r.reshape(x.shape[:-1] + (m,))


def _fft_output_perm(factors) -> np.ndarray:
    """True-bin index per permuted position for _matmul_fft_stage_permuted."""
    if len(factors) == 1:
        return np.arange(factors[0], dtype=np.int64)
    n1 = factors[0]
    inner = _fft_output_perm(factors[1:])
    return (np.arange(n1, dtype=np.int64)[:, None]
            + n1 * inner[None, :]).reshape(-1)




@functools.lru_cache(maxsize=64)
def get_fft_plan(n: int, dtype_str: str = "complex64") -> FourStepFFT:
    """Cached plan lookup; plans are tiny handles over host matrices."""
    return FourStepFFT(n, dtype=np.dtype(dtype_str))


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Drop-in jnp.fft.fft along ``axis`` that routes large composite sizes
    through the four-step MXU path."""
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        out = fft(x, -1)
        return jnp.moveaxis(out, -1, axis)
    plan = get_fft_plan(int(x.shape[-1]),
                        "complex128" if x.dtype == jnp.complex128 else "complex64")
    return plan(x)


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse FFT through the same MXU path: ifft(x) = conj(fft(conj(x)))/N."""
    n = x.shape[axis]
    return jnp.conj(fft(jnp.conj(x), axis)) / n
